package graft.ops.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Op
import graft.serving.{LLMMap, ServingClient}

/** Named operator classes for chains the queries previously built
  * inline — by-name pipeline parity with the reference registry. */

/** Multi-hop QA from paired chunks
  * (`core_text/generate/text2multihopqa_generator.py:23-80`): the two
  * hops join into one prompt, one LLM map answers. */
final case class Text2MultiHopQAGenerator(hop1Key: String, hop2Key: String,
    serving: ServingClient, outputKey: String = "qa") extends Op {
  val name = "text2multihopqa_generator"
  val inputKeys = Seq(hop1Key, hop2Key)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame = {
    val p = df.withColumn("__p",
      concat(col(hop1Key), lit(" <HOP> "), col(hop2Key)))
    LLMMap.generated(p, "__p", outputKey, serving, "MULTIHOP").drop("__p")
  }
}

/** AgenticRAG task-synthesis trio
  * (`agentic_rag/generate/agenticrag_atomic_task_generator.py:36`,
  * `agenticrag_depth_qa_generator.py`, `agenticrag_width_qa_generator.py`):
  * content → atomic task → depth-extended QA → width-extended QA. */
final case class AgenticRAGAtomicTaskGenerator(inputKey: String,
    serving: ServingClient, outputKey: String = "atomic_task") extends Op {
  val name = "agenticrag_atomic_task_generator"
  val inputKeys = Seq(inputKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.generated(df, inputKey, outputKey, serving, "ATOMIC")
}

final case class AgenticRAGDepthQAGenerator(taskKey: String,
    serving: ServingClient, outputKey: String = "depth_qa") extends Op {
  val name = "agenticrag_depth_qa_generator"
  val inputKeys = Seq(taskKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.generated(df, taskKey, outputKey, serving, "DEPTH")
}

final case class AgenticRAGWidthQAGenerator(qaKey: String,
    serving: ServingClient, outputKey: String = "width_qa") extends Op {
  val name = "agenticrag_width_qa_generator"
  val inputKeys = Seq(qaKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.generated(df, qaKey, outputKey, serving, "WIDTH")
}

/** SFT-from-seed with JSON parse-back
  * (`text_sft/generate/sft_generator_from_seed.py:32-71`): the LLM emits
  * an {instruction, output} JSON per seed; `from_json` types it back. */
final case class SFTGeneratorSeed(seedKey: String, serving: ServingClient)
    extends Op {
  val name = "sft_generator_seed"
  val inputKeys = Seq(seedKey)
  val outputKeys = Seq("instruction", "output")
  def apply(df: DataFrame): DataFrame = {
    val raw = LLMMap.generated(df, seedKey, "__raw", serving, "SFTSEED")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("instruction",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("output",
        org.apache.spark.sql.types.StringType)))
    raw.withColumn("__p", from_json(col("__raw"), schema))
      .withColumn("instruction", col("__p.instruction"))
      .withColumn("output", col("__p.output"))
      .drop("__raw", "__p")
  }
}

/** Bench answer generation (`core_text/generate/bench_answer_generator.py`):
  * answer each bench question through the serving bridge. */
final case class BenchAnswerGenerator(questionKey: String,
    serving: ServingClient, outputKey: String = "answer") extends Op {
  val name = "bench_answer_generator"
  val inputKeys = Seq(questionKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.generated(df, questionKey, outputKey, serving, "ANSWER")
}

/** Topic × intent seeded multi-turn dialog synthesis
  * (`conversations/generate/consistent_chat_generator.py:18-58`): the
  * seed grid explodes row-wise (narrow), one LLM synthesis per cell. */
object ConsistentChatGenerator {
  def grid(spark: SparkSession, topics: Int, intents: Int,
      serving: ServingClient, outputKey: String = "dialog"): DataFrame = {
    val t = spark.range(topics.toLong).withColumnRenamed("id", "topic_id")
    val i = spark.range(intents.toLong).withColumnRenamed("id", "intent_id")
    val g = t.crossJoin(i).withColumn("__p",
      concat(lit("topic-"), col("topic_id"), lit(":intent-"), col("intent_id")))
    LLMMap.generated(g, "__p", outputKey, serving, "CHAT").drop("__p")
  }
}
