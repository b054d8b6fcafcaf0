package graft.ops.conversations

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{EvalOp, Op}
import graft.serving.{LLMMap, ServingClient}

/** Conversation operators — SURVEY §2.8 func-call chain + §2.5
  * conversation evaluators. Conversations are
  * `array<struct<role:string, content:string>>` columns.
  */

/** Build a two-turn conversation column from (instruction, output). */
final case class ConversationBuilder(instructionKey: String, outputKey: String,
    convKey: String = "conversations") extends Op {
  val name = "conversation_builder"
  val inputKeys = Seq(instructionKey, outputKey)
  val outputKeys = Seq(convKey)
  def apply(df: DataFrame): DataFrame =
    df.withColumn(convKey, array(
      struct(lit("user").as("role"), col(instructionKey).as("content")),
      struct(lit("assistant").as("role"), col(outputKey).as("content"))))
}

/** Turn counts + per-role stats over a conversations column — the shape
  * of `func_call_conversation_sample_evaluator.py:89`'s input. */
final case class ConversationStatsEvaluator(convKey: String = "conversations")
    extends EvalOp {
  val name = "conversation_stats_evaluator"
  val inputKeys = Seq(convKey)
  def scores: Seq[(String, Column)] = Seq(
    "n_turns" -> size(col(convKey)).cast("long"),
    "n_user_turns" -> size(filter(col(convKey), t => t("role") === "user")).cast("long"),
    "total_content_chars" -> aggregate(col(convKey), lit(0L),
      (acc, t) => acc + length(t("content"))))
}

/** The staged func-call synthesis chain
  * (`conversations/generate/func_call_generators.py:27-418`): scenario →
  * atomic task → function signature, three chained LLM maps over struct
  * columns. */
final case class FuncCallChainGenerator(inputKey: String,
    serving: ServingClient) extends Op {
  val name = "func_call_chain_generator"
  val inputKeys = Seq(inputKey)
  val outputKeys = Seq("scenario", "atom_task", "function")
  def apply(df: DataFrame): DataFrame = {
    val s1 = LLMMap.generated(df, inputKey, "scenario", serving, "SCENARIO")
    val s2 = LLMMap.generated(s1, "scenario", "atom_task", serving, "ATOM")
    LLMMap.generated(s2, "atom_task", "function", serving, "FUNC")
  }
}

/** Fold non-system columns into a JSON `data` payload — the MyScale/
  * ClickHouse storage shape (`utils/storage.py:880-921`): system columns
  * stay typed, everything else rides in one JSON string column. */
final case class SystemColumnMerger(systemCols: Seq[String],
    dataKey: String = "data") extends Op {
  val name = "system_column_merger"
  val inputKeys = systemCols
  val outputKeys = Seq(dataKey)
  def apply(df: DataFrame): DataFrame = {
    val payload = df.columns.filterNot(systemCols.contains)
    df.withColumn(dataKey, to_json(struct(payload.map(col).toIndexedSeq: _*)))
      .select((systemCols :+ dataKey).map(col).toIndexedSeq: _*)
  }
}
