package graft.serving

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** The one serving→DataFrame bridge: append column(s) produced by a
  * [[ServingClient]] via `mapPartitions`.
  *
  * Scale design: one client per partition (connection pool amortized over
  * the partition), prompts batched (`batchSize`) per request wave, order
  * preserved by construction — the Spark analogue of the reference's
  * per-op ThreadPoolExecutor fan-out
  * (`serving/api_llm_serving_request.py:234-251`). Narrow transform: no
  * shuffle; executors scale the call rate linearly, which is exactly how
  * the 100 TB tier wants LLM labeling to behave (bounded per-executor
  * concurrency × N executors).
  */
object LLMMap {

  /** df + outputKey = serving.generate(prompt(row), systemPrompt). */
  def generated(df: DataFrame, promptKey: String, outputKey: String,
      serving: ServingClient, systemPrompt: String,
      batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(StructField(outputKey, StringType, nullable = true))
    val idx = df.schema.fieldIndex(promptKey)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val prompts = batch.map(r => Option(r.getString(idx)).getOrElse(""))
        val outs = serving.generate(prompts, systemPrompt)
        require(outs.length == prompts.length,
          s"ServingClient.generate returned ${outs.length} outputs for ${prompts.length} prompts")
        batch.lazyZip(outs).map { (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }(Encoders.row(schema))
  }

  /** df + outputKey = scorer.score(text(row)) as double — the bridge for
    * the model-scored filter/eval families. */
  def scored(df: DataFrame, inputKey: String, outputKey: String,
      scorer: Scorer, batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(StructField(outputKey, DoubleType, nullable = true))
    val idx = df.schema.fieldIndex(inputKey)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => Option(r.getString(idx)).getOrElse(""))
        val ss = scorer.score(texts)
        require(ss.length == texts.length,
          s"Scorer returned ${ss.length} scores for ${texts.length} texts")
        batch.lazyZip(ss).map { (r, s) => Row.fromSeq(r.toSeq :+ s) }
      }
    }(Encoders.row(schema))
  }

  /** df + outputKey = serving.embed(text(row)) as array<double>. */
  def embedded(df: DataFrame, inputKey: String, outputKey: String,
      serving: ServingClient, batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(
      StructField(outputKey, ArrayType(DoubleType, containsNull = false), nullable = true))
    val idx = df.schema.fieldIndex(inputKey)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => Option(r.getString(idx)).getOrElse(""))
        val vecs = serving.embed(texts)
        require(vecs.length == texts.length,
          s"ServingClient.embed returned ${vecs.length} vectors for ${texts.length} texts")
        batch.lazyZip(vecs).map { (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }(Encoders.row(schema))
  }
}
