package graft.ops.gen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Op
import graft.functions.text._

/** Document chunking — the KBC chunk generator's four modes
  * (`knowledge_cleaning/generate/kbc_chunk_generator.py:21-107`:
  * token/sentence/semantic/recursive, chunk_size 512, min 100). Explodes
  * one row per chunk (the reference's row-multiplying UDTF shape). */
final case class ChunkSplitter(inputKey: String = "text",
    idKey: String = "doc_id", mode: String = "token", chunkSize: Int = 512,
    minChunkTokens: Int = 0) extends Op {
  val name = "chunk_splitter"
  val inputKeys = Seq(inputKey, idKey)
  val outputKeys = Seq("pos", "raw_chunk")

  private def chunksExpr: Column = mode match {
    case "token" =>
      val ws = words(col(inputKey))
      val n = ceil(size(ws).cast("double") / chunkSize.toDouble).cast("int")
      transform(sequence(lit(0), greatest(n - 1, lit(0))),
        i => concat_ws(" ", slice(ws, i * chunkSize + 1, lit(chunkSize))))
    case "sentence" =>
      // split on sentence punctuation, drop empty segments
      filter(transform(split(col(inputKey), "[.!?]+"), s => trim(s)), s => s =!= "")
    case "recursive" =>
      // paragraph → line → token fallback: split on blank lines first,
      // then oversized paragraphs by token windows
      val paras = filter(transform(split(col(inputKey), "\n\n+"), s => trim(s)),
        s => s =!= "")
      flatten(transform(paras, p => {
        val ws = filter(split(p, "\\s+"), w => w =!= "")
        val n = ceil(size(ws).cast("double") / chunkSize.toDouble).cast("int")
        transform(sequence(lit(0), greatest(n - 1, lit(0))),
          i => concat_ws(" ", slice(ws, i * chunkSize + 1, lit(chunkSize))))
      }))
    case other => throw new IllegalArgumentException(s"chunk mode $other")
  }

  def apply(df: DataFrame): DataFrame = {
    val exploded = df.withColumn("__chunks", chunksExpr)
      .select(col(idKey), posexplode(col("__chunks")).as(Seq("pos", "raw_chunk")))
    if (minChunkTokens > 0)
      exploded.filter(size(words(col("raw_chunk"))) >= minChunkTokens)
    else exploded
  }
}
