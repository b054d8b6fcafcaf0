package graft.dev

/** Prints the formatted physical plan of the minhash dedup's
  * pre-checkpoint duplicate-id subplan — apply()'s eager localCheckpoint
  * erases the interesting exchanges from the final query's plan, so
  * graft.Explain can't show the band-verify shape. Usage:
  *   MinhashExplain [sfDir]
  */
object MinhashExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.LocalSpark.session()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val op = graft.ops.dedup.MinHashDeduplicateFilter(
      "text", "doc_id", ngram = 3, threshold = 0.9)
    op.duplicateIds(op.shingled(docs)).explain("formatted")
    spark.stop()
  }
}
