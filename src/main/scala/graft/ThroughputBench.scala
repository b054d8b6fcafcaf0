package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.dedup.HashDeduplicateFilter
import graft.ops.filter.WordNumberFilter
import graft.ops.refine.{LowercaseRefiner, RemoveExtraSpacesRefiner}

/** Dev utility: the BASELINE.md chain-throughput measurement, kept as a
  * runnable main so every round can refresh the recorded numbers on
  * HEAD with the same methodology.
  *
  * Measures `pipeline_text_chain` (lowercase → space-normalize →
  * word-count filter → keep-first hash dedup — one lazy plan, single
  * shuffle at the dedup window) two ways, min of 3 passes each:
  *   1. documents sf0.1 straight off the parquet scan (floor-bound by
  *      ~0.5 s of job scheduling at 5k rows);
  *   2. a ×20 in-memory replica (doc_id remapped per replica so dedup
  *      still does per-row work) — fixed overhead amortized, this is
  *      the rows/s/node figure that extrapolates to a cluster.
  *
  * Usage: runMain graft.ThroughputBench [sfDir]
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = LocalSpark.session()

    def chain(df: DataFrame): DataFrame = {
      val p = graft.core.Pipeline.of(
        LowercaseRefiner("text"),
        RemoveExtraSpacesRefiner("text"),
        WordNumberFilter("text", 10, Int.MaxValue),
        HashDeduplicateFilter(Seq("text"), "doc_id"))
      p(df).select("doc_id", "n_chars")
    }

    def minOf3(df: => DataFrame): Double = {
      chain(df).count() // warmup (codegen, scan setup)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        chain(df).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nBase = docs.count()
    val tScan = minOf3(docs)

    val x20 = (0 until 20).map(r =>
      docs.withColumn("doc_id", col("doc_id") + lit(r.toLong * 10000000L)))
      .reduce(_ unionAll _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nX20 = x20.count() // materialize the cache outside any timed pass
    val tX20 = minOf3(x20)

    println(s"""{"metric":"chain_throughput","sf":"$sfDir",""" +
      s""""scan_rows":$nBase,"scan_sec":${f"$tScan%.3f"},""" +
      s""""scan_rows_per_sec":${(nBase / tScan).toLong},""" +
      s""""x20_rows":$nX20,"x20_sec":${f"$tX20%.3f"},""" +
      s""""x20_rows_per_sec":${(nX20 / tX20).toLong}}""")
    spark.stop()
  }
}
