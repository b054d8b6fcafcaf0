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

  private def chain(df: DataFrame): DataFrame = {
    val p = graft.core.Pipeline.of(
      LowercaseRefiner("text"),
      RemoveExtraSpacesRefiner("text"),
      WordNumberFilter("text", 10, Int.MaxValue),
      HashDeduplicateFilter(Seq("text"), "doc_id"))
    p(df).select("doc_id", "n_chars")
  }

  private def minOf3(df: => DataFrame): Double = {
    chain(df).count() // warmup (codegen, scan setup)
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      chain(df).count()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  /** The ×20 amortized chain figure as a reusable probe: (rows,
    * rows/sec). This is the day-calibration number the cross-round
    * record trends against (r7 208k / r11 236.7k / r12 206.8k
    * rows/s/node pins) — [[Bench]] runs it before its measurement loop
    * so every recorded artifact carries its own machine-day
    * calibration, the way it already carries `ext_cpu_cores`. The
    * replica cache is dropped (blocking) before returning: the probe
    * must leave no cached blocks behind to skew a caller's session. */
  private[graft] def x20RowsPerSec(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): (Long, Long) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val x20 = (0 until 20).map(r =>
      docs.withColumn("doc_id", col("doc_id") + lit(r.toLong * 10000000L)))
      .reduce(_ unionAll _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nX20 = x20.count() // materialize the cache outside any timed pass
      val tX20 = minOf3(x20)
      (nX20, (nX20 / tX20).toLong)
    } finally x20.unpersist(true)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = LocalSpark.session()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nBase = docs.count()
    val tScan = minOf3(docs)

    val (nX20, x20Rps) = x20RowsPerSec(spark, sfDir)

    println(s"""{"metric":"chain_throughput","sf":"$sfDir",""" +
      s""""scan_rows":$nBase,"scan_sec":${Bench.jnum(tScan, 3)},""" +
      s""""scan_rows_per_sec":${(nBase / tScan).toLong},""" +
      s""""x20_rows":$nX20,""" +
      s""""x20_rows_per_sec":$x20Rps}""")
    spark.stop()
  }
}
