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
  * shuffle at the dedup window) two ways:
  *   1. documents sf0.1 straight off the parquet scan, min of 3 passes
  *      (floor-bound by ~0.5 s of job scheduling at 5k rows);
  *   2. a ×20 in-memory replica (doc_id remapped per replica so dedup
  *      still does per-row work), run to CONVERGENCE since r15 (see
  *      [[convergedMin]] — a fixed min-of-3 in a cold JVM measures C2
  *      compilation, not the machine) — fixed overhead amortized, this
  *      is the rows/s/node figure that extrapolates to a cluster.
  *      Artifacts mark the statistic as `"cal_stat":"converged"`; pins
  *      recorded before r15 were min-of-3.
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

  /** Min pass time, run to CONVERGENCE: keep passing while each pass
    * still improves the best by >3%, stop after two consecutive
    * non-improving passes (cap 12). Why (r15): the calibration must
    * measure the MACHINE, but a fixed min-of-3 in a cold JVM measures
    * C2 compilation instead — four ×10 canary attempts read pre-cal
    * 138-158k rows/s against post-cal 207-243k and standalone 340k+ on
    * the same quiet machine, a JIT ramp the contended r12-r14 days had
    * masked (their ~155k machine ceiling capped every pass, so
    * brackets looked tight). On a machine-limited day this converges
    * in exactly 3 passes — the old cost; on a fast machine it runs the
    * few extra passes C2 needs and reports the machine, not the
    * compiler. */
  private def convergedMin(df: => DataFrame, maxPasses: Int = 12): Double = {
    chain(df).count() // warmup (codegen, scan setup)
    var best = Double.MaxValue
    var flat = 0
    var i = 0
    while (i < maxPasses && flat < 2) {
      val t0 = System.nanoTime()
      chain(df).count()
      val t = (System.nanoTime() - t0) / 1e9
      if (t < best * 0.97) { best = t; flat = 0 }
      else { if (t < best) best = t; flat += 1 }
      i += 1
    }
    best
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
      val tX20 = convergedMin(x20)
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
