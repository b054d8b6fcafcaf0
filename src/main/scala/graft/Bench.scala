package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** One query's measurement: seconds for the BEST pass, or an error.
    * Each query runs twice and the minimum is reported: the first pass
    * absorbs JIT/codegen/scan-infra warmup for that plan shape, and the
    * min discards one-off GC/code-cache spikes that a 400-execution
    * session otherwise smears randomly across queries (observed 2-5x
    * inflation on individual queries vs a standalone run). A query that
    * throws (either pass) is recorded as an error, never silently timed. */
  final case class Result(seconds: Double, error: Option[String])

  private[graft] def runQueries(
      spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
      passes: Int = 2): Seq[(String, Result)] =
    queries.toSeq.map { case (name, fn) =>
      val r =
        try {
          var best = Double.MaxValue
          var p = 0
          while (p < passes) {
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val s = (System.nanoTime() - t0) / 1e9
            if (s < best) best = s
            p += 1
          }
          Result(best, None)
        } catch {
          case e: Throwable =>
            Result(-1.0, Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"))
        }
      name -> r
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, scan infra) so the first measured query
    // doesn't absorb one-time JVM/session init
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val measured = runQueries(spark, sfDir, SparkEntry.queries)
    val results = measured.collect { case (n, Result(s, None)) => n -> s }.toMap
    val errors = measured.collect { case (n, Result(_, Some(e))) => n -> e }

    val total = if (results.nonEmpty) results.values.sum else 0.0
    // The driver captures only the last ~2000 chars of output, so the
    // metric line must stay well under that: report every query's time
    // in a separate (truncation-tolerant) line, and keep the one parsed
    // JSON line to the headline subset.
    val qsAll = results.map { case (k, v) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"all_queries","queries":$qsAll}""")
    errors.foreach { case (n, e) =>
      println(s"""{"metric":"query_error","query":"$n","error":"${e.replace("\"", "'").replace("\\", "/").replaceAll("[\\x00-\\x1F]", " ")}"}""")
    }
    val headline = Vector(
      "q1_pricing", "q3_revenue_by_customer", "q5_region_revenue",
      "join_bucketed", "sort_topk_orders", "window_running_sum",
      "stream_window_agg", "dedup_hash", "dedup_ccnet", "dedup_minhash",
      "dedup_minhash_mllib", "dedup_simhash", "dedup_sem_lsh",
      "dedup_kcenter", "sim_topk_brute", "sim_lsh_topk", "sim_ivf_topk",
      "sim_join", "eval_bleu", "eval_cider_d", "kbc_chunks",
      "t2s_execution", "t2s_exec_classify", "text_quality_score",
      "text_fingerprint")
    val qs = headline.flatMap(k => results.get(k).map(v =>
      s"\"" + k + "\":" + f"$v%.3f")).mkString("{", ",", "}")
    // "passes":2 + "stat":"min" marks the best-of-two-passes methodology
    // (rounds 1-3: single cold pass; round 4: last-of-two) so cross-round
    // comparisons can account for it
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","passes":2,"stat":"min","nqueries":${measured.size},"errors":${errors.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    // failure-honest: any query that threw makes the bench itself red
    if (errors.nonEmpty) sys.exit(1)
  }
}
