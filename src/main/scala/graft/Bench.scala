package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // The driver captures only the last ~2000 chars of output, so the
    // metric line must stay well under that: report every query's time
    // in a separate (truncation-tolerant) line, and keep the one parsed
    // JSON line to the headline subset.
    val qsAll = results.map { case (k, v) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"all_queries","queries":$qsAll}""")
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
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","nqueries":${results.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
