package graft

/** Plan inspection utility: prints the formatted physical plan for the
  * named queries (default: a representative set). Used to keep the plans
  * honest — filter/projection pushdown reaching the parquet scan,
  * broadcast joins on dimension tables, whole-stage codegen spans.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing", "q3_revenue_by_customer", "q5_region_revenue",
        "filter_word_number", "dedup_hash", "sim_topk_brute")
    val spark = LocalSpark.session()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
