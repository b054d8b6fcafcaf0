package graft.dev

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Where does eval_cider_d's wall go? Times incremental prefixes of the
  * ciderD plan (noop sink per guide §1.4, labelled jobs §1.5) in one
  * JVM: the pairs self-join + count, the generator+groupBy tf pass, the
  * dfreq window, the per-(id,n) re-aggregation, and the full query.
  * Usage: CiderProbe [sfDir] — default /root/testdata/sf0.1.
  */
object CiderProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.LocalSpark.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def pairs = d.select(col("doc_id"), col("text").as("pred"))
      .join(d.select((col("doc_id") - 1).as("doc_id"), col("text").as("gold")),
        Seq("doc_id"))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Double = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      println(f"$label%-22s $s%7.2f s")
      s
    }
    def tf = pairs.select(col("doc_id"),
      graft.functions.hashExpressions.pairNgramTf(
        graft.functions.text.words(col("pred")),
        graft.functions.text.words(col("gold")), 4))
      .groupBy("doc_id", "n", "gram").agg(
        sum(col("tf_p")).as("tf_p"), sum(col("tf_r")).as("tf_r"))
    def withDf = tf.withColumn("dfreq",
      sum(when(col("tf_r") > 0, 1L).otherwise(0L))
        .over(Window.partitionBy("n", "gram")))
    // 2 warm + 2 measured passes of each prefix
    for (p <- 1 to 4) {
      println(s"--- pass $p ---")
      time("pairs_count") { pairs.count() }
      time("tf_noop") { noop(tf) }
      time("window_noop") { noop(withDf) }
      time("full_ciderD") { noop(
        graft.ops.eval.CorpusEvaluators.ciderD(pairs, "pred", "gold", "doc_id")) }
    }
    spark.stop()
  }
}
