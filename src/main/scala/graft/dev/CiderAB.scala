package graft.dev
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interleaved A/B of cider-D forms in ONE JVM (machine drift kills
  * cross-JVM comparisons). A = the r7 mid-round form (native generator,
  * separate dfq aggregate + singleton-tail filter + merge join back);
  * B = current CorpusEvaluators.ciderD (dfreq as a window aggregate). */
object CiderAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSpark.session("32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x100")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def pairs = d.select(col("doc_id"), col("text").as("pred"))
      .join(d.select((col("doc_id") - 1).as("doc_id"), col("text").as("gold")), Seq("doc_id"))
    val maxN = 4
    def oldCiderD(p: DataFrame): DataFrame = {
      val nDocs = p.count().toDouble
      val tf = p.select(col("doc_id"),
        graft.functions.hashExpressions.pairNgramTf(
          graft.functions.text.words(col("pred")),
          graft.functions.text.words(col("gold")), maxN))
        .groupBy("doc_id", "n", "gram").agg(
          sum(col("tf_p")).as("tf_p"), sum(col("tf_r")).as("tf_r"))
      val dfq = tf.filter(col("tf_r") > 0)
        .groupBy("n", "gram").agg(count(lit(1)).as("dfreq"))
        .filter(col("dfreq") >= 2)
      val w = tf.join(dfq.hint("merge"), Seq("n", "gram"), "left")
        .withColumn("idfw",
          lit(math.log(nDocs)) - log(greatest(lit(1.0), coalesce(col("dfreq"), lit(0.0)))))
        .withColumn("wp", col("tf_p") * col("idfw"))
        .withColumn("wr", col("tf_r") * col("idfw"))
      val perN = w.groupBy("doc_id", "n").agg(
        sum(least(col("wp"), col("wr")) * col("wr")).as("dot"),
        sqrt(sum(col("wp") * col("wp"))).as("np"),
        sqrt(sum(col("wr") * col("wr"))).as("nr"))
      val lens = p.select(col("doc_id"),
        greatest(graft.functions.text.wordCount(col("pred")) - 1, lit(0)).cast("double").as("lp"),
        greatest(graft.functions.text.wordCount(col("gold")) - 1, lit(0)).cast("double").as("lr"))
      val delta = col("lp") - col("lr")
      val penalty = exp(-(delta * delta) / lit(72.0))
      val valN = perN.join(lens.hint("merge"), Seq("doc_id"))
        .withColumn("val",
          when(col("np") === 0 || col("nr") === 0, 0.0)
            .otherwise(col("dot") / (col("np") * col("nr"))) * penalty)
      valN.groupBy("doc_id")
        .agg(round(sum(col("val")) / maxN * 10.0, 6).as("cider_d"))
    }
    // `--explain`: print both physical plans (for exchange counting).
    if (args.contains("--explain")) {
      println("===== A (dfq join-back) ====="); oldCiderD(pairs).explain("formatted")
      println("===== B (window dfreq) =====")
      graft.ops.eval.CorpusEvaluators.ciderD(pairs, "pred", "gold", "doc_id").explain("formatted")
      spark.stop(); return
    }
    // `--check`: row-compare the two forms instead of timing (run at a
    // small SF) — the window dfreq must be value-identical to the
    // join-back dfreq.
    if (args.contains("--check")) {
      val a = oldCiderD(pairs)
      val b = graft.ops.eval.CorpusEvaluators.ciderD(pairs, "pred", "gold", "doc_id")
      val onlyA = a.exceptAll(b).count()
      val onlyB = b.exceptAll(a).count()
      println(s"check rows=${a.count()} onlyA=$onlyA onlyB=$onlyB " +
        (if (onlyA == 0 && onlyB == 0) "IDENTICAL" else "DIVERGED"))
      spark.stop(); return
    }
    def quiesce(): Unit = { spark.catalog.clearCache(); System.gc() }
    def one(f: => DataFrame): Double = {
      quiesce()
      val t0 = System.nanoTime(); f.count(); (System.nanoTime - t0) / 1e9
    }
    // warm both plans once, then alternate measured passes
    println(f"warmA=${one(oldCiderD(pairs))}%.1f warmB=${one(graft.ops.eval.CorpusEvaluators.ciderD(pairs, "pred", "gold", "doc_id"))}%.1f")
    val as = collection.mutable.ArrayBuffer.empty[Double]
    val bs = collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to 3) {
      as += one(oldCiderD(pairs))
      bs += one(graft.ops.eval.CorpusEvaluators.ciderD(pairs, "pred", "gold", "doc_id"))
      println(f"A=${as.last}%.1f B=${bs.last}%.1f")
    }
    println(f"minA=${as.min}%.2f minB=${bs.min}%.2f ratio=${as.min / bs.min}%.3f")
    spark.stop()
  }
}
