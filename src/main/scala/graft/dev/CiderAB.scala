package graft.dev
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved A/B of cider-D plan shapes in ONE JVM (machine drift
  * kills cross-JVM comparisons).
  *
  * Forms (round 8):
  *  - B = shipped r7 form: groupBy(id,n,gram) exchange + dfreq as a
  *        window aggregate in a SECOND (n,gram) exchange.
  *  - C = single-exchange window: explicit repartition(n,gram) up
  *        front — HashPartitioning(n,gram) satisfies the clustered
  *        distribution of BOTH the (id,n,gram) aggregate and the
  *        (n,gram) window, so the whole pipeline runs in one corpus
  *        exchange. Keeps the window's per-(n,gram) group buffering.
  *  - D = single-exchange join-back: same repartition, dfreq as a
  *        groupBy(n,gram) aggregate (no exchange — partitioning already
  *        satisfies it) merge-joined back onto tf (no exchange, sorts
  *        only). No corpus-sized group ever buffers: the sort-merge
  *        join streams the skewed left side against 1-row dfreq groups,
  *        closing the WindowExec head-gram spill hazard flagged by
  *        round-7 advice.
  */
object CiderAB {
  private val maxN = 4

  /** Shared scoring tail: idf-weight, per-(id,n) clipped cosine, length
    * penalty, mean over n — identical across forms. */
  private def scoreTail(tfWithDf: DataFrame, p: DataFrame, nDocs: Double,
      idKey: String, predKey: String, refKey: String): DataFrame = {
    val w = tfWithDf
      .withColumn("idfw",
        lit(math.log(nDocs)) - log(greatest(lit(1.0), col("dfreq").cast("double"))))
      .withColumn("wp", col("tf_p") * col("idfw"))
      .withColumn("wr", col("tf_r") * col("idfw"))
    val perN = w.groupBy(idKey, "n").agg(
      sum(least(col("wp"), col("wr")) * col("wr")).as("dot"),
      sqrt(sum(col("wp") * col("wp"))).as("np"),
      sqrt(sum(col("wr") * col("wr"))).as("nr"))
    val lens = p.select(col(idKey),
      greatest(graft.functions.text.wordCount(col(predKey)) - 1, lit(0)).cast("double").as("lp"),
      greatest(graft.functions.text.wordCount(col(refKey)) - 1, lit(0)).cast("double").as("lr"))
    val delta = col("lp") - col("lr")
    val penalty = exp(-(delta * delta) / lit(72.0))
    val valN = perN.join(lens.hint("merge"), Seq(idKey))
      .withColumn("val",
        when(col("np") === 0 || col("nr") === 0, 0.0)
          .otherwise(col("dot") / (col("np") * col("nr"))) * penalty)
    valN.groupBy(idKey)
      .agg(round(sum(col("val")) / maxN * 10.0, 6).as("cider_d"))
  }

  private def genTf(p: DataFrame, idKey: String, predKey: String,
      refKey: String): DataFrame =
    p.select(col(idKey),
      graft.functions.hashExpressions.pairNgramTf(
        graft.functions.text.words(col(predKey)),
        graft.functions.text.words(col(refKey)), maxN))

  /** C: one corpus exchange, dfreq still a window aggregate. */
  def formC(p: DataFrame, idKey: String, predKey: String,
      refKey: String): DataFrame = {
    val nDocs = p.count().toDouble
    val tf = genTf(p, idKey, predKey, refKey)
      .repartition(col("n"), col("gram"))
      .groupBy(idKey, "n", "gram").agg(
        sum(col("tf_p")).as("tf_p"), sum(col("tf_r")).as("tf_r"))
    val withDf = tf.withColumn("dfreq",
      sum(when(col("tf_r") > 0, 1L).otherwise(0L))
        .over(Window.partitionBy("n", "gram")))
    scoreTail(withDf, p, nDocs, idKey, predKey, refKey)
  }

  /** D: one corpus exchange, dfreq as an in-partition aggregate
    * merge-joined back (no window buffering). */
  def formD(p: DataFrame, idKey: String, predKey: String,
      refKey: String): DataFrame = {
    val nDocs = p.count().toDouble
    val tf = genTf(p, idKey, predKey, refKey)
      .repartition(col("n"), col("gram"))
      .groupBy(idKey, "n", "gram").agg(
        sum(col("tf_p")).as("tf_p"), sum(col("tf_r")).as("tf_r"))
    val dfq = tf.filter(col("tf_r") > 0)
      .groupBy("n", "gram").agg(count(lit(1)).as("dfreq"))
    val withDf = tf.join(dfq.hint("merge"), Seq("n", "gram"), "left")
      .withColumn("dfreq", coalesce(col("dfreq"), lit(0L)))
    scoreTail(withDf, p, nDocs, idKey, predKey, refKey)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSpark.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x100")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def pairs = d.select(col("doc_id"), col("text").as("pred"))
      .join(d.select((col("doc_id") - 1).as("doc_id"), col("text").as("gold")), Seq("doc_id"))
    def formB(p: DataFrame) =
      graft.ops.eval.CorpusEvaluators.ciderD(p, "pred", "gold", "doc_id")
    val forms: Seq[(String, DataFrame => DataFrame)] = Seq(
      "B" -> (p => formB(p)),
      "C" -> (p => formC(p, "doc_id", "pred", "gold")),
      "D" -> (p => formD(p, "doc_id", "pred", "gold")))

    // `--explain`: print each physical plan (for exchange counting).
    if (args.contains("--explain")) {
      forms.foreach { case (n, f) =>
        println(s"===== $n ====="); f(pairs).explain("formatted")
      }
      spark.stop(); return
    }
    // `--check`: row-compare all forms against B (run at a small SF).
    if (args.contains("--check")) {
      val b = formB(pairs)
      forms.drop(1).foreach { case (n, f) =>
        val x = f(pairs)
        val onlyB = b.exceptAll(x).count()
        val onlyX = x.exceptAll(b).count()
        println(s"check $n rows=${x.count()} onlyB=$onlyB only$n=$onlyX " +
          (if (onlyB == 0 && onlyX == 0) "IDENTICAL" else "DIVERGED"))
      }
      spark.stop(); return
    }
    def quiesce(): Unit = { spark.catalog.clearCache(); System.gc() }
    def one(f: => DataFrame): Double = {
      quiesce()
      val t0 = System.nanoTime(); f.count(); (System.nanoTime - t0) / 1e9
    }
    // warm every plan once, then alternate measured passes
    forms.foreach { case (n, f) => println(f"warm$n=${one(f(pairs))}%.1f") }
    val best = collection.mutable.Map.empty[String, Double]
    for (i <- 1 to 3) {
      val line = forms.map { case (n, f) =>
        val s = one(f(pairs))
        best(n) = math.min(best.getOrElse(n, Double.MaxValue), s)
        f"$n=$s%.1f"
      }.mkString(" ")
      println(s"pass$i: $line")
    }
    println(best.toSeq.sortBy(_._1).map { case (n, s) => f"min$n=$s%.2f" }.mkString(" "))
    spark.stop()
  }
}
