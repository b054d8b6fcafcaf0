package graft.dev
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interleaved A/B of cider-D forms in ONE JVM (machine drift kills
  * cross-JVM comparisons). A = committed old udf+explode+groupBy+full-dfq
  * replica; B = current CorpusEvaluators.ciderD. */
object CiderAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSpark.session("32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x100")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def pairs = d.select(col("doc_id"), col("text").as("pred"))
      .join(d.select((col("doc_id") - 1).as("doc_id"), col("text").as("gold")), Seq("doc_id"))
    val maxN = 4
    val gramsUdf = udf { ws: Seq[String] =>
      if (ws == null) Array.empty[(Int, Long)]
      else {
        val out = Array.newBuilder[(Int, Long)]
        var k = 1
        while (k <= maxN) {
          var i = 0
          while (i <= ws.length - k) {
            val sb = new StringBuilder
            var j = 0
            while (j < k) { if (j > 0) sb.append(' '); sb.append(ws(i + j)); j += 1 }
            out += ((k, graft.functions.kernels.md5Prefix60Memo(sb.toString))); i += 1
          }
          k += 1
        }
        out.result()
      }
    }
    def gramStructs(c: Column): Column =
      transform(gramsUdf(graft.functions.text.words(c)),
        g => struct(g("_1").as("n"), g("_2").as("gram")))
    def oldCiderD(p: DataFrame): DataFrame = {
      val nDocs = p.count().toDouble
      val tagged = p.select(col("doc_id"), lit("p").as("side"),
        explode(gramStructs(col("pred"))).as("ng"))
        .unionAll(p.select(col("doc_id"), lit("r").as("side"),
          explode(gramStructs(col("gold"))).as("ng")))
        .select(col("doc_id"), col("side"), col("ng.n").as("n"), col("ng.gram").as("gram"))
      val tf = tagged.groupBy("doc_id", "n", "gram").agg(
        sum(when(col("side") === "p", 1).otherwise(0)).as("tf_p"),
        sum(when(col("side") === "r", 1).otherwise(0)).as("tf_r"))
      val dfq = tf.filter(col("tf_r") > 0)
        .groupBy("n", "gram").agg(count(lit(1)).as("dfreq"))
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
