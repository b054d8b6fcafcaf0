package graft.ops.eval

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.text._

/** Corpus-dependent evaluators — the two-pass family. */
object CorpusEvaluators {

  /** CIDEr-style TF-IDF unigram similarity
    * (`cider_sample_evaluator.py:17-86`, corpus-IDF at `bleu/cider` impl):
    * pass 1 aggregates document frequencies over the REFERENCE corpus;
    * pass 2 scores each (pred, ref) pair as the cosine of their
    * idf-weighted unigram tf vectors. Two Spark jobs, one broadcast of the
    * (vocab-sized) idf map — the distributed shape of every corpus-IDF
    * metric. The idf join is an explode → broadcast-join → re-agg; at
    * 100 TB the idf table is bounded by vocab, not corpus, so it stays
    * broadcastable.
    */
  def ciderUnigram(pairs: DataFrame, predKey: String, refKey: String,
      idKey: String, outputKey: String = "cider"): DataFrame = {
    val n = pairs.count().toDouble
    // ONE tagged explode+aggregate yields both tf vectors per (id, tok) —
    // replaces two separate exploded aggregates + a full-outer join
    val tagged = pairs.select(col(idKey), lit("p").as("side"),
      explode(words(col(predKey))).as("tok"))
      .unionAll(pairs.select(col(idKey), lit("r").as("side"),
        explode(words(col(refKey))).as("tok")))
    val tf = tagged.groupBy(idKey, "tok").agg(
      sum(when(col("side") === "p", 1).otherwise(0)).as("tf_p"),
      sum(when(col("side") === "r", 1).otherwise(0)).as("tf_r"))
    // document frequency over refs, derived from the same grouped pass
    val df = tf.filter(col("tf_r") > 0)
      .groupBy("tok").agg(count(lit(1)).as("dfreq"))
      .withColumn("idf", log(lit(n) / col("dfreq")))
    // idf weights; cosine over the sparse dims
    val joined = tf
      .join(broadcast(df), Seq("tok"), "left")
      .withColumn("wp", col("tf_p") * coalesce(col("idf"), lit(0.0)))
      .withColumn("wr", col("tf_r") * coalesce(col("idf"), lit(0.0)))
    val scored = joined.groupBy(idKey).agg(
      sum(col("wp") * col("wr")).as("dot"),
      sqrt(sum(col("wp") * col("wp"))).as("np"),
      sqrt(sum(col("wr") * col("wr"))).as("nr"))
    scored.withColumn(outputKey,
      when(col("np") === 0 || col("nr") === 0, 0.0)
        .otherwise(round(col("dot") / (col("np") * col("nr")), 6)))
      .select(col(idKey), col(outputKey))
  }

  /** MMD² with RBF kernel between two embedding sets
    * (`text_sft/eval/mmd_dataset_evaluator.py:14`) — driver-side over
    * collected vectors (deterministic summation order; sample-capped). */
  def mmdRbf(df: DataFrame, embKey: String, splitCol: Column,
      gamma: Double = 0.01, cap: Int = 500): Double = {
    val rows = df.select(splitCol.cast("boolean"), col(embKey).cast("array<double>"))
      .limit(cap).collect()
      .map(r => (r.getBoolean(0), r.getSeq[Double](1).toArray))
    val xs = rows.filter(_._1).map(_._2)
    val ys = rows.filterNot(_._1).map(_._2)
    def k(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.exp(-gamma * s)
    }
    def meanK(as: Array[Array[Double]], bs: Array[Array[Double]]): Double = {
      var s = 0.0
      for (a <- as; b <- bs) s += k(a, b)
      s / (as.length.toDouble * bs.length.toDouble)
    }
    meanK(xs, xs) + meanK(ys, ys) - 2 * meanK(xs, ys)
  }
}
