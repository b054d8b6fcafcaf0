package graft.ops.dedup

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Op
import graft.functions.text._

/** MLlib-native MinHash dedup — the (a)-path alternative to the custom
  * banding in [[MinHashDeduplicateFilter]]: `HashingTF` over word
  * n-grams → `MinHashLSH.approxSimilarityJoin` at the Jaccard-distance
  * threshold → drop the later row of each similar pair.
  *
  * Tradeoffs vs the custom op: MLlib's join hashes into OR-amplified
  * buckets only (no banding), and its Jaccard is computed on the
  * HashingTF vector (feature-collision-lossy), so decisions are
  * approximate rather than exactly verifiable — good for throughput
  * comparisons, not for oracle-gated correctness.
  */
final case class MinHashLSHDeduplicateFilter(inputKey: String = "text",
    orderKey: String = "doc_id", ngram: Int = 3, numHashTables: Int = 4,
    threshold: Double = 0.9, numFeatures: Int = 1 << 18) extends Op {
  val name = "minhash_lsh_mllib_deduplicate_filter"
  val inputKeys = Seq(inputKey, orderKey)
  val outputKeys = Nil

  def apply(df: DataFrame): DataFrame = {
    // prune to (orderKey, grams) BEFORE featurizing: approxSimilarityJoin
    // replicates both datasets' full rows into every candidate pair, so
    // carrying the text column multiplies the shuffle by the payload size.
    // Imperative gram kernel — the expression-tree wordNgrams (sequence →
    // slice → concat_ws per position) is ~4× slower per corpus pass.
    val nn = ngram
    val gramsUdf = udf { s: String =>
      val ws = graft.functions.kernels.splitWords(s)
      if (ws.length < nn) Array.empty[String]
      else Array.tabulate(ws.length - nn + 1)(i => ws.slice(i, i + nn).mkString(" "))
    }
    val withGrams = df
      .select(col(orderKey), gramsUdf(col(inputKey)).as("__grams"))
      .filter(size(col("__grams")) > 0)
    val tf = new HashingTF().setInputCol("__grams").setOutputCol("__features")
      .setNumFeatures(numFeatures).setBinary(true)
    // approxSimilarityJoin consumes `featured` three times (fit + both join
    // sides); uncached, every pass re-runs gram splitting + feature
    // hashing over the whole corpus — the dominant cost. Persist the
    // featurized table, materialize the (small) duplicate-id set eagerly,
    // then release the cache.
    val featured = tf.transform(withGrams)
      .select(col(orderKey), col("__features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val lsh = new MinHashLSH().setInputCol("__features").setOutputCol("__hashes")
        .setNumHashTables(numHashTables).setSeed(42L)
      val model = lsh.fit(featured)
      val pairs = model.approxSimilarityJoin(featured, featured,
        1.0 - threshold, "jaccard_dist")
      val dups = pairs
        .select(col(s"datasetA.$orderKey").as("i"), col(s"datasetB.$orderKey").as("j"))
        .where(col("i") < col("j"))
        .select(col("j").as(orderKey)).distinct()
        .localCheckpoint() // eager: one id column, bounded by corpus rows
      df.join(dups, Seq(orderKey), "left_anti")
    } finally featured.unpersist(false)
  }
}
