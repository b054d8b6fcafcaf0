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
  *
  * Scale hardening: `approxSimilarityJoin` has no defense against
  * exact-duplicate clusters — m copies of one doc share every MinHash
  * bucket, so the candidate explode emits O(m²) pairs per cluster (the
  * same 100 TB skew killer the custom path collapses away). The same
  * identical-set collapse is prepended HERE, on the distinct-gram set:
  * docs with equal gram SETS have equal binary HashingTF vectors, hence
  * Jaccard distance 0 ≤ any threshold, so under keep-first semantics
  * dropping everything but the min-orderKey representative per set is
  * exactly what the join would decide — only O(m) window work instead
  * of O(m²) pairs, and only representatives enter the LSH join.
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Identical-set collapse (see scaladoc): binary HashingTF ignores
      // gram multiplicity, so the canonical key is the sorted DISTINCT
      // gram set — the exact equivalence class of "equal feature vector"
      // (modulo feature collisions, which only ever merge MORE docs into
      // a class the join would also have scored at distance 0).
      // Partition the window on a 128-bit DIGEST of that set, not the
      // set itself: the collapse exchange would otherwise carry each
      // doc's full gram array as the shuffle KEY (≈ the document over
      // again), while the md5 is 16 bytes at collision odds ~n²/2¹²⁸ —
      // the same negligible-collision argument as the custom path's
      // 64-bit shingle hashes (Dedup.scala). "\n" separator — a
      // separator the grams provably cannot contain: splitWords
      // tokenizes on \s+, so words (hence space-joined grams) hold
      // no whitespace beyond the joining single spaces, and newline
      // in particular never survives. \u0001 (the previous choice)
      // is NOT \s-whitespace, so it rides through the tokenizer
      // inside a word and breaks injectivity: gram sets
      // {"a\u0001b","c"} and {"a","b\u0001c"} concatenate
      // identically and two unrelated docs would collapse as exact
      // duplicates.
      val wIdent = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(concat_ws("\n",
          array_sort(array_distinct(col("__grams"))))))
        .orderBy(col(orderKey))
      val ranked = withGrams.withColumn("__rn", row_number().over(wIdent))
      val identDups = ranked.filter(col("__rn") > 1).select(col(orderKey))
      val reps = ranked.filter(col("__rn") === 1).drop("__rn")
      val tf = new HashingTF().setInputCol("__grams").setOutputCol("__features")
        .setNumFeatures(numFeatures).setBinary(true)
      // approxSimilarityJoin consumes `featured` three times (fit + both
      // join sides); uncached, every pass re-runs gram splitting + feature
      // hashing over the whole corpus — the dominant cost. Persist the
      // featurized table, materialize the (small) duplicate-id set
      // eagerly, then release the cache.
      val featured = tf.transform(reps)
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
          .select(col("j").as(orderKey))
          .union(identDups).distinct()
          .localCheckpoint() // eager: one id column, bounded by corpus rows
        df.join(dups, Seq(orderKey), "left_anti")
      } finally featured.unpersist(false)
    } finally withGrams.unpersist(false)
  }
}
