package graft.dev

import org.apache.spark.sql.functions._

/** Scale diagnostic for the minhash band join: bucket-size distribution,
  * maxBandBucket cap hit rate, and the implied exact-verify work, at any
  * SF dir — the numbers that explain (or clear) a ×N probe stall before
  * burning an hour on the full query. Run:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_x1000 sbt "runMain graft.dev.BandStats"
  */
object BandStats {
  def main(args: Array[String]): Unit = {
    val spark = graft.LocalSpark.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cap = sys.env.getOrElse("SPARK_GRAFT_MAXBANDBUCKET", "1024").toInt
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val op = graft.ops.dedup.MinHashDeduplicateFilter("text", "doc_id",
      ngram = 3, threshold = 0.9, maxBandBucket = cap)
    val withSh = op.shingled(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nonEmpty = withSh.filter(size(col("__sh")) > 0)
    val nDocs = nonEmpty.count()
    // identical-set collapse population (how much the window shortcuts)
    val nClasses = nonEmpty.groupBy(col("__sh")).count().count()
    // band buckets WITHOUT carrying the shingle arrays — stats only
    val nn = 128; val nb = 32
    val bandKeys = udf { hs: Seq[Long] =>
      graft.functions.kernels.minhashBandKeys(hs, nn, nb) }
    val buckets = nonEmpty
      .select(explode(bandKeys(col("__sh"))).as("__band"))
      .groupBy("__band").count()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val agg = buckets.agg(
      count(lit(1)).as("buckets"),
      max(col("count")).as("max_sz"),
      expr("percentile_approx(count, 0.5)").as("p50"),
      expr("percentile_approx(count, 0.99)").as("p99"),
      sum(when(col("count") > cap, 1L).otherwise(0L)).as("over_cap"),
      // verify-walk instances implied by the join: all-vs-all under the
      // cap, members-vs-min above it
      sum(when(col("count") <= cap, col("count") * (col("count") - 1) / 2)
        .otherwise(col("count") - 1)).as("walks"),
      sum(when(col("count") > cap, col("count") * (col("count") - 1) / 2)
        .otherwise(lit(0L))).as("walks_capped_away")
    ).head()
    println(s"""{"metric":"band_stats","sf":"$dir","docs":$nDocs,""" +
      s""""identical_classes":$nClasses,"cap":$cap,""" +
      s""""buckets":${agg.getLong(0)},"max_bucket":${agg.getLong(1)},""" +
      s""""p50":${agg.get(2)},"p99":${agg.get(3)},""" +
      s""""over_cap":${agg.getLong(4)},"verify_walks":${agg.getAs[Any](5)},""" +
      s""""walks_capped_away":${agg.getAs[Any](6)}}""")
    if (args.contains("--explain")) {
      println("===== duplicateIds plan =====")
      op.duplicateIds(withSh).explain("formatted")
    }
    spark.stop()
  }
}
