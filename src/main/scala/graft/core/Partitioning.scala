package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioning and skew utilities for the 100 TB tier.
  *
  * AQE (on by default in Spark 4) already handles runtime skew-join
  * splitting and partition coalescing; these helpers cover the two cases
  * AQE can't: deliberate co-partitioning to reuse a partitioning across
  * stages, and salted aggregation for heavy-hitter keys feeding
  * non-join operators.
  */
object Partitioning {

  /** Co-partition both sides on the join key so repeated joins/aggs on
    * the same key reuse one shuffle (the poor-man's bucketing for
    * non-table data; for persisted data use `writeBucketed`). */
  def coPartition(left: DataFrame, right: DataFrame, key: String,
      numPartitions: Int): (DataFrame, DataFrame) =
    (left.repartition(numPartitions, col(key)),
      right.repartition(numPartitions, col(key)))

  /** Salted two-phase aggregation: groupBy(key, salt) partial → groupBy
    * key final. Caps per-task input for heavy-hitter keys at
    * 1/saltBuckets of the key's rows. `partialAggs` must be mergeable by
    * the matching `finalAggs` (e.g. sum→sum, count→sum, max→max). */
  def saltedAgg(df: DataFrame, key: String, saltBuckets: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(col(key)).agg(finalAggs.head, finalAggs.tail: _*)
      .drop("__salt")
  }

  /** Salted broadcast join for a skewed fact side against a small dim:
    * explode the dim `saltBuckets`× with a salt column, salt the fact
    * rows, join on (key, salt) — spreads one hot key over many tasks. */
  def saltedBroadcastJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedFact.join(broadcast(saltedDim), Seq(key, "__salt")).drop("__salt")
  }

  /** Persist bucketed by key — co-located scan-side joins with zero
    * shuffle for every later consumer of the same key. Written as an
    * EXTERNAL table (explicit path at the default warehouse location):
    * managed CTAS refuses any pre-existing non-empty location
    * (LOCATION_ALREADY_EXISTS) — a landmine when a previous session, a
    * crashed run, or an unchecked filesystem delete leaves the directory
    * behind — while external + overwrite owns the directory lifecycle
    * itself, making the write idempotent without a manual delete. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").option("path", loc.toString).saveAsTable(table)
  }
}
