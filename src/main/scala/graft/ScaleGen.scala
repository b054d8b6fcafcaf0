package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: replicate a testdata scale-factor directory xN for
  * scale-evidence runs (`ScaleGen <srcDir> <dstDir> <N>`), preserving
  * join-key consistency (every foreign key remaps with the same
  * `key * N + replica` rule as its primary key) and WITHOUT creating
  * exact clones where clones would distort the measured operator:
  * document text gets a per-replica suffix and embeddings a tiny
  * per-replica first-component jitter, so dedup/similarity queries see
  * a 10x corpus of near-but-not-exact duplicates — the realistic shape —
  * rather than 10-way identical groups that identical-set collapse
  * would shortcut. Dimension tables (region, nation) keep TPC-H
  * semantics and do not scale.
  *
  * events.parquet's ts round-trips by type generation (see
  * `Streaming.tsEpochNanos`): current testdata carries TIMESTAMP(us),
  * which Spark reads as TIMESTAMP_NTZ and writes back as-is, so the
  * `epoch_ns(ts)` oracle SQL replays against a scaled directory too.
  * (Pre-r6 testdata carried TIMESTAMP(NANOS) → read as long under
  * `nanosAsLong` → written back as plain INT64, which DuckDB saw as
  * BIGINT — those scaled dirs were bench evidence only.) */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleGen <srcDir> <dstDir> <N> [suffixWords]")
    val (src, dst, n) = (args(0), args(1), args(2).toInt)
    // suffixWords (default 1 = the classic " #rN" token): number of
    // replica-distinct filler words appended to each non-zero replica's
    // text. 1 keeps replicas NEAR-duplicates of their base (Jaccard
    // ~0.95 on a 50-word doc — every replica joins one big near-dup
    // cluster). ~25 pushes replica-vs-replica Jaccard below the 0.9
    // dedup threshold, so composing ScaleGen twice (e.g. ×100 then ×10
    // with suffixWords=25) grows the CORPUS 10× while keeping the
    // first-level cluster size — the realistic big-corpus shape, where
    // a naive ×1000 would instead make every cluster 1000-way and the
    // by-construction quadratic verify work would swamp the measurement.
    val suffixWords = if (args.length == 4) args(3).toInt else 1
    // generation is write-heavy; default to all cores unless overridden
    val spark = LocalSpark.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    /** Cross with replica ids 0..n-1 and remap the named long-ish key
      * columns to key * N + replica. */
    def scale(df: DataFrame, keys: Seq[String]): DataFrame = {
      val reps = spark.range(n).toDF("__r")
      keys.foldLeft(df.crossJoin(reps)) { (d, k) =>
        val t = df.schema(k).dataType
        d.withColumn(k, (col(k).cast("long") * n + col("__r")).cast(t))
      }
    }

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(scale(read("customer"), Seq("c_custkey")).drop("__r"), "customer")
    write(scale(read("supplier"), Seq("s_suppkey")).drop("__r"), "supplier")
    write(scale(read("part"), Seq("p_partkey")).drop("__r"), "part")
    write(scale(read("orders"), Seq("o_orderkey", "o_custkey")).drop("__r"), "orders")
    write(scale(read("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey")).drop("__r"), "lineitem")
    write(scale(read("events"), Seq("event_id", "user_id")).drop("__r"), "events")
    val replicaText =
      if (suffixWords <= 1) concat(col("text"), lit(" #r"), col("__r"))
      else concat(col("text"), lit(" "),
        array_join(transform(sequence(lit(1), lit(suffixWords)),
          i => concat(lit("r"), col("__r"), lit("w"), i)), " "))
    write(scale(read("documents"), Seq("doc_id"))
      .withColumn("text",
        when(col("__r") === 0, col("text")).otherwise(replicaText))
      .drop("__r"), "documents")
    write(scale(read("embeddings"), Seq("vec_id"))
      .withColumn("embedding",
        when(col("__r") === 0, col("embedding"))
          .otherwise(transform(col("embedding"),
            (x, i) => when(i === 0, x + col("__r").cast("float") * lit(0.001f))
              .otherwise(x))))
      .drop("__r"), "embeddings")
    println(s"""{"metric":"scalegen","src":${Json.str(src)},"dst":${Json.str(dst)},"n":$n}""")
    spark.stop()
  }
}
