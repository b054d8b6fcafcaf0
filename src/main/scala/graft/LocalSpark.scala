package graft

import org.apache.spark.sql.SparkSession

/** The single definition of the local driver-session config, shared by
  * every main (Verify / Bench / ScaleGen / Explain). A config the
  * testdata requires (e.g. `nanosAsLong` for events.parquet's
  * TIMESTAMP(NANOS)) lands everywhere at once — scale-run data can never
  * be read under different settings than bench or verify data. */
object LocalSpark {

  def cpusFromEnv: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def session(cpus: String = cpusFromEnv): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // pre-r6 testdata carried TIMESTAMP(NANOS) in events.parquet, which
      // Spark has no native type for; this reads it as long (nanos since
      // epoch). Current testdata is TIMESTAMP(us) and unaffected; the
      // flag stays so old scaled directories remain readable — ts
      // consumers adapt by type (Streaming.tsEpochNanos).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
