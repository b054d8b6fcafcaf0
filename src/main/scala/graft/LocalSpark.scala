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
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no native
      // type for; read as long (nanos since epoch) and convert on use.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
