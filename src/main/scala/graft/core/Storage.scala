package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Extension-dispatched reader/writer, the Spark analogue of the
  * reference's `FileStorage` format dispatch
  * (`dataflow/utils/storage.py:534-556,631-698`). Formats: json, jsonl,
  * csv, parquet, xlsx ([[graft.sources.Xlsx]], self-contained zip+XML
  * codec), pkl/pickle ([[graft.sources.Pickle]], self-contained
  * data-subset pickle VM). (`hf:`/`ms:` remote URIs are declared
  * unsupported in this zero-egress environment; the dispatch is
  * extensible.)
  */
object Storage {

  private def ext(path: String): String =
    path.substring(path.lastIndexOf('.') + 1).toLowerCase

  def read(spark: SparkSession, path: String): DataFrame = ext(path) match {
    case "json" | "jsonl" => spark.read.json(path)
    case "csv"            => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    case "parquet"        => spark.read.parquet(path)
    case "xlsx"           => graft.sources.Xlsx.read(spark, path)
    case "pkl" | "pickle" => graft.sources.Pickle.read(spark, path)
    case other            => throw new IllegalArgumentException(s"unsupported format: .$other ($path)")
  }

  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit = ext(path) match {
    case "json" | "jsonl" => df.write.mode(mode).json(path)
    case "csv"            => df.write.mode(mode).option("header", "true").csv(path)
    case "parquet"        => df.write.mode(mode).parquet(path)
    case "xlsx"           => graft.sources.Xlsx.write(df, path)
    case "pkl" | "pickle" => graft.sources.Pickle.write(df, path)
    case other            => throw new IllegalArgumentException(s"unsupported format: .$other ($path)")
  }

  /** Load a driver testdata table: `{dir}/{name}.parquet`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** JDBC source — the `MyScaleDBStorage` read mapping (SURVEY §2.1):
    * partitioned parallel read replaces the reference's LIMIT/OFFSET
    * paging (`utils/storage.py:833`). */
  def readJdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    partitionColumn match {
      case Some((colName, lower, upper, n)) =>
        spark.read.jdbc(url, table, colName, lower, upper, n, props)
      case None => spark.read.jdbc(url, table, props)
    }

  /** JDBC sink — the `MyScaleDBStorage` write mapping: non-system columns
    * should be folded first via
    * [[graft.ops.conversations.SystemColumnMerger]]. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append,
      props: java.util.Properties = new java.util.Properties): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
