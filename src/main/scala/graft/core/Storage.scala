package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Extension-dispatched reader/writer, the Spark analogue of the
  * reference's `FileStorage` format dispatch
  * (`dataflow/utils/storage.py:534-556,631-698`). Formats: json, jsonl,
  * csv, parquet. (pickle/xlsx and `hf:`/`ms:` remote URIs are declared
  * unsupported in this environment; the dispatch is extensible.)
  */
object Storage {

  private def ext(path: String): String =
    path.substring(path.lastIndexOf('.') + 1).toLowerCase

  def read(spark: SparkSession, path: String): DataFrame = ext(path) match {
    case "json" | "jsonl" => spark.read.json(path)
    case "csv"            => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    case "parquet"        => spark.read.parquet(path)
    case other            => throw new IllegalArgumentException(s"unsupported format: .$other ($path)")
  }

  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit = ext(path) match {
    case "json" | "jsonl" => df.write.mode(mode).json(path)
    case "csv"            => df.write.mode(mode).option("header", "true").csv(path)
    case "parquet"        => df.write.mode(mode).parquet(path)
    case other            => throw new IllegalArgumentException(s"unsupported format: .$other ($path)")
  }

  /** Load a driver testdata table: `{dir}/{name}.parquet`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
