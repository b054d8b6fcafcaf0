package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.core.Pipeline

/** Streaming tier.
  *
  * The reference's "streaming" is disk-backed micro-batching for memory
  * control (`StreamBatchedFileStorage.iter_chunks`,
  * `dataflow/utils/storage.py:1080-1184`; chunk-at-a-time pipeline with
  * `(step,batch)` resume checkpoints, `pipeline/Pipeline.py:624-706`).
  * Structured Streaming subsumes that exactly: file source → per-batch
  * pipeline application → checkpointed sink; plus true event-time
  * windows/watermarks the reference lacks.
  */
object Streaming {

  /** Run an operator [[Pipeline]] chunk-at-a-time over files appearing in
    * `srcDir`, writing parquet per micro-batch with checkpoint/resume —
    * the Structured-Streaming mirror of `StreamBatchedPipelineABC`. */
  def chunkedPipeline(spark: SparkSession, srcDir: String, schema: StructType,
      pipeline: Pipeline, outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        pipeline(batch).write.mode("append").parquet(s"$outDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** `ts` as exact epoch nanos, across testdata generations: either
    * INT64 epoch nanos (TIMESTAMP(NANOS) parquet read under
    * `nanosAsLong` — pre-r6 testdata and old ScaleGen output) or a real
    * TIMESTAMP / TIMESTAMP_NTZ (micros — current testdata). The NTZ→TZ
    * cast is exact under the UTC session `LocalSpark` pins (DuckDB's
    * `epoch_ns` treats naive timestamps as UTC the same way). Integer
    * arithmetic throughout — epoch nanos (~1.7e18) exceed 2^53, so any
    * double detour can land boundary timestamps in the wrong window. */
  private[graft] def tsEpochNanos(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.LongType => col(name)
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(name).cast("timestamp")) * 1000L
      // fail fast: a silent cast would read e.g. IntegerType as epoch
      // SECONDS and put every event in the wrong window
      case other => throw new IllegalArgumentException(
        s"event-time column `$name` must be LongType (epoch nanos) or a " +
          s"timestamp, got $other")
    }

  /** `ts` as an event-time TIMESTAMP column, same two generations. */
  private[graft] def tsAsTimestamp(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.LongType =>
        // backtick-quoted: `div` needs expr(), and a raw interpolation
        // would mis-parse names with spaces/dots
        timestamp_micros(expr(s"`${name.replace("`", "``")}` div 1000"))
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        col(name).cast("timestamp")
      case other => throw new IllegalArgumentException(
        s"event-time column `$name` must be LongType (epoch nanos) or a " +
          s"timestamp, got $other")
    }

  /** Event-time tumbling-window aggregation over the events table.
    * `div` is true integer division — Column./ on longs is DOUBLE
    * division (see [[tsEpochNanos]]). sum_value is canonicalized to
    * double (Spark widens sum(decimal) differently from other
    * engines). */
  def windowedEventStats(events: DataFrame, widthSec: Long): DataFrame = {
    val widthNanos = widthSec * 1000000000L
    events
      .withColumn("__ns", tsEpochNanos(events))
      .withColumn("window_start",
        expr(s"__ns div ${widthNanos}L") * widthSec)
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(20,2)")).cast("double"), 2).as("sum_value"))
  }

  /** The same aggregation as a true streaming query with watermark —
    * late data beyond the watermark is dropped, state is bounded. */
  def windowedEventStatsStreaming(stream: DataFrame, widthSec: Long,
      watermark: String = "10 minutes"): DataFrame = {
    stream.withColumn("__ts", tsAsTimestamp(stream))
      .withWatermark("__ts", watermark)
      .groupBy(window(col("__ts"), s"$widthSec seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(20,2)")).as("sum_value"))
  }

  /** Session-ish stateful dedup across chunks — the reference's
    * cross-chunk `seen_hashes` set made fault-tolerant (its set survives
    * only within one process run; this one survives restarts via the
    * checkpoint). State is bounded WITHIN THE WATERMARK HORIZON:
    * `dropDuplicatesWithinWatermark` evicts a key's state once the
    * watermark passes its event time, so the store holds only the keys
    * seen in the trailing `watermark` window — the first occurrence
    * within that horizon wins, exactly the semantics of a seen-set with
    * a retention TTL. A plain `dropDuplicates("__h")` here would be a
    * scale trap: with the event-time column absent from the dedup key,
    * Spark ignores the watermark for state eviction and the store grows
    * with every distinct hash forever. */
  def streamingDedup(stream: DataFrame, hashCol: Column,
      watermark: String = "1 hour"): DataFrame = {
    stream.withColumn("__ts", tsAsTimestamp(stream))
      .withColumn("__h", hashCol)
      .withWatermark("__ts", watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")
  }
}
