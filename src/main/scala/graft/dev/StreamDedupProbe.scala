package graft.dev

import org.apache.spark.sql.functions._
import graft.LocalSpark

/** Phase-timing probe for the `stream_dedup_horizon` bench query (r17
  * optimization round — guide §1 "measure first"). The query's wall is
  * ~14.7 s of an 80 s clean bench (r16 artifact) over a 2 MB / 100k-row
  * events table, i.e. nearly all overhead; this probe times each phase
  * separately so the optimization targets the measured cost, not a
  * guess:
  *   bounds   — the min/max epoch agg
  *   stage3   — the CURRENT tier staging (3 × filter+coalesce(1)+write)
  *   stage1   — the candidate single-pass staging
  *              (repartition(tier) + partitionBy write, 1 job)
  *   stream   — streaming dedup over the staged files (3 micro-batches,
  *              AvailableNow, memory sink) + collect
  * Usage: run_main.sh graft.dev.StreamDedupProbe [iters]
  */
object StreamDedupProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSpark.session()
    spark.range(1000).selectExpr("sum(id)").collect()
    val events = graft.core.Storage.table(spark, sfDir, "events")
    events.count()

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"metric":"phase","label":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      r
    }

    (1 to iters).foreach { it =>
      println(s"""{"metric":"iter","i":$it}""")
      val ns = graft.streaming.Streaming.tsEpochNanos(events)
      val bounds = timed("bounds")(events.agg(min(ns), max(ns)).head())
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val tiered = events.withColumn("__ns", ns).withColumn("tier",
        expr(s"least((__ns - ${lo}L) * 3 div ${hi - lo + 1}L, 2L)")).drop("__ns")

      // current shape: 3 serial filter+coalesce(1)+write jobs
      val dir3 = java.nio.file.Files.createTempDirectory("sdh_probe3")
      timed("stage3") {
        (0 to 2).foreach { i =>
          val w = java.nio.file.Files.createTempDirectory(s"sdh_probe3_w$i")
          tiered.filter(col("tier") === i).coalesce(1)
            .write.mode("overwrite").parquet(w.toString)
          val parts = java.nio.file.Files.list(w).iterator()
          scala.jdk.CollectionConverters.IteratorHasAsScala(parts).asScala
            .find(_.getFileName.toString.endsWith(".parquet")).foreach { f =>
              val dst = java.nio.file.Files.copy(f, dir3.resolve(f"b$i%02d.parquet"))
              java.nio.file.Files.setLastModifiedTime(dst,
                java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
            }
        }
      }

      // candidate shape: one job, hash-partition by tier value, write all
      // three files via partitionBy on a duplicated column
      val dir1 = java.nio.file.Files.createTempDirectory("sdh_probe1")
      timed("stage1") {
        val w = java.nio.file.Files.createTempDirectory("sdh_probe1_w")
        tiered.withColumn("__pt", col("tier"))
          .repartition(col("__pt"))
          .write.mode("overwrite").partitionBy("__pt").parquet(w.toString)
        (0 to 2).foreach { i =>
          val td = w.resolve(s"__pt=$i")
          val parts = java.nio.file.Files.list(td).iterator()
          scala.jdk.CollectionConverters.IteratorHasAsScala(parts).asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSeq match {
              case Seq(f) =>
                val dst = java.nio.file.Files.copy(f, dir1.resolve(f"b$i%02d.parquet"))
                java.nio.file.Files.setLastModifiedTime(dst,
                  java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000L))
              case fs => sys.error(s"tier $i produced ${fs.size} files")
            }
        }
      }

      // sanity: both stagings hold identical tier row sets
      val a = spark.read.parquet(dir3.toString).groupBy("tier").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = spark.read.parquet(dir1.toString).groupBy("tier").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      println(s"""{"metric":"staging_match","equal":${a == b},"counts":"$a"}""")

      Seq("stream3" -> dir3, "stream1" -> dir1).foreach { case (label, d) =>
        val qn = "sdhp_" + java.util.UUID.randomUUID().toString.replace("-", "")
        timed(label) {
          val stream = spark.readStream.schema(tiered.schema)
            .option("maxFilesPerTrigger", 1).parquet(d.toString)
          val out = graft.streaming.Streaming.streamingDedup(stream,
              concat_ws(":", col("tier"), col("user_id")), watermark = "10 minutes")
            .select(col("tier"), col("user_id"))
          val q = out.writeStream.outputMode("append").format("memory").queryName(qn)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          q.awaitTermination()
          q.recentProgress.foreach { p =>
            val dm = p.durationMs
            println(s"""{"metric":"batch","label":"$label","id":${p.batchId},""" +
              s""""rows":${p.numInputRows},"durationMs":$dm}""")
          }
          println(s"""{"metric":"kept","label":"$label","n":${spark.table(qn).count()}}""")
          spark.catalog.dropTempView(qn)
        }
      }
      Seq(dir3, dir1).foreach { p =>
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
    spark.stop()
  }
}
