package graft.dev

import graft.LocalSpark
import org.apache.spark.sql.functions._

/** Dev A/B for [[graft.ops.sim.Similarity.lshTopK]]'s broadcast-OOM
  * gate: the gate's FALLBACK branch (query side > maxBroadcastQueries →
  * merge-hinted shuffle join) is plan-pinned by test but its wall had
  * never been measured above sf0.1 (r13 verdict stretch #8). Runs the
  * same (corpus, queries, k) cell twice in one JVM — A: the default
  * gate (small query side → broadcast), B: the fallback FORCED via
  * maxBroadcastQueries = 0 — and reports both walls plus a
  * position-independent result digest, so the A/B certifies the two
  * plans agree bit-for-bit before comparing their cost. Usage:
  *   LshTopKAB [nQueries] [k]     (corpus = SPARK_GRAFT_SF_DIR embeddings)
  */
object LshTopKAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x100")
    val nQueries = args.headOption.map(_.toInt).getOrElse(50000)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    // cell order ("ab" = broadcast first, "ba" = fallback first): a
    // fixed order would let JIT/page-cache warmup masquerade as a plan
    // difference — run both orders and compare like cells across runs
    val order = args.drop(2).headOption.getOrElse("ab")
    val spark = LocalSpark.session()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // deterministic query subset; vec_id is unique so the slice is stable
    val queries = emb.where(col("vec_id") % 1000 < lit(nQueries / 200))
      .cache()
    val nq = queries.count() // materialize outside both timed cells
    // per-stage attribution: run time, cpu time, GC, shuffle bytes —
    // the 6x broadcast-vs-fallback gap (r14) was invisible at the plan
    // level, so each cell reports WHERE its wall went
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo; val m = si.taskMetrics
          // stage WALL (submission->completion) beside summed task time:
          // the r14 broadcast cell burned ~2100 task-core-s in a 616 s
          // wall — the gap lives BETWEEN stage walls, and only this
          // pairing shows it
          val wall = (for { s <- si.submissionTime; c <- si.completionTime }
            yield c - s).getOrElse(-1L)
          stages.synchronized {
            stages += ((si.stageId, si.numTasks + "t/" + wall + "ms",
              m.executorRunTime, m.executorCpuTime / 1000000L,
              m.jvmGCTime, m.shuffleReadMetrics.totalBytesRead,
              m.shuffleWriteMetrics.bytesWritten))
          }
        }
      })
    val cells = Seq(("broadcast", Long.MaxValue), ("fallback", 0L))
    (if (order == "ba") cells.reverse else cells).foreach {
      case (label, gate) =>
        spark.catalog.clearCache(); queries.cache(); queries.count()
        System.gc()
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        val res = graft.ops.sim.Similarity
          .lshTopK(emb, queries, "embedding", "vec_id", k,
            maxBroadcastQueries = gate)
        // position-independent digest over every (query, neighbor, rank)
        // row — lshTopK's output schema; XOR of row hashes (order can
        // differ between the two plans, and a sum of 64-bit hashes
        // overflows under ANSI)
        val digest = res
          .select(xxhash64(col("query_id"), col("neighbor_id"),
            col("rank")).as("h"))
          .agg(expr("bit_xor(h)").as("d"), count(lit(1)).as("n"))
          .collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"metric":"lsh_topk_ab","cell":"$label","nq":$nq,""" +
          s""""k":$k,"rows":${digest.getLong(1)},"digest":${digest.getLong(0)},""" +
          s""""sec":${graft.Bench.jnum(sec, 1)},"sf":"$sfDir"}""")
        stages.synchronized(stages.sortBy(-_._3)).take(8).foreach {
          case (id, name, run, cpu, gc, sr, sw) =>
            println(f"#   stage $id%3d $name%-40s run=${run / 1000.0}%8.1fs " +
              f"cpu=${cpu / 1000.0}%8.1fs gc=${gc / 1000.0}%6.1fs " +
              f"shufR=${sr / 1e6}%8.1fMB shufW=${sw / 1e6}%8.1fMB")
        }
    }
    spark.stop()
  }
}
