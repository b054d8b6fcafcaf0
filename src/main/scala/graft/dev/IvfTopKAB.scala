package graft.dev

import graft.LocalSpark
import org.apache.spark.sql.functions._

/** Dev A/B for [[graft.ops.sim.Similarity.ivfTopK]]'s r15 probe-stage
  * parallelism heal (the r14 verdict's one weak mark): the cosine +
  * partial-top-k stage above rankTopK's exchange runs at the corpus
  * SCAN's split count, so a compact single-file corpus probed by a
  * large query set starves — the exact hazard class measured at 7× in
  * lshTopK (546→78 s at ×100). Runs the same (corpus, queries, k,
  * nLists, nProbe) cell twice in one JVM — A: the default gate (heal
  * fires when the scan is starved), B: the heal DISABLED via
  * minHealQueries = Long.MaxValue — and reports both walls plus a
  * position-independent result digest, so the A/B certifies the two
  * plans agree bit-for-bit before comparing their cost. Centroids are
  * identical across cells by construction (the k-means training slice
  * stays on the unhealed corpus), so digests must match even at
  * nProbe < nLists. Usage:
  *   IvfTopKAB [nQueries] [k] [order] [nLists] [nProbe]
  *   (corpus = SPARK_GRAFT_SF_DIR embeddings)
  */
object IvfTopKAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x100")
    val nQueries = args.headOption.map(_.toInt).getOrElse(50000)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    // cell order ("ab" = healed first, "ba" = unhealed first): a fixed
    // order would let JIT/page-cache warmup masquerade as a plan
    // difference — run both orders and compare like cells across runs
    val order = args.drop(2).headOption.getOrElse("ab")
    val nLists = args.drop(3).headOption.map(_.toInt).getOrElse(16)
    val nProbe = args.drop(4).headOption.map(_.toInt).getOrElse(4)
    val spark = LocalSpark.session()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // deterministic query subset; vec_id is unique so the slice is stable
    val queries = emb.where(col("vec_id") % 1000 < lit(nQueries / 200))
      .cache()
    val nq = queries.count() // materialize outside both timed cells
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long, Long, Long, Long)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.numTasks + "t/" + wall + "ms",
            m.executorRunTime, m.executorCpuTime / 1000000L,
            m.jvmGCTime, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten))
        }
      }
    }
    val cells = Seq(
      ("healed", graft.ops.sim.Similarity.MinHealQueries),
      ("unhealed", Long.MaxValue))
    (if (order == "ba") cells.reverse else cells).foreach {
      case (label, floor) =>
        spark.catalog.clearCache(); queries.cache(); queries.count()
        System.gc()
        stages.synchronized(stages.clear())
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val res = graft.ops.sim.Similarity
          .ivfTopK(emb, queries, "embedding", "vec_id", k,
            nLists = nLists, nProbe = nProbe, minHealQueries = floor)
        // position-independent digest (LshTopKAB's shape): XOR of row
        // hashes — order can differ between the two plans
        val digest = res
          .select(xxhash64(col("query_id"), col("neighbor_id"),
            col("rank")).as("h"))
          .agg(expr("bit_xor(h)").as("d"), count(lit(1)).as("n"))
          .collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        // flush the async bus before snapshotting, then detach so no
        // straggler stage lands in the next cell's table (r15 advice)
        org.apache.spark.graftbridge.ShuffleCleanup
          .drainListenerBus(spark.sparkContext)
        spark.sparkContext.removeSparkListener(listener)
        println(s"""{"metric":"ivf_topk_ab","cell":"$label","nq":$nq,""" +
          s""""k":$k,"nlists":$nLists,"nprobe":$nProbe,""" +
          s""""rows":${digest.getLong(1)},"digest":${digest.getLong(0)},""" +
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
