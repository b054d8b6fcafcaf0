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
    val spark = LocalSpark.session()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // deterministic query subset; vec_id is unique so the slice is stable
    val queries = emb.where(col("vec_id") % 1000 < lit(nQueries / 200))
      .cache()
    val nq = queries.count() // materialize outside both timed cells
    Seq(("broadcast", Long.MaxValue), ("fallback", 0L)).foreach {
      case (label, gate) =>
        spark.catalog.clearCache(); queries.cache(); queries.count()
        System.gc()
        val t0 = System.nanoTime()
        val res = graft.ops.sim.Similarity
          .lshTopK(emb, queries, "embedding", "vec_id", k,
            maxBroadcastQueries = gate)
        // position-independent digest over every (query, neighbor, cos):
        // xor of row hashes — order can differ between the two plans
        val digest = res
          .select(xxhash64(col("query_id"), col("neighbor_id"),
            format_number(col("cos"), 9)).as("h"))
          .agg(sum(col("h")).as("d"), count(lit(1)).as("n"))
          .collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"metric":"lsh_topk_ab","cell":"$label","nq":$nq,""" +
          s""""k":$k,"rows":${digest.getLong(1)},"digest":${digest.getLong(0)},""" +
          s""""sec":${graft.Bench.jnum(sec, 1)},"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
