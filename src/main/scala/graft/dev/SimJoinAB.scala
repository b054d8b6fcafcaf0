package graft.dev

import org.apache.spark.sql.functions._
import graft.LocalSpark

/** Dev A/B for [[graft.ops.sim.Similarity.similarityJoin]] bucket-width
  * sizing: times the join at each requested `bits` over the embeddings
  * table of `SPARK_GRAFT_SF_DIR` (one pass each, same JVM, cache cleared
  * between passes) and reports pair counts so recall loss at higher bits
  * is visible next to the wall-clock win. Usage:
  *   SimJoinAB <bits...>      (0 = auto-size from corpus count)
  */
object SimJoinAB {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SimJoinAB <bits...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSpark.session()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    args.map(_.toInt).foreach { bits =>
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val pairs = graft.ops.sim.Similarity
        .similarityJoin(emb, "embedding", "vec_id", 0.4, bits = bits,
          tables = 16)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"metric":"simjoin_ab","bits":$bits,""" +
        s""""pairs":$pairs,"sec":${f"$sec%.1f"},"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
