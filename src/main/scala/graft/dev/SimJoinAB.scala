package graft.dev

import graft.LocalSpark

/** Dev A/B for [[graft.ops.sim.Similarity.similarityJoin]] bucket-width
  * and centering sizing: times the join at each requested cell over the
  * embeddings table of `SPARK_GRAFT_SF_DIR` (one pass each, same JVM,
  * cache cleared between passes) and reports pair counts so recall loss
  * at higher bits is visible next to the wall-clock win. Usage:
  *   SimJoinAB <cell...>
  * where each cell is `<bits>` or `<bits>:center` (0 = auto-size from
  * corpus count), e.g. `SimJoinAB 8 8:center 11 11:center` runs the
  * round-10 centering matrix. */
object SimJoinAB {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SimJoinAB <bits[:center]...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSpark.session()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    args.foreach { cell =>
      val parts = cell.split(":", 2)
      val bits = parts(0).toInt
      val center = parts.length > 1 && parts(1) == "center"
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val pairs = graft.ops.sim.Similarity
        .similarityJoin(emb, "embedding", "vec_id", 0.4, bits = bits,
          tables = 16, center = center)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"metric":"simjoin_ab","bits":$bits,"center":$center,""" +
        s""""pairs":$pairs,"sec":${graft.Bench.jnum(sec, 1)},"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
