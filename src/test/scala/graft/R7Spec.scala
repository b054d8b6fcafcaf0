package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 regressions: the replayable-hash idiom behind the cider-D
  * gram keys, and the IVF centroid export that powers its value oracle. */
class R7Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("md5Prefix60 equals the DuckDB replay form (first 15 md5 hex chars as BIGINT)") {
    // the oracle recomputes the gram key as
    // ('0x' || substr(md5(g), 1, 15))::BIGINT — the kernel's bit
    // arithmetic must match that hex-parse definition exactly
    val samples = Seq("", "a", "alpha beta", "four gram token run",
      "naïve café 日本語", "", "x" * 500)
    samples.foreach { s =>
      val viaHex = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          s.getBytes("UTF-8")).substring(0, 15), 16)
      assert(graft.functions.kernels.md5Prefix60(s) == viaHex, s"input: $s")
      // the memoized variant must be observably identical (first call
      // populates, second call hits)
      assert(graft.functions.kernels.md5Prefix60Memo(s) == viaHex)
      assert(graft.functions.kernels.md5Prefix60Memo(s) == viaHex)
    }
  }

  test("PairNgramTfGen matches a per-gram md5Prefix60 count done the slow way") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      ("a b c a b", "b c d"),
      ("naïve café 日本語 naïve café", "naïve café"),
      ("solo", ""),
      ("x x x x x", "x x"),
      (null, "only ref side"),
      ("only pred side", null)
    ).toDF("pred", "gold").withColumn("id", monotonically_increasing_id())
    val got = docs.select(col("id"), graft.functions.hashExpressions.pairNgramTf(
        graft.functions.text.words(col("pred")),
        graft.functions.text.words(col("gold")), 4))
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1), r.getLong(2)), (r.getLong(3), r.getLong(4))))
      .toMap
    // slow-way expectation: String-joined grams through md5Prefix60
    def grams(s: String): Seq[(Int, Long)] =
      if (s == null) Nil
      else {
        val ws = graft.functions.kernels.splitWords(s)
        for (k <- 1 to 4; i <- 0 to ws.length - k)
          yield (k, graft.functions.kernels.md5Prefix60(ws.slice(i, i + k).mkString(" ")))
      }
    val expected = docs.select("id", "pred", "gold").collect().flatMap { r =>
      val id = r.getLong(0)
      val p = grams(r.getString(1)).groupBy(identity).view.mapValues(_.size.toLong)
      val g = grams(r.getString(2)).groupBy(identity).view.mapValues(_.size.toLong)
      (p.keySet ++ g.keySet).map { case key @ (n, h) =>
        ((id, n, h), (p.getOrElse(key, 0L), g.getOrElse(key, 0L)))
      }
    }.toMap
    assert(got == expected)
  }

  test("ivfTopK exportDir writes one centroid row per list, keyed by corpus count") {
    val dim = 16
    val rows = (0L until 300L).map { i =>
      (i, (0 until dim).map(d => math.sin(i * dim + d)))
    }.toDF("vec_id", "embedding")
    val out = java.nio.file.Files.createTempDirectory("graft_ivf_test").toString
    graft.ops.sim.Similarity.ivfTopK(rows, rows.filter(col("vec_id") < 3),
      "embedding", "vec_id", k = 3, nLists = 8, nProbe = 2,
      exportDir = Some(out)).count()
    val exported = spark.read.parquet(s"$out/rows_300")
    assert(exported.count() == 8)
    assert(exported.columns.sorted.toSeq == Seq("center", "list_id", "sf_rows"))
    assert(exported.select("sf_rows").distinct().as[Long].head() == 300L)
    // centers carry the training dimensionality
    assert(exported.select(size(col("center"))).distinct().as[Int].head() == dim)
  }
}
