package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 regressions: the bench's per-query cpu/wall attribution
  * signal, and the verify-only gating of the IVF centroid export. */
class R8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("bench cpuRatio separates stolen wall time from burned cpu") {
    // A query whose wall is mostly time this JVM does NOT run (sleep =
    // the exact shape of externally-stolen time: wall advances, process
    // cpu doesn't) must report cpu/wall well under 1; a query that
    // burns cores must report well over 1. This is the machine-readable
    // signal the recorded artifact lacked for three rounds: an inflated
    // wall with a proportionally fallen cpuRatio is co-load, not code.
    val sleeper = (s: SparkSession, _: String) => {
      Thread.sleep(1000); s.range(1).toDF()
    }
    val spinner = (s: SparkSession, _: String) => {
      val threads = (1 to 8).map { _ =>
        new Thread(() => {
          val deadline = System.nanoTime() + 400L * 1000 * 1000
          var x = 0L
          while (System.nanoTime() < deadline) { x += 1 }
          if (x == -1) println(x) // defeat dead-code elimination
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      s.range(1).toDF()
    }
    val out = Bench.runQueries(spark, sf,
      Seq("sleepy" -> sleeper, "spinny" -> spinner),
      passes = 3, isolate = false).toMap
    val slept = out("sleepy")
    val spun = out("spinny")
    assert(slept.error.isEmpty && spun.error.isEmpty)
    assert(slept.cpuRatio >= 0 && spun.cpuRatio >= 0, "cpu clock unavailable")
    // 1 s asleep + a trivial count: background JVM threads (JIT, GC,
    // Spark housekeeping) accrue some cpu, but well under wall — while
    // genuinely-working queries on this 32-way box run far above it.
    // The relative contrast is the pinned contract; the absolute bound
    // is deliberately generous to background-compile churn.
    assert(slept.cpuRatio < 1.0, s"sleeper cpuRatio=${slept.cpuRatio}")
    // 8 spinning threads: ≈8 cpu-seconds per wall-second
    assert(spun.cpuRatio > 2.0, s"spinner cpuRatio=${spun.cpuRatio}")
    assert(spun.cpuRatio > 3 * slept.cpuRatio,
      s"no contrast: spun=${spun.cpuRatio} slept=${slept.cpuRatio}")
  }

  test("mllib minhash collapse keeps exactly the first of an exact-clone cluster") {
    import spark.implicits._
    // 200-way exact-clone cluster + distinct docs: without the
    // identical-set collapse this is the O(m²) candidate shape; with it
    // the window keeps doc 0 and drops 1..199 before LSH ever runs —
    // and the output must be exactly keep-first.
    val clone = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((0L until 200L).map(i => (i, clone)) ++
      Seq((500L, "completely different words about databases and engines here"),
          (501L, "yet another unrelated sentence mentioning spark catalyst tungsten")))
      .toDF("doc_id", "text")
    val kept = graft.ops.dedup.MinHashLSHDeduplicateFilter("text", "doc_id")(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 500L, 501L), s"got $kept")
  }

  test("IVF centroid export happens only under the verify flag") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val nRows = emb.count()
    val exportPath = java.nio.file.Paths.get(
      s"/tmp/graft_ivf_centroids/rows_$nRows")
    def deleteExport(): Unit = if (java.nio.file.Files.exists(exportPath)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(exportPath).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.delete)
    }
    val run = () => SparkEntry.queries("sim_ivf_topk")(spark, sf).count()
    val prev = sys.props.remove("graft.ivf.export")
    try {
      deleteExport()
      run() // bench shape: no flag → no export write inside the query
      assert(!java.nio.file.Files.exists(exportPath),
        "bench pass wrote the centroid export")
      sys.props("graft.ivf.export") = "true"
      run() // verify shape: flag set → oracle input materialized
      assert(java.nio.file.Files.exists(exportPath),
        "verify pass did not write the centroid export")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.ivf.export") = v.toString
        case None    => sys.props.remove("graft.ivf.export")
      }
    }
  }

  test("minhash band waves reproduce the single-pass result exactly") {
    // The ×1000 probe killed the single-pass minhash on shuffle scratch
    // (the band exchange replicates each shingle array ×32 — ~105 GB for
    // a 5M-doc corpus). The wave path must be a pure partition of the
    // band set: same drops, bit for bit, on a corpus that exercises all
    // three phases (exact clones → collapse, near-dup cluster → band
    // verify, capped hot buckets → min-representative path).
    import spark.implicits._
    import graft.ops.dedup.MinHashDeduplicateFilter
    val base = (0 until 80).map(t => s"tok$t")
    val nearDups = (0L until 60L).map { i =>
      (i, base.zipWithIndex.collect {
        case (w, p) if p != (i % 80).toInt => w }.mkString(" "))
    }
    val clones = (100L until 140L).map(i => (i, "the same exact text" * 5))
    val uniques = (200L until 260L).map(i =>
      (i, s"unique document $i about ${i * 31} and ${i * 7}"))
    val df = (nearDups ++ clones ++ uniques).toDF("doc_id", "text")
    val op = MinHashDeduplicateFilter("text", "doc_id", threshold = 0.9,
      maxBandBucket = 16) // force the big-bucket path into the waves too
    val withSh = op.shingled(df).persist()
    try {
      val single = op.duplicateIds(withSh)
        .as[Long].collect().toSet
      for (groups <- Seq(2, 5, 32)) { // uneven split, one-band waves
        val waved = op.groupedDuplicateIds(withSh, groups)
          .as[Long].collect().toSet
        assert(waved == single, s"groups=$groups diverged: " +
          s"only-waved=${(waved -- single).take(5)} " +
          s"only-single=${(single -- waved).take(5)}")
      }
    } finally withSh.unpersist()
  }

  test("band wave count scales with measured shingle volume") {
    import spark.implicits._
    import graft.ops.dedup.MinHashDeduplicateFilter
    val docs = (0L until 50L).map(i =>
      (i, s"document $i with some words ${i * 3} ${i * 7} ${i * 11}"))
      .toDF("doc_id", "text")
    val roomy = MinHashDeduplicateFilter("text", "doc_id")
    val withSh = roomy.shingled(docs)
    // default budget (24 GiB) on a 50-doc corpus: single-pass plan
    assert(roomy.bandGroupCount(withSh) == 1)
    // a budget smaller than one band's bytes clamps at the band count
    val tight = roomy.copy(scratchBudgetBytes = 1L)
    assert(tight.bandGroupCount(withSh) == roomy.bands)
    // empty corpus: no NPE from the null sum, single pass
    val empty = docs.filter(col("doc_id") < 0)
    assert(roomy.bandGroupCount(roomy.shingled(empty)) == 1)
    // end-to-end through apply(): a tight budget must not change results
    val defaultKept = roomy(docs).select("doc_id").as[Long].collect().toSet
    val wavedKept = tight(docs).select("doc_id").as[Long].collect().toSet
    assert(wavedKept == defaultKept)
  }

  /** Deterministic embedding corpus with planted duplicate clusters:
    * `clusters` groups of `size` near-identical vectors plus `loose`
    * unrelated ones. */
  private def plantedEmbeddings(clusters: Int, size: Int,
      loose: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(7)
    val bases = (0 until clusters).map(_ => Array.fill(64)(rnd.nextGaussian()))
    val members = for {
      c <- 0 until clusters; m <- 0 until size
    } yield ((c * size + m).toLong,
      bases(c).map(_ + rnd.nextGaussian() * 0.001).toSeq)
    val singles = (0 until loose).map(i =>
      ((100000 + i).toLong, Array.fill(64)(rnd.nextGaussian()).toSeq))
    members ++ singles
  }

  test("sem dedup witness walk matches an independent LSH+cosine replay") {
    // The ×1000 probe ran the bucket self-join form of dedup_sem_lsh in
    // 862 s — all-pairs verify inside 1000-member duplicate buckets. The
    // streaming witness walk must reproduce the join form's drop set
    // exactly: candidates = any shared bucket, drop j iff some earlier
    // same-bucket i has cos ≥ 1-eps (dropped rows still witness).
    import spark.implicits._
    import graft.ops.dedup.SemDeduplicateFilter
    val rows = plantedEmbeddings(clusters = 5, size = 12, loose = 40)
    val df = rows.toDF("vec_id", "embedding")
    val kept = SemDeduplicateFilter("embedding", "vec_id", eps = 0.05)(df)
      .select("vec_id").as[Long].collect().toSet
    // independent replay: same bucket expression, collected and walked
    // with plain Scala set logic and the same strict-fold cosine
    val bucketsOf = df
      .select(col("vec_id"), graft.ops.sim.CosineLsh.buckets(
        col("embedding").cast("array<double>"), 8, 64, 4).as("b"))
      .as[(Long, Seq[String])].collect().toMap
    val vecOf = rows.toMap.view.mapValues(_.toArray).toMap
    val ids = rows.map(_._1).sorted
    val dropped = ids.filter { j =>
      ids.exists(i => i < j &&
        bucketsOf(i).exists(bucketsOf(j).contains) &&
        graft.ops.dedup.Dedup.cosineFold(vecOf(i), vecOf(j)) >= 0.95)
    }.toSet
    assert(kept == ids.toSet -- dropped,
      s"extra-kept=${(kept -- (ids.toSet -- dropped)).take(5)} " +
        s"missing=${((ids.toSet -- dropped) -- kept).take(5)}")
  }

  test("sem dedup pool cap degrades to a keep-superset, never false drops") {
    import spark.implicits._
    import graft.ops.dedup.SemDeduplicateFilter
    val df = plantedEmbeddings(clusters = 2, size = 30, loose = 10)
      .toDF("vec_id", "embedding")
    val exactKept = SemDeduplicateFilter("embedding", "vec_id")(df)
      .select("vec_id").as[Long].collect().toSet
    // cap of 3: later cluster members only see the first 3 as witnesses —
    // here every member matches the cluster's first vector, so the drop
    // set is unchanged; in general the capped keep set can only GROW
    val capped = SemDeduplicateFilter("embedding", "vec_id", maxBucket = 3)(df)
      .select("vec_id").as[Long].collect().toSet
    assert(exactKept.subsetOf(capped))
    assert(capped == exactKept) // cluster-of-near-identicals: same set
  }

  test("similarity join emits each qualifying pair exactly once") {
    import spark.implicits._
    // near-identical vectors collide in ALL four tables — under the old
    // dropDuplicates form each pair reached the pair exchange four times
    // (~4× the output shuffled, which killed a ×1000 probe on scratch);
    // emit-once keeps a pair only in its first shared bucket, so the raw
    // output must already be duplicate-free
    val df = plantedEmbeddings(clusters = 3, size = 8, loose = 20)
      .toDF("vec_id", "embedding")
    val pairs = graft.ops.sim.Similarity
      .similarityJoin(df, "embedding", "vec_id", threshold = 0.95)
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.length == pairs.toSet.size,
      s"duplicate pairs in raw output: ${pairs.length} rows, " +
        s"${pairs.toSet.size} distinct")
    // and the pair SET is the full planted set within each cluster
    val expected = (for {
      c <- 0 until 3; i <- 0 until 8; j <- i + 1 until 8
    } yield ((c * 8 + i).toLong, (c * 8 + j).toLong)).toSet
    assert(pairs.toSet == expected,
      s"missing=${(expected -- pairs.toSet).take(5)} " +
        s"extra=${(pairs.toSet -- expected).take(5)}")
  }
}
