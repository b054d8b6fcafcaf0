package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 regressions: deterministic (non-GC) wave shuffle reclamation,
  * the emit-once bucket-uniqueness invariant, the MLlib collapse's digest
  * shuffle key, and the oracled streaming-dedup query. */
class R9Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("ShuffleCleanup removes exactly the snapshot-delta shuffles, synchronously") {
    import org.apache.spark.graftbridge.ShuffleCleanup
    val sc = spark.sparkContext
    val before = ShuffleCleanup.liveShuffleIds(sc)
    // a query with a real exchange, lineage-truncated so removal is safe
    val out = spark.range(10000).toDF("id")
      .withColumn("g", col("id") % 7)
      .groupBy("g").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    assert(out.count() == 7)
    val created = ShuffleCleanup.liveShuffleIds(sc) -- before
    assert(created.nonEmpty, "expected the groupBy to register a shuffle")
    ShuffleCleanup.removeShuffles(sc, created)
    // doCleanupShuffle(blocking=true) returns only after unregistration:
    // the ids must be gone NOW, with no GC in between
    val after = ShuffleCleanup.liveShuffleIds(sc)
    assert((after & created).isEmpty,
      s"shuffles ${after & created} survived a blocking removal")
    // and the checkpointed result is still readable (its lineage no
    // longer references the removed shuffles)
    assert(out.count() == 7)
  }

  test("waved minhash leaves no wave shuffles registered and matches single-pass") {
    import org.apache.spark.graftbridge.ShuffleCleanup
    val docs = core.Storage.table(spark, sf, "documents")
    val op = graft.ops.dedup.MinHashDeduplicateFilter()
    val withSh = op.shingled(docs).persist()
    try {
      val before0 = ShuffleCleanup.liveShuffleIds(spark.sparkContext)
      val single = op.duplicateIds(withSh).collect().map(_.getLong(0)).toSet
      // the single-pass plan's OWN shuffle count, measured — the leak
      // assertion below is relative to it, so a benign planner/AQE change
      // that adds an exchange moves both sides instead of flaking a
      // hard-coded constant (round-9 ADVICE)
      val singleCreated =
        (ShuffleCleanup.liveShuffleIds(spark.sparkContext) -- before0).size
      val before = ShuffleCleanup.liveShuffleIds(spark.sparkContext)
      val waved = op.groupedDuplicateIds(withSh, groups = 3)
      val got = waved.collect().map(_.getLong(0)).toSet
      assert(got == single, "waved ids diverge from single-pass")
      // every wave's shuffles were removed inside groupedDuplicateIds;
      // what remains is at most the shared prologue (identical-set
      // window behind identIds AND repsB — two plan instances) and the
      // final union-distinct. Since the r18 witness walk the single-pass
      // plan is itself small (ident window + band exchange + distinct —
      // the merge-join sides it used to register are gone), so the waved
      // remainder can EQUAL the single-pass count; the reclamation
      // signal is proportional instead: a wave whose cleanup broke
      // leaks its band exchange AND its pre-checkpoint distinct (≥ 2
      // shuffles per broken wave), so even ONE broken wave pushes the
      // count to singleCreated + 2.
      val leaked = ShuffleCleanup.liveShuffleIds(spark.sparkContext) -- before
      assert(leaked.size < singleCreated + 2,
        s"expected wave shuffles to be reclaimed eagerly: ${leaked.size} new " +
          s"live shuffles vs $singleCreated from the single-pass plan")
    } finally withSh.unpersist(false)
  }

  test("CosineLsh bucket arrays are per-row duplicate-free (emit-once invariant)") {
    // similarityJoin's emit-once pair production assumes a row's bucket
    // array has one DISTINCT key per table (the "t:code" namespace): a
    // duplicate key would make "first shared bucket" non-unique and
    // duplicate (a,b) output pairs with no downstream dedup to catch it.
    val emb = core.Storage.table(spark, sf, "embeddings")
    val b = emb.select(
      graft.ops.sim.CosineLsh.buckets(col("embedding").cast("array<double>"),
        bits = 8, dim = 64, tables = 4).as("bkts"))
    val offending = b.filter(size(array_distinct(col("bkts"))) =!= size(col("bkts")))
    assert(offending.count() == 0)
    // and the namespace prefix is actually present
    val prefixes = b.select(explode(col("bkts")).as("k"))
      .select(split(col("k"), ":").getItem(0).as("t")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(prefixes == Set("0", "1", "2", "3"))
  }

  test("MLlib collapse digest key keeps keep-first exact on clone clusters") {
    // the Window now partitions on md5(concat_ws(sep, sorted distinct
    // grams)) instead of the array itself; decisions must be unchanged:
    // permuted / repeated-gram variants of one doc still collapse to the
    // min-orderKey representative
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta"
    val permuted = "delta epsilon zeta alpha beta gamma alpha beta gamma"
    val rows = Seq((10L, base), (3L, base), (7L, permuted), (20L, "totally different words here now"))
      .toDF("doc_id", "text")
    val kept = graft.ops.dedup.MinHashLSHDeduplicateFilter(ngram = 3)(rows)
      .select("doc_id").as[Long].collect().toSet
    // base: grams of `permuted` = union over window positions; its
    // distinct 3-gram set differs from base's, so only exact clone
    // (10 vs 3) collapses by identity; near-dup pairs go through the join
    assert(kept.contains(3L) && !kept.contains(10L))
    assert(kept.contains(20L))
  }

  test("similarityJoin bits=0 auto-sizes buckets and floors at the default") {
    import graft.ops.sim.Similarity
    // the formula: constant-occupancy sizing with floor 8 / cap 24
    assert(Similarity.autoBits(1000) == 8)        // small corpus → floor
    assert(Similarity.autoBits(200000) == 8)      // ×100 scale → still 8
    assert(Similarity.autoBits(2000000) == 11)    // ×1000 → ceil(log2(1953))
    assert(Similarity.autoBits(2000000000L) == 21)
    assert(Similarity.autoBits(Long.MaxValue) == 24) // cap
    // below the floor, auto ≡ the bits=8 default: identical pair sets
    val emb = core.Storage.table(spark, sf, "embeddings")
    def pairs(bits: Int) =
      Similarity.similarityJoin(emb, "embedding", "vec_id", 0.4, bits = bits,
        tables = 16).select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(0) == pairs(8))
  }

  test("stream_dedup_horizon query matches its batch replay") {
    val q = SparkEntry.queries("stream_dedup_horizon")
    val got = q(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val events = core.Storage.table(spark, sf, "events")
    val ns = graft.streaming.Streaming.tsEpochNanos(events)
    val bounds = events.agg(min(ns), max(ns)).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val want = events.withColumn("__ns", ns)
      .select(expr(s"least((__ns - ${lo}L) * 3 div ${hi - lo + 1}L, 2L)").as("tier"),
        col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
