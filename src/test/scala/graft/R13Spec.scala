package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 pins.
  *
  * 1. Auto-knob job accounting: the r10-vs-r12 same-day A/B measured
  *    lshTopK's two eager gate jobs (auto-bits corpus count + broadcast
  *    gate query count, both added in r11) as the one REAL code
  *    regression inside the cross-round drift — 2 × the ~55 ms
  *    scheduling floor on every call at bench scale. The knobs stay
  *    (they are the 100 TB OOM guards); the pin is that they ride ONE
  *    job. Same contract for similarityJoin's auto path (r12 verdict
  *    #5): bits=0 + enumPartitions=0 must run exactly one ids-only
  *    count job feeding both knobs.
  */
class R13Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Jobs started inside `body`, attributed via an exclusive job group
    * (gate jobs run eagerly in the calling thread, so they inherit it).
    * The status store is fed asynchronously off the listener bus, so
    * poll until the count is stable. */
  private def jobsDuring(group: String)(body: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try body finally sc.clearJobGroup()
    var last = -1
    var cur = sc.statusTracker.getJobIdsForGroup(group).length
    var spins = 0
    while (cur != last && spins < 20) {
      last = cur; Thread.sleep(200)
      cur = sc.statusTracker.getJobIdsForGroup(group).length
      spins += 1
    }
    cur
  }

  /** One shared DataFrame: spark.read.parquet runs an eager
    * schema-inference job per CALL, which would otherwise be counted
    * by the probe. Reused, no further scan-infra jobs occur at plan
    * time. */
  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("lshTopK auto-bits + broadcast gate cost exactly one job") {
    import graft.ops.sim.Similarity
    // an exchange-free query side: a global limit would plant a shuffle
    // INSIDE the counted plan and AQE would materialize it as its own
    // stage job — a property of the caller's plan, not of the gate
    val queries = emb.where(col("vec_id") < 20)
    emb.schema // force any remaining scan infra outside the probe
    var df: DataFrame = null
    val n = jobsDuring("r13-lsh-gate") {
      df = Similarity.lshTopK(emb, queries, "embedding", "vec_id", k = 5)
    }
    assert(n == 1, s"expected exactly 1 gate job (combined count), saw $n")
    assert(df.count() > 0) // the plan the gate produced still runs
  }

  test("lshTopK explicit bits still gates the broadcast with one query-side job") {
    import graft.ops.sim.Similarity
    val queries = emb.where(col("vec_id") < 20)
    emb.schema
    val n = jobsDuring("r13-lsh-gate-explicit") {
      Similarity.lshTopK(emb, queries, "embedding", "vec_id", k = 5, bits = 8)
    }
    assert(n == 1, s"expected exactly 1 gate job (query side only), saw $n")
  }

  test("similarityJoin auto path costs exactly one count job for both knobs") {
    import graft.ops.sim.Similarity
    emb.schema
    val n = jobsDuring("r13-simjoin-gate") {
      Similarity.similarityJoin(emb, "embedding", "vec_id", 0.4)
    }
    assert(n == 1, s"expected exactly 1 ids-only count job, saw $n")
  }

  test("similarityJoin enumPartitions=-1 runs no job at plan time") {
    import graft.ops.sim.Similarity
    emb.schema
    val n = jobsDuring("r13-simjoin-inherit") {
      Similarity.similarityJoin(emb, "embedding", "vec_id", 0.4,
        bits = 8, enumPartitions = -1)
    }
    assert(n == 0, s"the documented no-count escape hatch ran $n job(s)")
  }

  test("combined gate count agrees with separate counts (empty query side included)") {
    import graft.ops.sim.Similarity
    // 0-row query side: the union carries no side=1 rows, the gate must
    // read that as qCount=0 (broadcast) and still produce a valid plan
    val out = Similarity.lshTopK(emb, emb.limit(0), "embedding", "vec_id", k = 3)
    assert(out.count() == 0)
  }
}
