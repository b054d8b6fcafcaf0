package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Storage

/** Plan-quality assertions: the 100 TB story is only real if the plans
  * hold — pruned scans, pushed filters, broadcast dims, bucketed joins
  * without exchanges.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def physicalPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1 scan prunes to the four needed columns") {
    val plan = physicalPlan("q1_pricing")
    assert(plan.contains("l_returnflag"))
    assert(!plan.contains("l_shipdate"), "unused column not pruned from scan")
  }

  test("q3/q5 broadcast every dimension side") {
    Seq("q3_revenue_by_customer", "q5_region_revenue").foreach { q =>
      val plan = physicalPlan(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q: no broadcast join")
      assert(!plan.contains("SortMergeJoin"), s"$q: dim join fell back to SMJ")
    }
  }

  test("language filter pushes the IN predicate to the parquet scan") {
    val plan = physicalPlan("filter_language")
    assert(plan.contains("PushedFilters: [") &&
      (plan.contains("In(lang") || plan.contains("EqualTo(lang")),
      s"lang predicate not pushed:\n${plan.take(800)}")
  }

  test("exact dedup is a single shuffle") {
    // other suites cache the same dedup result; a cache hit would splice
    // an InMemoryRelation (with its own captured Exchange) into the plan
    spark.sharedState.cacheManager.clearCache()
    val plan = physicalPlan("dedup_hash")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges")
  }

  test("narrow text ops have no shuffle at all") {
    Seq("refine_lowercase", "filter_word_number", "eval_langkit").foreach { q =>
      val plan = physicalPlan(q)
      assert(!plan.contains("Exchange"), s"$q shuffles unexpectedly")
    }
  }

  test("model-scored filters and LLM maps stay narrow") {
    Seq("filter_pt_fineweb_edu", "filter_sft_rm", "eval_pt_model_score",
      "mm_vqa", "gen_question_fusion").foreach { q =>
      val plan = physicalPlan(q)
      assert(!plan.contains("Exchange"), s"$q shuffles unexpectedly")
    }
  }

  test("join_bucketed query plan is exchange-free end to end") {
    val plan = physicalPlan("join_bucketed")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join/groupBy still shuffles:\n${plan.take(1200)}")
  }

  test("bucketed tables join without any exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val s2 = spark // same session; tables land in its warehouse
    val li = Storage.table(s2, sf, "lineitem")
    val o = Storage.table(s2, sf, "orders")
    graft.core.Partitioning.writeBucketed(
      li.select("l_orderkey", "l_quantity"), "li_b", "l_orderkey", 8)
    graft.core.Partitioning.writeBucketed(
      o.select("o_orderkey", "o_totalprice").withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_b", "l_orderkey", 8)
    try {
      val joined = s2.table("li_b").join(s2.table("o_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() > 0)
    } finally {
      s2.sql("DROP TABLE IF EXISTS li_b")
      s2.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
