package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 regressions: the bench harness must be failure-honest (a
  * throwing query is reported as an error, never silently timed). */
class R4Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("bench records a deliberately-broken query as an error, not a time") {
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "ok" -> ((s, _) => s.range(10).toDF("id")),
      "boom" -> ((_, _) => throw new IllegalStateException("deliberately broken")),
      "lazy_boom" -> ((s, _) =>
        s.range(10).toDF("id").filter(
          udf((_: Long) => throw new IllegalStateException("fails at execution")).apply(col("id"))))
    )
    val out = Bench.runQueries(spark, sf, queries.toSeq).toMap
    assert(out("ok").error.isEmpty && out("ok").seconds >= 0)
    assert(out("boom").error.exists(_.contains("deliberately broken")))
    // a query that only fails when the plan RUNS must also be caught
    assert(out("lazy_boom").error.isDefined)
    val errors = out.count(_._2.error.isDefined)
    assert(errors == 2)
  }

  test("bench runs every pass (warmup + measured), per the passes knob") {
    // a query with a side-effecting counter: all passes must execute
    R4Spec.passCounter.set(0)
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "counted" -> ((s, _) => { R4Spec.passCounter.incrementAndGet(); s.range(5).toDF("id") }))
    val out = Bench.runQueries(spark, sf, queries.toSeq).toMap
    assert(out("counted").error.isEmpty)
    // default = 3 (1 discarded warmup + min of 2 measured), plus any
    // legitimate noise re-measures the harness performed. For this
    // microsecond query a retry additionally requires co-load to push
    // BOTH measured passes past the 100 ms floor (Bench's retry gate
    // needs times.min >= 0.1 s) — rare, but it did happen in CI, and
    // asserting a bare 3 made this test fail exactly when the retry
    // logic was doing its job
    assert(R4Spec.passCounter.get() == 3 + out("counted").retried)
    // the two measured passes yield a max/min noise ratio ≥ 1
    assert(out("counted").spread >= 1.0)
    R4Spec.passCounter.set(0)
    Bench.runQueries(spark, sf, queries.toSeq, passes = 2, isolate = false)
    assert(R4Spec.passCounter.get() == 2)
  }

  test("bench re-measures a query whose passes disagree >1.3x and keeps the min") {
    // Simulates a one-off co-load spike: the first measured pass is 4x
    // slower than every later pass. The harness must (a) retry, (b)
    // report the reproducible min, (c) certify the two best passes.
    R4Spec.passCounter.set(0)
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "noisy" -> ((s, _) => {
        val n = R4Spec.passCounter.incrementAndGet()
        Thread.sleep(n match { case 1 => 0L; case 2 => 600L; case _ => 150L })
        s.range(5).toDF("id")
      }))
    val out = Bench.runQueries(spark, sf, queries.toSeq).toMap
    val r = out("noisy")
    assert(r.error.isEmpty)
    assert(r.retried >= 1, "600ms vs 150ms disagreement must trigger a retry")
    assert(r.seconds < 0.5, "reported figure is the reproducible min, not the spike")
    assert(r.retried <= 2, "retries are bounded")
  }
}

object R4Spec {
  val passCounter = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Prompt-template registry: named resolution, per-op restriction, and
  * the DIY escape hatch — the reference's PROMPT_REGISTRY +
  * prompt_restrict contract (utils/registry.py:259, core/prompt.py:29). */
class PromptRegistrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.core.{PromptRegistry, PromptTemplate, Registry}

  Ops.registerAll()

  test("a named template resolves and drives the by-name prompted op") {
    val op = Registry.get("prompted_generator", Map(
      "prompt_template" -> "text2qa_question", "output_key" -> "gen"))
    val out = op(Seq(("hi", "en")).toDF("text", "lang"))
      .select("gen").as[String].head()
    // MockServing echoes system+prompt; the template's {lang}/{text}
    // placeholders must have been substituted
    assert(out.contains("Q(en): hi") && out.contains("QGEN"))
  }

  test("a restricted template is rejected with the allowed set named") {
    val e = intercept[IllegalArgumentException] {
      Registry.get("prompted_filter", Map("prompt_template" -> "text2qa_question"))
    }
    assert(e.getMessage.contains("prompted_filter"))
    assert(e.getMessage.contains("core_text_judge"))
  }

  test("an unknown template name fails loudly") {
    intercept[NoSuchElementException] {
      Registry.get("prompted_generator", Map("prompt_template" -> "nope"))
    }
  }

  test("a diy template passes any op's restriction") {
    PromptRegistry.register(
      PromptTemplate("my_diy", "{text}!", systemPrompt = "MINE", diy = true))
    val t = PromptRegistry.resolve("prompted_filter", "my_diy")
    assert(t.systemPrompt == "MINE")
  }

  test("unrestricted ops accept any registered template") {
    val t = PromptRegistry.resolve("some_future_op", "core_text_generate")
    assert(t.name == "core_text_generate")
  }
}
