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
    val out = Bench.runQueries(spark, sf, queries).toMap
    assert(out("ok").error.isEmpty && out("ok").seconds >= 0)
    assert(out("boom").error.exists(_.contains("deliberately broken")))
    // a query that only fails when the plan RUNS must also be caught
    assert(out("lazy_boom").error.isDefined)
    val errors = out.count(_._2.error.isDefined)
    assert(errors == 2)
  }

  test("bench second-pass timing is reported (two passes per query)") {
    // a query with a side-effecting counter: both passes must execute
    R4Spec.passCounter.set(0)
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "counted" -> ((s, _) => { R4Spec.passCounter.incrementAndGet(); s.range(5).toDF("id") }))
    val out = Bench.runQueries(spark, sf, queries).toMap
    assert(out("counted").error.isEmpty)
    assert(R4Spec.passCounter.get() == 2)
  }
}

object R4Spec {
  val passCounter = new java.util.concurrent.atomic.AtomicInteger(0)
}
