package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards added in round 5. */
class PlanSpec2 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("token chunker tokenizes each document exactly once in the plan") {
    val d = core.Storage.table(spark, sf, "documents")
    val plan = graft.ops.gen.ChunkSplitter("text", "doc_id",
      mode = "token", chunkSize = 20)(d)
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(plan).length
    // one split() for the materialized __ws column - an inner posexplode
    // used to infer a size()>0 filter that re-inlined the chunk transform
    // (and its tokenize) below the projections
    assert(splits == 1, s"expected exactly 1 split() in plan, found $splits:\n$plan")
  }

  test("chunker drops empty-document null rows and keeps real chunks") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = graft.ops.gen.ChunkSplitter("text", "doc_id",
      mode = "sentence")(df)
    val got = out.as[(Long, Int, String)].collect().toSet
    assert(got == Set((1L, 0, "a b c d")))
  }
}
