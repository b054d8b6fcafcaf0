package graft.ops.eval

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s — SURVEY §2.12's dataset-metric extension point:
  * streaming-friendly, partial-aggregatable (map-side combine), usable
  * in both `Dataset.select(agg.toColumn)` and SQL via
  * `spark.udf.register`. */
object Aggregators {

  /** Accuracy over (matched, valid) pairs — the BenchDatasetEvaluator
    * contract as a single mergeable aggregate. */
  case class AccBuf(total: Long, valid: Long, matched: Long)

  class AccuracyAggregator extends Aggregator[(Boolean, Boolean), AccBuf, Double] {
    def zero: AccBuf = AccBuf(0, 0, 0)
    def reduce(b: AccBuf, row: (Boolean, Boolean)): AccBuf = {
      val (matched, valid) = row
      AccBuf(b.total + 1, b.valid + (if (valid) 1 else 0),
        b.matched + (if (matched && valid) 1 else 0))
    }
    def merge(a: AccBuf, b: AccBuf): AccBuf =
      AccBuf(a.total + b.total, a.valid + b.valid, a.matched + b.matched)
    def finish(b: AccBuf): Double =
      if (b.total == 0) 0.0 else b.matched.toDouble / b.total.toDouble
    def bufferEncoder: Encoder[AccBuf] = Encoders.product[AccBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Welford-style streaming mean/variance of a double column. */
  case class MomBuf(n: Long, mean: Double, m2: Double)

  class MomentsAggregator extends Aggregator[Double, MomBuf, (Double, Double)] {
    def zero: MomBuf = MomBuf(0, 0.0, 0.0)
    def reduce(b: MomBuf, x: Double): MomBuf = {
      val n = b.n + 1
      val d = x - b.mean
      val mean = b.mean + d / n
      MomBuf(n, mean, b.m2 + d * (x - mean))
    }
    def merge(a: MomBuf, b: MomBuf): MomBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        MomBuf(n, a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    def finish(b: MomBuf): (Double, Double) =
      (b.mean, if (b.n < 2) 0.0 else b.m2 / (b.n - 1))
    def bufferEncoder: Encoder[MomBuf] = Encoders.product[MomBuf]
    def outputEncoder: Encoder[(Double, Double)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble)
  }
}
