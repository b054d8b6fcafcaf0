package graft.ops.sim

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed `Aggregator` over (score, id) pairs, ordered
  * by (score desc, id asc).
  *
  * Why not `Window row_number`: a window partition-by shuffles EVERY
  * scored row to its group's reducer before ranking — for ANN top-k
  * that's the full candidate set, O(n) shuffle rows. An aggregator gets
  * map-side partial aggregation (ObjectHashAggregate): each task reduces
  * its slice to ≤ k rows per group before the exchange, so the shuffle
  * is O(tasks × groups × k) regardless of corpus size — the difference
  * between "works" and "works at 100 TB" for brute-force scoring.
  *
  * The (score desc, id asc) comparison is a TOTAL order, so the selected
  * set and its ordering are unique — results are accumulation-order
  * independent and exactly reproducible against a SQL row_number oracle.
  */
object TopK {
  case class Scored(score: Double, id: Long)

  class TopKAggregator(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    /** buf invariant: sorted best-first, length ≤ k. */
    private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] =
      if (buf.length >= k && better(buf.last, x)) buf
      else {
        val (above, below) = buf.span(e => better(e, x))
        ((above :+ x) ++ below).take(k)
      }
    def zero: Seq[Scored] = Nil
    def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = insert(buf, x)
    def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)
    def finish(buf: Seq[Scored]): Seq[Scored] = buf
    def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** `groupBy(...).agg(TopK.column(k, score, id))` →
    * `array<struct<score,id>>` sorted best-first. */
  def column(k: Int, score: Column, id: Column): Column =
    udaf(new TopKAggregator(k), ExpressionEncoder[Scored]())(score, id)
}
