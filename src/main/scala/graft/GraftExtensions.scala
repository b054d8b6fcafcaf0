package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point: registers graft's native
  * expressions into the SQL function registry so `spark.sql` queries can
  * use them directly, e.g. `SELECT cosine_sim(a, b) FROM t`.
  *
  * Wire up with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)        // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim(a, b) takes two arrays")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
