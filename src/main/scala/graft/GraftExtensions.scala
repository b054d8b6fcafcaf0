package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{CosineLshBuckets, CosineSimilarity, MinHashBands, SimHash60}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions into the SQL function registry so `spark.sql` queries can
  * use them directly:
  *
  *   SELECT cosine_sim(a, b)                        -- codegen'd cosine
  *   SELECT simhash60(text)                         -- 60-bit fingerprint
  *   SELECT minhash_bands(text, 3, 128, 16)         -- minhash LSH keys
  *   SELECT cosine_lsh_buckets(vec, 8, 64, 4)       -- hyperplane buckets
  *
  * The hash functions share one kernel with the dedup/similarity
  * operators ([[graft.functions.kernels]]), so SQL results are
  * bit-identical to the operators' internals.
  *
  * Wire up with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)        // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.arity

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      arity("cosine_sim", 2, cs => CosineSimilarity(
        Cast(cs.head, ArrayType(DoubleType)), Cast(cs(1), ArrayType(DoubleType))))))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      arity("simhash60", 1, cs => SimHash60(cs.head))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      arity("minhash_bands", 4,
        cs => MinHashBands(cs.head, cs(1), cs(2), cs(3)))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_lsh_buckets"),
      new ExpressionInfo(classOf[CosineLshBuckets].getName, "cosine_lsh_buckets"),
      arity("cosine_lsh_buckets", 4, cs => CosineLshBuckets(
        Cast(cs.head, ArrayType(DoubleType)), cs(1), cs(2), cs(3)))))
  }
}

object GraftExtensions {
  private def arity(name: String, n: Int,
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    cs => {
      require(cs.length == n, s"$name takes $n arguments, got ${cs.length}")
      build(cs)
    }

  /** Register the same functions into an EXISTING session (extensions are
    * otherwise bound at session build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      arity("cosine_sim", 2, cs => CosineSimilarity(
        Cast(cs.head, ArrayType(DoubleType)), Cast(cs(1), ArrayType(DoubleType)))), "built-in")
    reg.createOrReplaceTempFunction("simhash60",
      arity("simhash60", 1, cs => SimHash60(cs.head)), "built-in")
    reg.createOrReplaceTempFunction("minhash_bands",
      arity("minhash_bands", 4,
        cs => MinHashBands(cs.head, cs(1), cs(2), cs(3))), "built-in")
    reg.createOrReplaceTempFunction("cosine_lsh_buckets",
      arity("cosine_lsh_buckets", 4, cs => CosineLshBuckets(
        Cast(cs.head, ArrayType(DoubleType)), cs(1), cs(2), cs(3))), "built-in")
  }
}
