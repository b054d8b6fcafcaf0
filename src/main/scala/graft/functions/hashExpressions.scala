package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Manual input-type validation — `ExpectsInputTypes.inputTypes` returns
  * the sql-private `AbstractDataType`, unavailable outside the spark.sql
  * package, so these expressions check types at analysis time themselves. */
private[functions] object HashExprChecks {
  def check(name: String, expected: Seq[DataType],
      actual: Seq[DataType]): TypeCheckResult =
    if (expected.zip(actual).forall { case (e, a) =>
        DataType.equalsStructurally(a, e, ignoreNullability = true) })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects (${expected.mkString(", ")}), got (${actual.mkString(", ")})")
}

/** SQL-callable wrappers over the shared [[kernels]] — registered into the
  * function registry by [[graft.GraftExtensions]] so `spark.sql` users can
  * compute the same fingerprints/bucket keys the dedup operators use:
  *
  *   SELECT simhash60(text)                        -- 60-bit fingerprint
  *   SELECT minhash_bands(text, 3, 128, 16)        -- LSH band keys
  *   SELECT cosine_lsh_buckets(embedding, 8, 64, 4) -- hyperplane buckets
  *
  * The kernels are imperative (a minhash signature is 128 modular
  * reductions per shingle — an expression TREE of that blows up codegen),
  * so these are CodegenFallback scalar calls: one virtual call per row,
  * same cost profile as the operators' internal UDFs, but visible to SQL
  * and free of UDF closure serialization. */
final case class SimHash60(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def prettyName: String = "simhash60"
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.check(prettyName, Seq(StringType), Seq(child.dataType))
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    kernels.simhash60(kernels.splitWords(s.toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_bands(text, ngram, numPerm, bands) → array<string> of LSH band
  * bucket keys; [] when the text has fewer than `ngram` words. */
final case class MinHashBands(text: Expression, ngram: Expression,
    numPerm: Expression, bands: Expression) extends Expression
    with CodegenFallback {
  override def prettyName: String = "minhash_bands"
  override def children: Seq[Expression] = Seq(text, ngram, numPerm, bands)
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.check(prettyName,
      Seq(StringType, IntegerType, IntegerType, IntegerType),
      children.map(_.dataType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    val n = ngram.eval(input)
    val np = numPerm.eval(input)
    val nb = bands.eval(input)
    if (t == null || n == null || np == null || nb == null) null
    else {
      val ws = kernels.splitWords(t.toString).toSeq
      val hs = kernels.shingleHashes(ws, n.asInstanceOf[Int])
      new GenericArrayData(
        kernels.minhashBandKeys(hs.toSeq, np.asInstanceOf[Int],
          nb.asInstanceOf[Int]).map(UTF8String.fromString(_): AnyRef))
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

/** cosine_lsh_buckets(vec, bits, dim, tables) → array<string> of
  * random-hyperplane sign-bucket keys, one per table ("t:code"). */
final case class CosineLshBuckets(vec: Expression, bits: Expression,
    dim: Expression, tables: Expression) extends Expression
    with CodegenFallback {
  override def prettyName: String = "cosine_lsh_buckets"
  override def children: Seq[Expression] = Seq(vec, bits, dim, tables)
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprChecks.check(prettyName,
      Seq(ArrayType(DoubleType), IntegerType, IntegerType, IntegerType),
      children.map(_.dataType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val b = bits.eval(input)
    val d = dim.eval(input)
    val tb = tables.eval(input)
    if (v == null || b == null || d == null || tb == null) null
    else {
      val arr = v.asInstanceOf[ArrayData].toDoubleArray()
      new GenericArrayData(
        kernels.lshBuckets(arr.toSeq, b.asInstanceOf[Int],
          d.asInstanceOf[Int], tb.asInstanceOf[Int])
          .map(UTF8String.fromString(_): AnyRef))
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

/** Column builders for the hash expressions (the operators call these;
  * SQL callers go through [[graft.GraftExtensions]]). */
object hashExpressions {
  def simhash60(text: Column): Column =
    SparkBridge.toColumn(SimHash60(SparkBridge.toExpression(text)))

  def minhashBands(text: Column, ngram: Int, numPerm: Int, bands: Int): Column =
    SparkBridge.toColumn(MinHashBands(SparkBridge.toExpression(text),
      Literal(ngram), Literal(numPerm), Literal(bands)))

  def lshBuckets(vec: Column, bits: Int, dim: Int, tables: Int): Column =
    SparkBridge.toColumn(CosineLshBuckets(
      SparkBridge.toExpression(vec.cast("array<double>")),
      Literal(bits), Literal(dim), Literal(tables)))
}
