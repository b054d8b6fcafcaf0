package graft.ops.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vendi score — effective diversity of a sample
  * (`general_text/eval/vendi_dataset_evaluator.py:11-54`): exp of the
  * von Neumann entropy of the normalized cosine-similarity kernel's
  * eigenvalues. Spectrum of an n×n kernel is inherently driver-side;
  * the sample is capped (the reference collects embeddings the same
  * way). Jacobi eigensolver — no linear-algebra dependency.
  */
object Vendi {

  def score(df: DataFrame, embKey: String, cap: Int = 128): Double = {
    val vecs = df.select(col(embKey).cast("array<double>")).limit(cap)
      .collect().map(_.getSeq[Double](0).toArray)
    if (vecs.isEmpty) return 0.0
    val eig = jacobiEigenvalues(kernel(vecs))
    // von Neumann entropy over positive eigenvalues
    val h = eig.filter(_ > 1e-12).map(l => -l * math.log(l)).sum
    math.exp(h)
  }

  /** Normalized cosine kernel K/n. Exposed for the `agg_vendi_gram`
    * seam oracle: entry (i,j) is BIT-IDENTICAL to the codegen'd
    * [[graft.ops.sim.Similarity.cosine]] expression divided by n —
    * both accumulate dot and squared norms in one ascending pass and
    * divide by the product of the square roots, so the gram matrix a
    * DuckDB left-fold oracle replays is exactly the matrix the Jacobi
    * sweep consumes (the eigen spectrum itself stays non-replayable;
    * R13Spec pins Jacobi against an independent eigensolver). */
  private[graft] def kernel(vecs: Array[Array[Double]]): Array[Array[Double]] = {
    val n = vecs.length
    val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
    Array.tabulate(n, n) { (i, j) =>
      val dot = vecs(i).lazyZip(vecs(j)).map(_ * _).sum
      dot / (norms(i) * norms(j)) / n
    }
  }

  /** Cyclic Jacobi for a symmetric matrix; returns eigenvalues. */
  private[graft] def jacobiEigenvalues(m: Array[Array[Double]],
      sweeps: Int = 30, tol: Double = 1e-10): Array[Double] = {
    val n = m.length
    val a = m.map(_.clone())
    var sweep = 0
    var off = offDiag(a)
    while (sweep < sweeps && off > tol) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
            val sign = if (theta >= 0) 1.0 else -1.0 // sign(0) must be 1 (45°)
            val t = sign / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    Array.tabulate(n)(i => a(i)(i))
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}
