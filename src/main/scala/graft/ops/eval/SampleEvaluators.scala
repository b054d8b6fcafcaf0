package graft.ops.eval

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.EvalOp
import graft.functions.text._

/** Sample-level evaluators — SURVEY §2.5. Score column(s) per row. */

/** Unique-n-gram ratio (`ngram_sample_evaluator.py:47-79`). */
final case class NgramSampleEvaluator(inputKey: String = "text", n: Int = 5,
    outputKey: String = "ngram_score") extends EvalOp {
  val name = "ngram_sample_evaluator"
  val inputKeys = Seq(inputKey)
  def scores: Seq[(String, Column)] =
    Seq(outputKey -> round(ngramUniqueRatio(col(inputKey), n), 6))
}

/** Lexical diversity: TTR / root-TTR plus the reference's full MTLD and
  * HD-D metrics (`lexical_diversity_sample_evaluator.py:13-90`).
  * MTLD: average of forward and backward factor counts at TTR threshold
  * 0.72; HD-D: hypergeometric contribution per type at sample size 42,
  * computed via the ratio-product form of C(N-42,c)/C(N,c) (same real
  * value as the reference's factorial quotients, numerically stable).
  * Reference gates: MTLD needs > 50 words, HD-D needs 50 < n < 1000 —
  * null outside. */
final case class LexicalDiversitySampleEvaluator(inputKey: String = "text")
    extends EvalOp {
  val name = "lexical_diversity_sample_evaluator"
  val inputKeys = Seq(inputKey)
  def scores: Seq[(String, Column)] = {
    val n = wordCount(col(inputKey)).cast("double")
    val u = uniqueWordCount(col(inputKey)).cast("double")
    Seq("ttr" -> round(u / n, 6), "rttr" -> round(u / sqrt(n), 6),
      "mtld" -> round(LexicalDiversity.mtldUdf(words(col(inputKey))), 6),
      "hdd" -> round(LexicalDiversity.hddUdf(words(col(inputKey))), 6))
  }
}

object LexicalDiversity {
  private val punct = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".toSet
  private def norm(t: String): String =
    t.filterNot(punct.contains).toLowerCase

  private def mtldCalc(ws: Array[String], thr: Double): Double = {
    var factors = 0.0
    var tokenCount = 0
    val types = scala.collection.mutable.HashSet.empty[String]
    var ttr = 1.0
    var i = 0
    while (i < ws.length) {
      tokenCount += 1
      types.add(ws(i))
      ttr = types.size.toDouble / tokenCount
      if (ttr <= thr) { factors += 1.0; tokenCount = 0; types.clear(); ttr = 1.0 }
      i += 1
    }
    factors += (1.0 - ttr) / (1.0 - thr)
    if (factors != 0) ws.length / factors else -1.0
  }

  val mtldUdf = udf { ws: Seq[String] =>
    if (ws == null || ws.length <= 50) None
    else {
      val n = ws.iterator.map(norm).toArray
      Some((mtldCalc(n, 0.72) + mtldCalc(n.reverse, 0.72)) / 2.0)
    }
  }

  val hddUdf = udf { ws: Seq[String] =>
    if (ws == null || ws.length <= 50 || ws.length >= 1000) None
    else {
      val toks = ws.iterator.map(norm).toArray
      val n = toks.length
      // first-appearance order — matches the SQL oracle's summation order
      val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      toks.foreach(t => counts.update(t, counts.getOrElse(t, 0) + 1))
      var s = 0.0
      counts.valuesIterator.foreach { c =>
        var prod = 1.0
        var i = 0
        while (i < c) { prod *= (n - 42.0 - i) / (n - i); i += 1 }
        s += (1.0 - prod) / 42.0
      }
      Some(s)
    }
  }
}

/** Token-level F1 vs ground truth with normalization
  * (`agenticrag_qaf1_sample_evaluator.py:56-103`): lowercase, strip
  * punctuation/articles, whitespace-tokenize; F1 = 2PR/(P+R) over token
  * multiset overlap (bag intersection). */
final case class QAF1SampleEvaluator(predKey: String, goldKey: String,
    outputKey: String = "f1") extends EvalOp {
  val name = "qa_f1_sample_evaluator"
  val inputKeys = Seq(predKey, goldKey)

  private def norm(c: Column): Column = {
    val lowered = lower(c)
    val noPunct = regexp_replace(lowered, "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]", " ")
    val noArticles = regexp_replace(noPunct, "\\b(a|an|the)\\b", " ")
    words(noArticles)
  }

  def scores: Seq[(String, Column)] = {
    val p = norm(col(predKey))
    val g = norm(col(goldKey))
    // bag-intersection size: sum over distinct shared tokens of
    // min(count_in_pred, count_in_gold)
    val shared = array_intersect(array_distinct(p), array_distinct(g))
    val overlap = aggregate(shared, lit(0),
      (acc, t) => acc + least(size(filter(p, x => x === t)), size(filter(g, x => x === t))))
    val prec = overlap.cast("double") / size(p).cast("double")
    val rec = overlap.cast("double") / size(g).cast("double")
    val f1 = when(size(p) === 0 || size(g) === 0 || overlap === 0, 0.0)
      .otherwise(round(lit(2.0) * prec * rec / (prec + rec), 6))
    Seq(outputKey -> f1)
  }
}

/** Smoothed sentence BLEU vs a reference column
  * (`bleu_sample_evaluator.py:9-71`, impl `bleu/bleu.py:59`): geometric
  * mean of modified n-gram precisions (n=1..4, +1 smoothing) × brevity
  * penalty. exp/ln in double — deterministic. */
final case class BleuSampleEvaluator(predKey: String, refKey: String,
    maxN: Int = 4, outputKey: String = "bleu") extends EvalOp {
  val name = "bleu_sample_evaluator"
  val inputKeys = Seq(predKey, refKey)

  private def precN(p: Column, r: Column, n: Int): Column = {
    val pg = wordNgrams(p, n)
    val rg = wordNgrams(r, n)
    val shared = array_intersect(array_distinct(pg), array_distinct(rg))
    val overlap = aggregate(shared, lit(0),
      (acc, t) => acc + least(size(filter(pg, x => x === t)), size(filter(rg, x => x === t))))
    // +1 smoothing on both sides
    (overlap + 1).cast("double") / (size(pg) + 1).cast("double")
  }

  def scores: Seq[(String, Column)] = {
    val p = col(predKey); val r = col(refKey)
    val logSum = (1 to maxN).map(n => log(precN(p, r, n))).reduce(_ + _)
    val geo = exp(logSum / maxN.toDouble)
    val bp = when(wordCount(p) >= wordCount(r), lit(1.0)).otherwise(
      exp(lit(1.0) - wordCount(r).cast("double") / wordCount(p).cast("double")))
    Seq(outputKey -> round(bp * geo, 6))
  }
}

/** Readability/textstat metrics struct — the langkit family
  * (`langkit_sample_evaluator.py:10-72`): char/word/sentence counts, mean
  * word length, automated readability index. */
final case class LangkitSampleEvaluator(inputKey: String = "text") extends EvalOp {
  val name = "langkit_sample_evaluator"
  val inputKeys = Seq(inputKey)
  def scores: Seq[(String, Column)] = {
    val t = col(inputKey)
    val chars = length(t).cast("double")
    val wordsN = wordCount(t).cast("double")
    val sentsN = greatest(sentenceCount(t), lit(1)).cast("double")
    Seq(
      "char_count" -> length(t).cast("long"),
      "word_count" -> wordCount(t).cast("long"),
      "sentence_count" -> sentenceCount(t).cast("long"),
      // raw doubles, like the reference's langkit metrics — decimal
      // rounding here would also be oracle-hostile: Java rounds the
      // shortest decimal repr while DuckDB scales by 1e6 first, and a
      // value one ulp under a half boundary rounds differently
      "mean_word_len" -> meanWordLength(t),
      // Automated Readability Index: 4.71*(chars/words)+0.5*(words/sents)-21.43
      "ari" -> (lit(4.71) * (chars / wordsN) + lit(0.5) * (wordsN / sentsN) - 21.43))
  }
}

/** PII entity count (`presidio_sample_evaluator.py:12-69`; regex rules). */
final case class PresidioSampleEvaluator(inputKey: String = "text",
    outputKey: String = "pii_count") extends EvalOp {
  val name = "presidio_sample_evaluator"
  val inputKeys = Seq(inputKey)
  def scores: Seq[(String, Column)] = {
    val t = col(inputKey)
    val emails = regexCount(t, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
    val phones = regexCount(t, "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}")
    val ssn = regexCount(t, "[0-9]{3}-[0-9]{2}-[0-9]{4}")
    Seq(outputKey -> (emails + phones + ssn).cast("long"))
  }
}
