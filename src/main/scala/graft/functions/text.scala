package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable text `Column` builders shared by filter/refine/eval operators.
  *
  * All stay in `org.apache.spark.sql.functions` (codegen'd, no UDFs) and
  * use regex constructs with identical semantics in Java regex and RE2 so
  * results are reproducible against ANSI-SQL oracles.
  */
object text {

  /** Non-empty whitespace-separated tokens. */
  def words(c: Column): Column =
    filter(split(c, "\\s+"), w => w =!= "")

  /** Whitespace-token count (reference `word_number_filter.py:44-63`). */
  def wordCount(c: Column): Column = size(words(c))

  /** Distinct-token count. */
  def uniqueWordCount(c: Column): Column = size(array_distinct(words(c)))

  /** Count of occurrences of a regex in the string. */
  def regexCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Count of a literal character via length-difference (codegen, no regex). */
  def charCount(c: Column, ch: String): Column =
    length(c) - length(translate(c, ch, ""))

  /** Sentence count: runs of `.!?` terminate sentences
    * (reference `rule_based_filter.py:66-105` splits on sentence punct). */
  def sentenceCount(c: Column): Column = regexCount(c, "[.!?]+")

  /** Lines of the text. */
  def lines(c: Column): Column = split(c, "\n")

  /** Mean word length = non-space chars / word count
    * (reference `rule_based_filter.py:828`). */
  def meanWordLength(c: Column): Column =
    length(regexp_replace(c, "\\s", "")).cast("double") /
      wordCount(c).cast("double")

  /** Ratio of words containing at least one ASCII letter
    * (reference `rule_based_filter.py:390`). */
  def alphaWordRatio(c: Column): Column =
    size(filter(words(c), w => w.rlike("[A-Za-z]"))).cast("double") /
      wordCount(c).cast("double")

  /** Ratio of ALL-CAPS words (reference `rule_based_filter.py:1066`). */
  def capitalWordRatio(c: Column): Column =
    size(filter(words(c), w => w === upper(w) && w =!= lower(w))).cast("double") /
      wordCount(c).cast("double")

  /** Unique-word ratio (reference `rule_based_filter.py:1228`). */
  def uniqueWordRatio(c: Column): Column =
    uniqueWordCount(c).cast("double") / wordCount(c).cast("double")

  /** Stopword ratio against a fixed lexicon
    * (reference `rule_based_filter.py:905` uses nltk stopwords;
    * we ship a deterministic builtin list). */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(words(lower(c)), w => array_contains(sw, w))).cast("double") /
      wordCount(c).cast("double")
  }

  /** Word-level n-grams of a text column as an array of space-joined
    * strings; [] when fewer than n words. */
  def wordNgrams(c: Column, n: Int): Column = {
    val ws = words(c)
    when(size(ws) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
  }

  /** Character n-grams (shingles) of the raw string. */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), length(c) - (n - 1)),
        i => c.substr(i, lit(n))))

  /** Unique-n-gram ratio, the reference's n-gram repetition score
    * (`general_text/eval/ngram_sample_evaluator.py:47-79`):
    * distinct n-grams / total n-grams (1.0 when no n-grams).
    * Imperative kernel — hashing the sliding windows beats building
    * n-gram strings via expressions ~10× (result is an int ratio, so the
    * UDF is still exactly SQL-oracle-reproducible). */
  def ngramUniqueRatio(c: Column, n: Int): Column = {
    val nn = n
    val f = udf { ws: Seq[String] =>
      if (ws == null || ws.length < nn) 1.0
      else {
        val total = ws.length - nn + 1
        val seen = new java.util.HashSet[String](total * 2)
        var i = 0
        while (i < total) {
          seen.add(ws.slice(i, i + nn).mkString(" ")); i += 1
        }
        seen.size.toDouble / total.toDouble
      }
    }
    f(words(c))
  }

  /** First 16 hex chars of md5 — the "hash prefix" dedup key family
    * (reference CCNet dedup keeps the first 64 bits of a digest,
    * `text_pt/filter/ccnet_deduplicate_filter.py:43-78`). */
  def hashPrefix64(c: Column): Column = substring(md5(c), 1, 16)

  /** 32-bit integer hash of a string: first 8 hex chars of md5, parsed.
    * Deterministic and portable (any SQL engine with md5 + hex parse). */
  def wordHash32(w: Column): Column =
    conv(substring(md5(w), 1, 8), 16, 10).cast("long")

  /** Polynomial rolling-hash document fingerprint over words:
    * fold(h = (h*31 + hash32(word)) mod 1e9+7). Deterministic, portable
    * to SQL via list_reduce, order-sensitive (a true fingerprint). */
  def docFingerprint(c: Column): Column =
    aggregate(transform(words(c), wordHash32(_)), lit(0L),
      (acc, h) => pmod(acc * 31 + h, lit(1000000007L)))
}
