package graft.ops.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.EvalOp
import graft.functions.text._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID, quality scoring, token counting, fingerprinting. All pure
  * `Column` expressions (codegen'd, narrow, no shuffle) — at 100 TB these
  * run at scan speed.
  */

/** N-gram/marker-word language-ID heuristic. Scores each candidate
  * language by its marker-word hit count over the token set; argmax wins,
  * ties break by language order ("und" when no markers hit). The
  * reference uses fastText (`language_filter.py:69`); a deterministic
  * lexicon heuristic keeps this hermetic and oracle-checkable. */
final case class LanguageIdEvaluator(inputKey: String = "text",
    outputKey: String = "lang_pred") extends EvalOp {
  val name = "language_id_evaluator"
  val inputKeys = Seq(inputKey)

  def scores: Seq[(String, Column)] =
    Seq(outputKey -> LanguageIdEvaluator.predict(col(inputKey)))
}
object LanguageIdEvaluator {
  /** Marker lexicons (top function words per language). */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "por", "con", "una"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour", "que", "qui"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "für"))

  /** The lang-id expression itself, reusable by any op that wants to
    * predict on raw text (e.g. [[graft.ops.filter.LanguageFilter]] in
    * fromText mode, matching the reference's predict-then-filter shape,
    * `language_filter.py:69`). */
  def predict(text: Column): Column = {
    val langs = markers.keys.toSeq.sorted
    val n = langs.length
    val lexica = langs.map(l => array(markers(l).map(lit): _*))
    // ONE pass over the token array accumulates per-language marker hits;
    // the finish lambda does the argmax over the n-slot count array with a
    // first-max (language-name-order) tie-break via inverted rank. The
    // tokenize/scan work appears exactly once in the expression tree — the
    // previous when-struct reduce repeated it per conditional branch,
    // which codegen cannot CSE (~30 splits/row, 5.5s for 5k rows at sf0.1).
    aggregate(
      words(lower(text)),
      array(langs.map(_ => lit(0)): _*),
      (acc, w) => array(langs.indices.map(i =>
        acc.getItem(i) + when(array_contains(lexica(i), w), 1).otherwise(0)): _*),
      counts => {
        val scored = array(langs.indices.map(i =>
          struct(counts.getItem(i).as("s"), lit(n - 1 - i).as("r"))): _*)
        val best = array_max(scored)
        when(best("s") > 0,
          element_at(array(langs.map(lit): _*), lit(n) - best("r")))
          .otherwise(lit("und"))
      })
  }
}

/** Composite quality score: length, punctuation-density, stopword-ratio
  * and repetition signals combined into [0,1] — the shape of the
  * reference's quality evaluators (`langkit_sample_evaluator.py:10-72`)
  * without external models. */
final case class QualityScoreEvaluator(inputKey: String = "text",
    outputKey: String = "quality_score") extends EvalOp {
  val name = "quality_score_evaluator"
  val inputKeys = Seq(inputKey)
  def scores: Seq[(String, Column)] = {
    val t = col(inputKey)
    val lenScore = least(wordCount(t).cast("double") / 100.0, lit(1.0))
    val uniq = uniqueWordRatio(t)
    val sw = stopwordRatio(t, graft.ops.filter.Lexicons.englishStopwords)
    val swScore = least(sw * 5.0, lit(1.0))
    Seq(outputKey -> round((lenScore + uniq + swScore) / 3.0, 6))
  }
}

/** Token counting: whitespace tokens plus a BPE-ish subword estimate
  * (ceil(chars/4) — the standard "~4 chars per token" heuristic). */
final case class TokenCountEvaluator(inputKey: String = "text") extends EvalOp {
  val name = "token_count_evaluator"
  val inputKeys = Seq(inputKey)
  def scores: Seq[(String, Column)] = Seq(
    "word_tokens" -> wordCount(col(inputKey)).cast("long"),
    "bpe_tokens" -> ceil(length(col(inputKey)).cast("double") / 4.0).cast("long"))
}

/** Order-sensitive rolling-hash document fingerprint (see
  * [[graft.functions.text.docFingerprint]]); equal fingerprints ⇒ equal
  * word sequences (mod collisions) — cheap pre-key for dedup/clustering. */
final case class FingerprintEvaluator(inputKey: String = "text",
    outputKey: String = "fingerprint") extends EvalOp {
  val name = "fingerprint_evaluator"
  val inputKeys = Seq(inputKey)
  def scores: Seq[(String, Column)] = Seq(outputKey -> docFingerprint(col(inputKey)))
}
