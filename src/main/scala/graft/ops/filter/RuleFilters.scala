package graft.ops.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.FilterOp
import graft.functions.text._

/** Rule-based filters — SURVEY §2.2, reference
  * `dataflow/operators/general_text/filter/rule_based_filter.py` et al.
  * Each computes a per-row metric as a pure `Column` expression (codegen'd,
  * scan-pushdown-friendly; no shuffle — all narrow transforms that scale
  * linearly with partitions) and keeps passing rows.
  */

/** min ≤ #whitespace-tokens < max (`word_number_filter.py:44-63`). */
final case class WordNumberFilter(inputKey: String = "text",
    minWords: Int = 20, maxWords: Int = 100000) extends FilterOp {
  val name = "word_number_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val n = wordCount(col(inputKey))
    n >= minWords && n < maxWords
  }
}

/** Text must not end with ':' (`rule_based_filter.py:12-47`). */
final case class ColonEndFilter(inputKey: String = "text") extends FilterOp {
  val name = "colon_end_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = !rtrim(col(inputKey)).endsWith(":")
}

/** Sentence count in [min,max] (`rule_based_filter.py:66-105`). */
final case class SentenceNumberFilter(inputKey: String = "text",
    minSentences: Int = 1, maxSentences: Int = 1000) extends FilterOp {
  val name = "sentence_number_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val n = sentenceCount(col(inputKey))
    n >= minSentences && n <= maxSentences
  }
}

/** Ratio of lines ending with ellipsis below threshold
  * (`rule_based_filter.py:185-221`). */
final case class LineEndWithEllipsisFilter(inputKey: String = "text",
    maxRatio: Double = 0.3) extends FilterOp {
  val name = "line_end_ellipsis_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val ls = lines(col(inputKey))
    val ell = size(filter(ls, l => rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
    ell.cast("double") / size(ls).cast("double") <= maxRatio
  }
}

/** Non-null, non-blank content (`rule_based_filter.py:256`). */
final case class ContentNullFilter(inputKey: String = "text") extends FilterOp {
  val name = "content_null_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = col(inputKey).isNotNull && trim(col(inputKey)) =!= ""
}

/** Symbol-to-word ratio ≤ threshold; symbols = # … ("hash/ellipsis noise",
  * `rule_based_filter.py:316`). */
final case class SymbolWordRatioFilter(inputKey: String = "text",
    maxRatio: Double = 0.4) extends FilterOp {
  val name = "symbol_word_ratio_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val symbols = charCount(col(inputKey), "#") + regexCount(col(inputKey), "\\.\\.\\.|…")
    symbols.cast("double") / wordCount(col(inputKey)).cast("double") <= maxRatio
  }
}

/** Ratio of words containing an ASCII letter ≥ threshold
  * (`rule_based_filter.py:390`). */
final case class AlphaWordsFilter(inputKey: String = "text",
    minRatio: Double = 0.6) extends FilterOp {
  val name = "alpha_words_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = alphaWordRatio(col(inputKey)) >= minRatio
}

/** No HTML entities (`rule_based_filter.py:476`). */
final case class HtmlEntityFilter(inputKey: String = "text") extends FilterOp {
  val name = "html_entity_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column =
    !col(inputKey).rlike("&(nbsp|lt|gt|amp|quot|apos|hellip|ndash|mdash|lsquo|rsquo|ldquo|rdquo);")
}

/** No ID-card-like PII patterns (`rule_based_filter.py:549`). */
final case class IDCardFilter(inputKey: String = "text") extends FilterOp {
  val name = "id_card_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column =
    !lower(col(inputKey)).rlike("(id number|id card|idcard|identification number)") &&
      !col(inputKey).rlike("[0-9]{17}[0-9Xx]")
}

/** Longest punctuation-free run of words ≤ threshold
  * (`rule_based_filter.py:616` NoPuncFilter). Implemented as: the max
  * word-count among segments split on sentence punctuation. */
final case class NoPuncFilter(inputKey: String = "text",
    maxRunWords: Int = 56) extends FilterOp {
  val name = "no_punc_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val segs = split(col(inputKey), "[.!?,;:]")
    val maxRun = array_max(transform(segs, s => wordCount(s)))
    maxRun.isNull || maxRun <= maxRunWords
  }
}

/** No special-character noise (`rule_based_filter.py:692`). */
final case class SpecialCharacterFilter(inputKey: String = "text") extends FilterOp {
  val name = "special_character_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column =
    !col(inputKey).rlike("[\\x{00A0}\\x{FEFF}\\x{2424}\\x{3000}\\x{FFFD}]|\\{\\{|\\}\\}|&#[0-9]+;")
}

/** No watermark phrases (`rule_based_filter.py:763`). */
final case class WatermarkFilter(inputKey: String = "text",
    watermarks: Seq[String] = Seq("watermark", "copyright", "all rights reserved"))
    extends FilterOp {
  val name = "watermark_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column =
    !lower(col(inputKey)).rlike(watermarks.map(java.util.regex.Pattern.quote).mkString("|"))
}

/** Mean word length in [min,max] (`rule_based_filter.py:828`). */
final case class MeanWordLengthFilter(inputKey: String = "text",
    minLen: Double = 3.0, maxLen: Double = 10.0) extends FilterOp {
  val name = "mean_word_length_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val m = meanWordLength(col(inputKey))
    m >= minLen && m <= maxLen
  }
}

/** Stopword ratio > threshold keeps the row — natural prose has stopwords
  * (`rule_based_filter.py:905`). */
final case class StopWordFilter(inputKey: String = "text",
    minRatio: Double = 0.06,
    stopwords: Seq[String] = Lexicons.englishStopwords) extends FilterOp {
  val name = "stop_word_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = stopwordRatio(col(inputKey), stopwords) > minRatio
}

/** Curly-bracket density ≤ threshold (`rule_based_filter.py:1000`). */
final case class CurlyBracketFilter(inputKey: String = "text",
    maxRatio: Double = 0.025) extends FilterOp {
  val name = "curly_bracket_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column =
    charCount(col(inputKey), "{}").cast("double") /
      length(col(inputKey)).cast("double") <= maxRatio
}

/** ALL-CAPS word ratio ≤ threshold (`rule_based_filter.py:1066`). */
final case class CapitalWordsFilter(inputKey: String = "text",
    maxRatio: Double = 0.2) extends FilterOp {
  val name = "capital_words_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = capitalWordRatio(col(inputKey)) <= maxRatio
}

/** "lorem ipsum" density ≤ threshold (`rule_based_filter.py:1158`). */
final case class LoremIpsumFilter(inputKey: String = "text",
    maxRatio: Double = 3e-8) extends FilterOp {
  val name = "lorem_ipsum_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column =
    regexCount(lower(col(inputKey)), "lorem ipsum").cast("double") /
      length(col(inputKey)).cast("double") <= maxRatio
}

/** Unique-word ratio ≥ threshold (`rule_based_filter.py:1228`). */
final case class UniqueWordsFilter(inputKey: String = "text",
    minRatio: Double = 0.1) extends FilterOp {
  val name = "unique_words_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = uniqueWordRatio(col(inputKey)) >= minRatio
}

/** Character count ≥ threshold (`rule_based_filter.py:1302`). */
final case class CharNumberFilter(inputKey: String = "text",
    minChars: Int = 100) extends FilterOp {
  val name = "char_number_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = length(col(inputKey)) >= minChars
}

/** Bullet-point-start line ratio ≤ threshold (`rule_based_filter.py:1371`). */
final case class LineStartWithBulletpointFilter(inputKey: String = "text",
    maxRatio: Double = 0.9) extends FilterOp {
  val name = "line_bullet_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val ls = lines(col(inputKey))
    val bullets = size(filter(ls, l => ltrim(l).rlike("^([*\\-•‣▶►]|[0-9]+[.)])")))
    bullets.cast("double") / size(ls).cast("double") <= maxRatio
  }
}

/** Lines containing "javascript" ratio ≤ threshold
  * (`rule_based_filter.py:1448`). */
final case class LineWithJavascriptFilter(inputKey: String = "text",
    maxLines: Int = 3) extends FilterOp {
  val name = "line_javascript_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column =
    size(filter(lines(col(inputKey)), l => lower(l).contains("javascript"))) <= maxLines
}

/** Blocklisted-token count < threshold
  * (`general_text/filter/blocklist_filter.py:13-76`). Token-exact match
  * against a broadcast-size lexicon. */
final case class BlocklistFilter(inputKey: String = "text",
    blocklist: Seq[String], maxHits: Int = 1) extends FilterOp {
  val name = "blocklist_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val bl = array(blocklist.map(w => lit(w.toLowerCase)): _*)
    size(filter(words(lower(col(inputKey))), w => array_contains(bl, w))) < maxHits
  }
}

/** N-gram uniqueness score in [min,max]
  * (`general_text/filter/ngram_filter.py:9-45`). */
final case class NgramFilter(inputKey: String = "text", n: Int = 5,
    minScore: Double = 0.0, maxScore: Double = 1.0) extends FilterOp {
  val name = "ngram_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val s = ngramUniqueRatio(col(inputKey), n)
    s >= minScore && s <= maxScore
  }
}

/** Language allow-list (`general_text/filter/language_filter.py:11-69`).
  * Two modes, mirroring the reference's predict-then-filter: with
  * `fromText = true` the input column is raw text and the fused
  * [[graft.ops.text.LanguageIdEvaluator]] heuristic predicts the language
  * inline (fastText there, the marker-lexicon heuristic here); the
  * default mode predicates on a precomputed language-id column. */
final case class LanguageFilter(inputKey: String = "lang",
    allowed: Seq[String] = Seq("en"), fromText: Boolean = false) extends FilterOp {
  val name = "language_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val lang =
      if (fromText) graft.ops.text.LanguageIdEvaluator.predict(col(inputKey))
      else col(inputKey)
    lang.isin(allowed: _*)
  }
}

/** Lexical diversity (type-token ratio) in range
  * (`general_text/filter/lexical_diversity_filter.py:10-48`). */
final case class LexicalDiversityFilter(inputKey: String = "text",
    minTtr: Double = 0.0, maxTtr: Double = 1.0) extends FilterOp {
  val name = "lexical_diversity_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val ttr = uniqueWordRatio(col(inputKey))
    ttr >= minTtr && ttr <= maxTtr
  }
}

/** PII entity count below threshold — the PresidioFilter shape
  * (`general_text/filter/presidio_filter.py:9`): score with the PII
  * evaluator rules, threshold here. */
final case class PresidioFilter(inputKey: String = "text",
    maxEntities: Int = 0) extends FilterOp {
  val name = "presidio_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = {
    val t = col(inputKey)
    val n = regexCount(t, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") +
      regexCount(t, "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}") +
      regexCount(t, "[0-9]{3}-[0-9]{2}-[0-9]{4}")
    n <= maxEntities
  }
}

/** Keep rows whose composed task's sub-tasks are all runnable
  * (`conversations/filter/composition_task_filter.py:17-61`): every
  * element of the sub-task array must be in the runnable set. */
final case class CompositionTaskFilter(subTasksKey: String = "sub_tasks",
    runnable: Seq[String]) extends FilterOp {
  val name = "composition_task_filter"
  val inputKeys = Seq(subTasksKey)
  def predicate: Column = {
    val allowed = array(runnable.map(lit): _*)
    forall(col(subTasksKey), t => array_contains(allowed, t))
  }
}

/** The reference's GeneralFilter takes user lambdas `df → bool`
  * (`core_text/filter/general_filter.py:8-76`); the Spark-native analogue
  * accepts arbitrary `Column` predicates directly. */
final case class GeneralFilter(predicates: Seq[Column], keys: Seq[String])
    extends FilterOp {
  val name = "general_filter"
  val inputKeys = keys
  def predicate: Column = predicates.reduce(_ && _)
}

/** Deterministic builtin lexicons (reference pulls nltk/fastText at
  * runtime; we ship fixed lists for hermetic, reproducible runs). */
object Lexicons {
  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "but", "if", "then", "else", "of", "at",
    "by", "for", "with", "about", "to", "from", "in", "on", "is", "are",
    "was", "were", "be", "been", "being", "it", "its", "this", "that",
    "these", "those", "as", "not", "no", "so", "too", "very", "can",
    "will", "just", "do", "does", "did", "have", "has", "had", "he",
    "she", "they", "we", "you", "i", "his", "her", "their", "our", "your")
}

/** Langkit-metric threshold filter (`general_text/filter/langkit_filter.py`):
  * bound the cheap readability stats (chars, words, sentences) the
  * langkit evaluator computes — rows outside any band drop. */
final case class LangkitFilter(inputKey: String = "text",
    minChars: Int = 1, maxChars: Int = 1000000,
    minWords: Int = 1, maxWords: Int = 100000,
    minSentences: Int = 0, maxSentences: Int = 100000) extends FilterOp {
  val name = "langkit_filter"
  val inputKeys = Seq(inputKey)
  def predicate: org.apache.spark.sql.Column = {
    import graft.functions.text._
    length(col(inputKey)).between(minChars, maxChars) &&
      wordCount(col(inputKey)).between(minWords, maxWords) &&
      sentenceCount(col(inputKey)).between(minSentences, maxSentences)
  }
}
