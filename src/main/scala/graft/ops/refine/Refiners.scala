package graft.ops.refine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.RefineOp
import graft.ops.filter.Lexicons

/** Text refiners — SURVEY §2.4, reference
  * `dataflow/operators/general_text/refine/`. Each rewrites a text column
  * in place with a pure expression (`regexp_replace` chains — codegen'd,
  * narrow, no shuffle). Regexes avoid Java-only constructs so behavior is
  * reproducible on RE2-based oracles.
  */

/** Strip emoji codepoint ranges (`remove_emoji_refiner.py:10-82`). */
final case class RemoveEmojiRefiner(inputKey: String = "text") extends RefineOp {
  val name = "remove_emoji_refiner"
  def refined: Column = regexp_replace(col(inputKey),
    "[\\x{1F300}-\\x{1FAFF}\\x{2600}-\\x{27BF}\\x{FE0F}\\x{1F000}-\\x{1F02F}]", "")
}

/** Collapse runs of whitespace to one space and trim
  * (`remove_extra_spaces_refiner.py:9`). */
final case class RemoveExtraSpacesRefiner(inputKey: String = "text") extends RefineOp {
  val name = "remove_extra_spaces_refiner"
  def refined: Column = trim(regexp_replace(col(inputKey), "\\s+", " "))
}

/** Strip digits (`remove_number_refiner.py:8`). */
final case class RemoveNumberRefiner(inputKey: String = "text") extends RefineOp {
  val name = "remove_number_refiner"
  def refined: Column = regexp_replace(col(inputKey), "[0-9]", "")
}

/** Strip ASCII punctuation (`remove_punctuation_refiner.py:9`). */
final case class RemovePunctuationRefiner(inputKey: String = "text") extends RefineOp {
  val name = "remove_punctuation_refiner"
  def refined: Column =
    regexp_replace(col(inputKey), "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]", "")
}

/** Squeeze repeated punctuation: `!!!` → `!`
  * (`remove_repetitions_punctuation_refiner.py:10`). Chained per-char
  * replaces (no backreferences) so RE2-based oracles reproduce exactly. */
final case class RemoveRepetitionsPunctuationRefiner(inputKey: String = "text")
    extends RefineOp {
  val name = "remove_repetitions_punctuation_refiner"
  def refined: Column =
    RemoveRepetitionsPunctuationRefiner.punct.foldLeft(col(inputKey)) { (c, ch) =>
      regexp_replace(c, java.util.regex.Pattern.quote(ch.toString) + "{2,}", ch.toString)
    }
}
object RemoveRepetitionsPunctuationRefiner {
  val punct: Seq[Char] = "!\"#%&'()*+,-./:;<=>?@[]^_`{|}~".toSeq
}

/** Drop stopwords (`remove_stopwords_refiner.py:11`). */
final case class RemoveStopwordsRefiner(inputKey: String = "text",
    stopwords: Seq[String] = Lexicons.englishStopwords) extends RefineOp {
  val name = "remove_stopwords_refiner"
  def refined: Column = {
    val sw = array(stopwords.map(lit): _*)
    concat_ws(" ",
      filter(graft.functions.text.words(col(inputKey)),
        w => !array_contains(sw, lower(w))))
  }
}

/** Strip markdown/html image references (`remove_image_ref_refiner.py:9`). */
final case class RemoveImageRefsRefiner(inputKey: String = "text") extends RefineOp {
  val name = "remove_image_refs_refiner"
  def refined: Column = regexp_replace(
    regexp_replace(col(inputKey), "!\\[[^\\]]*\\]\\([^)]*\\)", ""),
    "<img[^>]*>", "")
}

/** Unescape the common HTML entities (`html_entity_refiner.py:9`). */
final case class HtmlEntityRefiner(inputKey: String = "text") extends RefineOp {
  val name = "html_entity_refiner"
  def refined: Column = {
    val repls = Seq("&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<",
      "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'")
    repls.foldLeft(col(inputKey)) { case (c, (from, to)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(from), to)
    }
  }
}

/** Strip URLs and HTML tags (`html_url_remover_refiner.py:9`). */
final case class HtmlUrlRemoverRefiner(inputKey: String = "text") extends RefineOp {
  val name = "html_url_remover_refiner"
  def refined: Column = regexp_replace(
    regexp_replace(col(inputKey), "https?://[^\\s]+", ""),
    "<[^>]+>", "")
}

/** Lowercase (`lowercase_refiner.py:9`). */
final case class LowercaseRefiner(inputKey: String = "text") extends RefineOp {
  val name = "lowercase_refiner"
  def refined: Column = lower(col(inputKey))
}

/** Expand English contractions via a broadcast-size dictionary
  * (`remove_contractions_refiner.py:9` uses the `contractions` lib; we
  * ship a fixed table applied as word-boundary replaces). */
final case class RemoveContractionsRefiner(inputKey: String = "text") extends RefineOp {
  val name = "remove_contractions_refiner"
  private val table = Seq(
    "can't" -> "cannot", "won't" -> "will not", "n't" -> " not",
    "'re" -> " are", "'ve" -> " have", "'ll" -> " will", "'m" -> " am",
    "it's" -> "it is", "let's" -> "let us")
  def refined: Column = table.foldLeft(col(inputKey)) { case (c, (from, to)) =>
    regexp_replace(c, java.util.regex.Pattern.quote(from), to)
  }
}

/** Strip citation markers like [1], [12,13] (`ref_removal_refiner.py:9`). */
final case class ReferenceRemoverRefiner(inputKey: String = "text") extends RefineOp {
  val name = "reference_remover_refiner"
  def refined: Column =
    regexp_replace(col(inputKey), "\\[[0-9]+(,\\s*[0-9]+)*\\]", "")
}

/** Normalize currency/date-ish text (`text_normalization_refiner.py:10`). */
final case class TextNormalizationRefiner(inputKey: String = "text") extends RefineOp {
  val name = "text_normalization_refiner"
  def refined: Column = {
    val c1 = regexp_replace(col(inputKey), "\\$\\s*([0-9]+(\\.[0-9]+)?)", "$1 dollars")
    regexp_replace(c1, "([0-9]{1,2})/([0-9]{1,2})/([0-9]{4})", "$3-$1-$2")
  }
}

/** Mask PII with regex rules (`pii_anonymize_refiner.py:12` uses presidio;
  * regex-rule masking here: emails, phones, SSN-ish). */
final case class PIIAnonymizeRefiner(inputKey: String = "text") extends RefineOp {
  val name = "pii_anonymize_refiner"
  def refined: Column = {
    val email = regexp_replace(col(inputKey),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val phone = regexp_replace(email,
      "\\+?[0-9]{1,3}[-. ]?\\(?[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}", "<PHONE>")
    regexp_replace(phone, "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>")
  }
}

/** Mask named-entity-ish tokens (`ner_refiner.py:46` uses spaCy; rule
  * degrade: mask capitalized multi-word spans mid-sentence). */
final case class NERRefiner(inputKey: String = "text") extends RefineOp {
  val name = "ner_refiner"
  def refined: Column =
    regexp_replace(col(inputKey),
      "([a-z],? )([A-Z][a-z]+( [A-Z][a-z]+)+)", "$1<ENTITY>")
}

/** Strip emoticons via a fixed dictionary (token-exact), the bounded
  * form of `remove_emoticons_refiner.py:9`'s ~5k-entry table. */
final case class RemoveEmoticonsRefiner(inputKey: String = "text") extends RefineOp {
  val name = "remove_emoticons_refiner"
  def refined: Column = {
    val emoticons = array(RemoveEmoticonsRefiner.table.map(lit): _*)
    concat_ws(" ",
      filter(graft.functions.text.words(col(inputKey)),
        w => !array_contains(emoticons, w)))
  }
}
object RemoveEmoticonsRefiner {
  val table: Seq[String] = Seq(":)", ":(", ":D", ":P", ";)", ":-)", ":-(",
    ":'(", ":o", ":O", "xD", "XD", "<3", ":|", ":/", ":\\", "=)", "=(",
    "^_^", "o_O", "-_-", "T_T")
}

/** Dictionary spelling correction — symspell degraded to a broadcast
  * correction table (`spelling_correction_refiner.py:12`). */
final case class SpellingCorrectionRefiner(inputKey: String = "text",
    corrections: Map[String, String] = SpellingCorrectionRefiner.defaults)
    extends RefineOp {
  val name = "spelling_correction_refiner"
  def refined: Column = {
    val keys = corrections.keys.toSeq.sorted
    val pairs = map(keys.flatMap(k => Seq(lit(k), lit(corrections(k)))): _*)
    concat_ws(" ",
      transform(graft.functions.text.words(col(inputKey)),
        w => coalesce(element_at(pairs, w), w)))
  }
}
object SpellingCorrectionRefiner {
  val defaults: Map[String, String] = Map(
    "teh" -> "the", "recieve" -> "receive", "seperate" -> "separate",
    "definately" -> "definitely", "occured" -> "occurred",
    "untill" -> "until", "wich" -> "which", "adress" -> "address")
}

/** Porter-stemmer lite: strip common English suffixes per word
  * (`stemming_lemmatization_refiner.py:10`; deterministic rule subset). */
final case class StemmingRefiner(inputKey: String = "text") extends RefineOp {
  val name = "stemming_refiner"
  def refined: Column = {
    val ws = graft.functions.text.words(col(inputKey))
    concat_ws(" ", transform(ws, w =>
      when(length(w) > 5 && w.endsWith("ing"), w.substr(lit(1), length(w) - 3))
        .when(length(w) > 4 && w.endsWith("ed"), w.substr(lit(1), length(w) - 2))
        .when(length(w) > 3 && w.endsWith("s") && !w.endsWith("ss"),
          w.substr(lit(1), length(w) - 1))
        .otherwise(w)))
  }
}
