package graft.ops.filter

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Op
import graft.serving.{LLMMap, Scorer}

/** Model-scored filter families (PT + SFT) — SURVEY §2.2.
  *
  * The reference's pretrain/SFT quality filters are all the same shape:
  * score every row with a model, keep rows with min ≤ score ≤ max
  * (`text_pt/filter/fineweb_edu_filter.py:52-57`,
  * `text_sft/filter/alpagasus_filter.py:40-52`). The model itself sits
  * behind the [[graft.serving.Scorer]] seam; each named op carries its
  * reference defaults so a pipeline declared against the reference's
  * operator names behaves identically. The scoring pass is ONE narrow
  * `mapPartitions` (no shuffle); the threshold filter is a plain Column
  * predicate on the appended score.
  */
abstract class ScoredFilter extends Op {
  def inputKey: String
  def scorer: Scorer
  def minScore: Double
  def maxScore: Double
  def scoreKey: String
  val inputKeys = Seq(inputKey)
  val outputKeys = Seq(scoreKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.scored(df, inputKey, scoreKey, scorer)
      .filter(col(scoreKey) >= minScore && col(scoreKey) <= maxScore)
}

/** FineWeb-Edu educational-value classifier filter
  * (`text_pt/filter/fineweb_edu_filter.py:9`: min 2.5, max 10000). */
final case class FineWebEduFilter(inputKey: String, scorer: Scorer,
    minScore: Double = 2.5, maxScore: Double = 10000,
    scoreKey: String = "fineweb_edu_score") extends ScoredFilter {
  val name = "fineweb_edu_filter"
}

/** Perplexity filter (`text_pt/filter/perplexity_filter.py:10`: keep
  * 10 ≤ ppl ≤ 500 — too-predictable and too-random text both dropped). */
final case class PerplexityFilter(inputKey: String, scorer: Scorer,
    minScore: Double = 10.0, maxScore: Double = 500.0,
    scoreKey: String = "perplexity") extends ScoredFilter {
  val name = "perplexity_filter"
}

/** Qurating quality-rater filter on one of its four axes
  * (`text_pt/filter/qurating_filter.py:11`: per-dimension 0..9 bounds;
  * writing_style / required_expertise / facts_and_trivia /
  * educational_value). */
final case class QuratingFilter(inputKey: String, scorer: Scorer,
    dimension: String = "educational_value", minScore: Double = 0,
    maxScore: Double = 9, scoreKey: String = "qurating_score")
    extends ScoredFilter {
  val name = "qurating_filter"
}

/** Pair-Qual bilingual quality filter
  * (`text_pt/filter/pair_qual_filter.py:10`: min 0, max 10000). */
final case class PairQualFilter(inputKey: String, scorer: Scorer,
    minScore: Double = 0, maxScore: Double = 10000,
    scoreKey: String = "pair_qual_score") extends ScoredFilter {
  val name = "pair_qual_filter"
}

/** Textbook-quality classifier filter
  * (`text_pt/filter/text_book_filter.py:10`: keep P(textbook) ≥ 0.99). */
final case class TextbookFilter(inputKey: String, scorer: Scorer,
    minScore: Double = 0.99, maxScore: Double = 1.0,
    scoreKey: String = "textbook_score") extends ScoredFilter {
  val name = "textbook_filter"
}

/** DebertaV3 quality-label filter
  * (`text_pt/filter/debertav3_filter.py:11`: allowed labels Medium/High).
  * Label-valued model → the scorer maps labels to ordinals (Low=0,
  * Medium=1, High=2); allowed set becomes a min bound. */
final case class DebertaV3Filter(inputKey: String, scorer: Scorer,
    minScore: Double = 1.0, maxScore: Double = 2.0,
    scoreKey: String = "debertav3_quality") extends ScoredFilter {
  val name = "debertav3_filter"
}

/** Alpagasus LLM-judged instruction-quality filter
  * (`text_sft/filter/alpagasus_filter.py:11`: score 0-5, keep 3..5). */
final case class AlpagasusFilter(inputKey: String, scorer: Scorer,
    minScore: Double = 3, maxScore: Double = 5,
    scoreKey: String = "alpagasus_score") extends ScoredFilter {
  val name = "alpagasus_filter"
}

/** Deita instruction-complexity filter
  * (`text_sft/filter/deita_complexity_filter.py:10`: keep 3..5). */
final case class DeitaComplexityFilter(inputKey: String, scorer: Scorer,
    minScore: Double = 3.0, maxScore: Double = 5.0,
    scoreKey: String = "deita_complexity") extends ScoredFilter {
  val name = "deita_complexity_filter"
}

/** Deita response-quality filter
  * (`text_sft/filter/deita_quality_filter.py:10`: keep ≥ 2.5). */
final case class DeitaQualityFilter(inputKey: String, scorer: Scorer,
    minScore: Double = 2.5, maxScore: Double = 10000.0,
    scoreKey: String = "deita_quality") extends ScoredFilter {
  val name = "deita_quality_filter"
}

/** Instag instruction-tag-complexity filter
  * (`text_sft/filter/instag_filter.py:11`: normalized 0..1). */
final case class InstagFilter(inputKey: String, scorer: Scorer,
    minScore: Double = 0.0, maxScore: Double = 1.0,
    scoreKey: String = "instag_score") extends ScoredFilter {
  val name = "instag_filter"
}

/** Reward-model preference filter
  * (`text_sft/filter/rm_filter.py:11`: keep 0.2 ≤ reward ≤ 0.8). */
final case class RMFilter(inputKey: String, scorer: Scorer,
    minScore: Double = 0.2, maxScore: Double = 0.8,
    scoreKey: String = "rm_score") extends ScoredFilter {
  val name = "rm_filter"
}

/** Superfiltering IFD-ratio filter
  * (`text_sft/filter/superfiltering_filter.py:11`: keep 0..1). */
final case class SuperfilteringFilter(inputKey: String, scorer: Scorer,
    minScore: Double = 0.0, maxScore: Double = 1.0,
    scoreKey: String = "superfiltering_score") extends ScoredFilter {
  val name = "superfiltering_filter"
}

/** Tree-Instruct syntax-complexity filter
  * (`text_sft/filter/treeinstruct_filter.py:11`: keep node count ≥ 7). */
final case class TreeinstructFilter(inputKey: String, scorer: Scorer,
    minScore: Double = 7, maxScore: Double = 100,
    scoreKey: String = "treeinstruct_score") extends ScoredFilter {
  val name = "treeinstruct_filter"
}

/** Score-only twin of the filter family — the PT sample evaluators
  * (`text_pt/eval/fineweb_edu_sample_evaluator.py`,
  * `perplexity_sample_evaluator.py:10`, `qurating_sample_evaluator.py`,
  * `debertav3_sample_evaluator.py`, `pair_qual_sample_evaluator.py`,
  * `textbook_sample_evaluator.py`, `meta_sample_evaluator.py`): append
  * the model score, keep every row. */
final case class ModelScoreEvaluator(inputKey: String, scorer: Scorer,
    scoreKey: String, evaluatorName: String = "model_score_evaluator")
    extends Op {
  val name = evaluatorName
  val inputKeys = Seq(inputKey)
  val outputKeys = Seq(scoreKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.scored(df, inputKey, scoreKey, scorer)
}

/** Qurating multi-axis quality rater (`text_pt/eval/qurating_sample_evaluator.py`):
  * one score column per dimension (writing_style, required_expertise,
  * facts_and_trivia, educational_value), each a narrow scored pass
  * through the Scorer seam. */
final case class QuratingSampleEvaluator(inputKey: String,
    serving: graft.serving.ServingClient,
    dimensions: Seq[String] = Seq("writing_style", "required_expertise",
      "facts_and_trivia", "educational_value")) extends Op {
  val name = "qurating_sample_evaluator"
  val inputKeys = Seq(inputKey)
  val outputKeys = dimensions.map(d => s"qurating_$d")
  def apply(df: DataFrame): DataFrame =
    dimensions.foldLeft(df) { (d, dim) =>
      LLMMap.scored(d, inputKey, s"qurating_$dim",
        graft.serving.ServingScorer(serving, dimension = dim))
    }
}

/** LLM quality score of a generated QA pair
  * (`core_text/eval/text2qa_sample_evaluator.py`). */
final case class Text2QASampleEvaluator(questionKey: String,
    answerKey: String, scorer: Scorer,
    outputKey: String = "qa_score") extends Op {
  val name = "text2qa_sample_evaluator"
  val inputKeys = Seq(questionKey, answerKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame = {
    val p = df.withColumn("__p",
      concat(col(questionKey), lit(" <A> "), col(answerKey)))
    LLMMap.scored(p, "__p", outputKey, scorer).drop("__p")
  }
}
