package graft.ops.reasoning

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.{EvalOp, FilterOp, Op}
import graft.functions.text._
import graft.serving.{LLMMap, ServingClient}

/** Reasoning / math-QA operators — SURVEY §2.2 (reasoning filters) and
  * §2.8 (reasoning generators).
  */

/** Answer-format check: a `\boxed{...}` or "answer: ..." marker exists
  * (`reasoning/filter/reasoning_answer_format_filter.py`). */
final case class AnswerFormatFilter(inputKey: String = "answer") extends FilterOp {
  val name = "answer_format_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column =
    col(inputKey).rlike("\\\\boxed\\{[^}]*\\}") ||
      lower(col(inputKey)).rlike("answer\\s*(is|:)")
}

/** Extract the final answer: last `\boxed{...}` payload, else the last
  * number in the text, else empty — the deterministic core of
  * `reasoning_answer_extraction_qwenmatheval_generator.py:15-59`
  * (`utils/reasoning/AnswerExtraction.py`). */
object AnswerExtraction {
  def finalAnswer(c: Column): Column = {
    val boxed = regexp_extract_all(c, lit("\\\\boxed\\{([^}]*)\\}"), lit(1))
    val numbers = regexp_extract_all(c, lit("-?[0-9]+(\\.[0-9]+)?"), lit(0))
    when(size(boxed) > 0, element_at(boxed, -1))
      .when(size(numbers) > 0, element_at(numbers, -1))
      .otherwise(lit(""))
  }
}

/** Extracted answer matches the golden answer after normalization
  * (`reasoning_answer_groundtruth_filter.py:11`; math_verify degraded to
  * normalized string/numeric equality). */
final case class AnswerGroundTruthFilter(answerKey: String = "answer",
    goldenKey: String = "golden_answer") extends FilterOp {
  val name = "answer_groundtruth_filter"
  val inputKeys = Seq(answerKey, goldenKey)
  private def norm(c: Column): Column = trim(lower(regexp_replace(c, "[ $,]", "")))
  def predicate: Column = {
    val a = norm(AnswerExtraction.finalAnswer(col(answerKey)))
    val g = norm(col(goldenKey))
    // numeric equality when both parse, else exact string match
    // (try_cast: ANSI mode would throw on non-numeric strings)
    val ad = a.try_cast("double"); val gd = g.try_cast("double")
    when(ad.isNotNull && gd.isNotNull, ad === gd).otherwise(a === g)
  }
}

/** Question↔answer n-gram overlap below threshold — leakage check
  * (`reasoning_answer_ngram_filter.py:13`): Jaccard of word n-gram sets. */
final case class AnswerNgramFilter(questionKey: String = "question",
    answerKey: String = "answer", n: Int = 3, maxOverlap: Double = 0.5)
    extends FilterOp {
  val name = "answer_ngram_filter"
  val inputKeys = Seq(questionKey, answerKey)
  def predicate: Column = {
    val nn = n; val mx = maxOverlap
    // imperative Jaccard over n-gram sets (set ops on ints → the UDF is
    // still exactly SQL-oracle-reproducible, ~20× the expression tree)
    val f = udf { (q: Seq[String], a: Seq[String]) =>
      def grams(ws: Seq[String]): java.util.HashSet[String] = {
        val s = new java.util.HashSet[String]()
        if (ws != null && ws.length >= nn) {
          var i = 0
          while (i <= ws.length - nn) { s.add(ws.slice(i, i + nn).mkString(" ")); i += 1 }
        }
        s
      }
      val qg = grams(q); val ag = grams(a)
      val union = new java.util.HashSet[String](qg)
      union.addAll(ag)
      if (union.isEmpty) true
      else {
        qg.retainAll(ag) // qg becomes the intersection
        qg.size.toDouble / union.size.toDouble <= mx
      }
    }
    f(words(col(questionKey)), words(col(answerKey)))
  }
}

/** Answer token length within bound (`reasoning_answer_token_length_filter.py:11`). */
final case class AnswerTokenLengthFilter(inputKey: String = "answer",
    maxTokens: Int = 8192) extends FilterOp {
  val name = "answer_token_length_filter"
  val inputKeys = Seq(inputKey)
  def predicate: Column = wordCount(col(inputKey)) <= maxTokens
}

/** Question → answer LLM generation (`reasoning_answer_generator.py:21`)
  * + extraction column, the reasoning chain's generate step. */
final case class ReasoningAnswerGenerator(questionKey: String,
    serving: ServingClient) extends Op {
  val name = "reasoning_answer_generator"
  val inputKeys = Seq(questionKey)
  val outputKeys = Seq("answer", "extracted_answer")
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val answered = LLMMap.generated(df, questionKey, "answer", serving, "ANSWER")
    answered.withColumn("extracted_answer",
      AnswerExtraction.finalAnswer(col("answer")))
  }
}

/** Pseudo-answer by majority vote over k samples
  * (`reasoning_pseudo_answer_generator.py:18`): reuse of the voting
  * pattern — extract each sample's final answer, take the mode. */
final case class PseudoAnswerGenerator(questionKey: String,
    serving: ServingClient, samples: Int = 3) extends Op {
  val name = "pseudo_answer_generator"
  val inputKeys = Seq(questionKey)
  val outputKeys = Seq("pseudo_answer")
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sampled = (0 until samples).foldLeft(df) { (d, i) =>
      val p = d.withColumn("__p", concat(col(questionKey), lit("#"), lit(i % 2)))
      val gen = LLMMap.generated(p, "__p", s"__raw$i", serving, "PSEUDO")
      gen.withColumn(s"__a$i", AnswerExtraction.finalAnswer(col(s"__raw$i")))
        .drop("__p", s"__raw$i")
    }
    val votes = array((0 until samples).map(i => col(s"__a$i")): _*)
    val counted = transform(array_distinct(votes),
      v => struct(size(filter(votes, x => x === v)).as("n"), v.as("v")))
    val winner = aggregate(counted,
      struct(lit(0).as("n"), lit("").as("v")),
      (acc, s) => when(acc("n") === 0, s)
        .when(s("n") > acc("n"), s)
        .when(s("n") === acc("n") && s("v") < acc("v"), s)
        .otherwise(acc))
    (0 until samples).foldLeft(sampled.withColumn("pseudo_answer", winner("v")))(
      (d, i) => d.drop(s"__a$i"))
  }
}

/** Question fusion: synthesize new questions from pairs of existing ones
  * (`reasoning/generate/reasoning_question_fusion_generator.py:20-111`):
  * per fusion style (parallel/sequential/condition prompt templates) and
  * per sample index i, one LLM map over the (problem_1, problem_2) pair →
  * `<outputKey>_question_<i>` columns. */
final case class ReasoningQuestionFusionGenerator(problem1Key: String,
    problem2Key: String, serving: graft.serving.ServingClient,
    outputKey: String = "fused", numPrompts: Int = 1,
    style: String = "parallel") extends graft.core.Op {
  require(numPrompts >= 1 && numPrompts <= 5, "numPrompts must be in 1..5")
  val name = "reasoning_question_fusion_generator"
  val inputKeys = Seq(problem1Key, problem2Key)
  val outputKeys = (0 until numPrompts).map(i => s"${outputKey}_question_$i")
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    (0 until numPrompts).foldLeft(df) { (d, i) =>
      val p = d.withColumn("__p",
        concat(col(problem1Key), lit(" <FUSE> "), col(problem2Key), lit(s"#$i")))
      LLMMap.generated(p, "__p", s"${outputKey}_question_$i", serving,
        s"FUSION:$style").drop("__p")
    }
}

/** LLM question-category classification
  * (`reasoning/eval/reasoning_question_category_sample_evaluator.py:79-117`):
  * the model's (possibly ```json-fenced) response parses for the category
  * field; unparseable responses yield null. */
final case class ReasoningCategorySampleEvaluator(inputKey: String = "instruction",
    serving: graft.serving.ServingClient,
    outputKey: String = "question_category") extends graft.core.Op {
  val name = "reasoning_question_category_sample_evaluator"
  val inputKeys = Seq(inputKey)
  val outputKeys = Seq(outputKey)
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val raw = LLMMap.generated(df, inputKey, "__raw", serving, "CATEGORY")
    val unfenced = regexp_replace(col("__raw"), "(?s)^```json\\s*|\\s*```$", "")
    val cat = regexp_extract(unfenced, "\"category\"\\s*:\\s*\"([^\"]*)\"", 1)
    raw.withColumn(outputKey, when(cat =!= "", cat)).drop("__raw")
  }
}

/** LLM question-difficulty rating
  * (`reasoning_question_difficulty_sample_evaluator.py:79-105`): parse
  * `Rating: <number>` from the response into a double score. */
final case class ReasoningDifficultySampleEvaluator(inputKey: String = "instruction",
    serving: graft.serving.ServingClient,
    outputKey: String = "difficulty_score") extends graft.core.Op {
  val name = "reasoning_question_difficulty_sample_evaluator"
  val inputKeys = Seq(inputKey)
  val outputKeys = Seq(outputKey)
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val raw = LLMMap.generated(df, inputKey, "__raw", serving, "DIFFICULTY")
    val m = regexp_extract(col("__raw"), "Rating:\\s*((\\d+\\.\\d+)|\\d+)", 1)
    raw.withColumn(outputKey, when(m =!= "", m.cast("double"))).drop("__raw")
  }
}

/** LLM solvability judge
  * (`reasoning_question_solvable_sample_evaluator.py`): yes/no verdict
  * as a boolean score column (evaluator — rows are kept). */
final case class ReasoningSolvableSampleEvaluator(inputKey: String = "instruction",
    serving: graft.serving.ServingClient,
    outputKey: String = "solvable") extends graft.core.Op {
  val name = "reasoning_question_solvable_sample_evaluator"
  val inputKeys = Seq(inputKey)
  val outputKeys = Seq(outputKey)
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    LLMMap.generated(df, inputKey, "__raw", serving, "JUDGE")
      .withColumn(outputKey, lower(col("__raw")).startsWith("yes"))
      .drop("__raw")
}

/** LLM question synthesis from seed problems
  * (`reasoning/generate/reasoning_question_generator.py`). */
final case class ReasoningQuestionGenerator(seedKey: String,
    serving: graft.serving.ServingClient,
    outputKey: String = "generated_question") extends graft.core.Op {
  val name = "reasoning_question_generator"
  val inputKeys = Seq(seedKey)
  val outputKeys = Seq(outputKey)
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    LLMMap.generated(df, seedKey, outputKey, serving, "QUESTIONGEN")
}

/** Four-aspect LLM question-quality gate
  * (`reasoning/filter/reasoning_question_filter.py:36-80`: format,
  * semantics, contradictions, solvability — keep passing rows). */
final case class ReasoningQuestionFilter(questionKey: String,
    serving: graft.serving.ServingClient) extends graft.core.Op {
  val name = "reasoning_question_filter"
  val inputKeys = Seq(questionKey)
  val outputKeys = Nil
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    LLMMap.generated(df, questionKey, "__judge", serving, "JUDGE")
      .filter(lower(col("__judge")).startsWith("yes"))
      .drop("__judge")
}

/** LLM answer-vs-groundtruth judge filter
  * (`reasoning/filter/reasoning_answer_model_judge_filter.py`): the
  * judge sees both answers and keeps semantically-equivalent rows —
  * the model-backed sibling of the exact AnswerGroundTruthFilter. */
final case class ReasoningAnswerModelJudgeFilter(answerKey: String,
    goldKey: String, serving: graft.serving.ServingClient)
    extends graft.core.Op {
  val name = "reasoning_answer_model_judge_filter"
  val inputKeys = Seq(answerKey, goldKey)
  val outputKeys = Nil
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = df.withColumn("__p",
      concat(col(answerKey), lit(" <VS> "), col(goldKey)))
    LLMMap.generated(p, "__p", "__judge", serving, "JUDGE")
      .filter(lower(col("__judge")).startsWith("yes"))
      .drop("__p", "__judge")
  }
}
