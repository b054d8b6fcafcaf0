package graft.ops.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.text._

/** Dataset-level evaluators — SURVEY §2.6: the reference's only
  * aggregation operators. Each is a partial-aggregatable `groupBy`/`agg`
  * (map-side combine; one shuffle of pre-aggregated partials — scales to
  * any row count).
  *
  * Float determinism: monetary/score sums go through DECIMAL casts (exact,
  * order-independent); ratios divide the exact sums in double.
  */
object DatasetEvaluators {

  /** Accuracy stats {total, valid, matched, accuracy} given a per-row
    * match predicate (`bench_dataset_evaluator.py:117-142`). */
  def benchAccuracy(df: DataFrame, matchCol: Column, validCol: Column): DataFrame =
    df.agg(
      count(lit(1)).as("total"),
      sum(validCol.cast("int")).cast("long").as("valid"),
      sum((matchCol && validCol).cast("int")).cast("long").as("matched"),
      round(sum((matchCol && validCol).cast("int")).cast("double") /
        count(lit(1)).cast("double"), 6).as("accuracy"))

  /** Per-group accuracy (`unified_bench_dataset_evaluator.py:31`). */
  def benchAccuracyBy(df: DataFrame, groupKey: String, matchCol: Column): DataFrame =
    df.groupBy(col(groupKey))
      .agg(count(lit(1)).as("total"),
        sum(matchCol.cast("int")).cast("long").as("matched"),
        round(sum(matchCol.cast("int")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("accuracy"))

  /** Category distribution (`reasoning_category_dataset_evaluator.py:70`). */
  def categoryDistribution(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))

  /** Mean/std of a numeric column
    * (`reasoning_difficulty_dataset_evaluator.py:52`). Sums in
    * DECIMAL(38,6) → exact; mean/std derived in double from the exact
    * sums (Welford-free, order-independent). */
  def numericStats(df: DataFrame, key: String): DataFrame = {
    // DECIMAL(18,6) keeps x and x² exact (no precision-cap rounding in
    // either Spark or the oracle engine); all derived math is double.
    val x = col(key).cast("decimal(18,6)")
    df.agg(
      count(col(key)).as("n"),
      round(sum(x).cast("double") / count(col(key)).cast("double"), 6).as("mean"),
      round(
        sqrt(
          (sum(x * x).cast("double") -
            sum(x).cast("double") * sum(x).cast("double") / count(col(key)).cast("double")) /
            (count(col(key)).cast("double") - 1.0)), 6).as("stddev"))
  }

  /** Token stats over a text column
    * (`reasoning_token_dataset_evaluator.py:84`). */
  def tokenStats(df: DataFrame, key: String): DataFrame = {
    val n = wordCount(col(key))
    df.agg(
      sum(n).cast("long").as("total_tokens"),
      round(sum(n).cast("double") / count(lit(1)).cast("double"), 6).as("mean_tokens"),
      min(n).cast("long").as("min_tokens"),
      max(n).cast("long").as("max_tokens"))
  }
}

/** SMILES-equivalence dataset accuracy
  * (`chemistry/eval/smiles_equivalence_dataset_evaluator.py:11-120`):
  * per row, 1 when the synthesized SMILES matches the gold label, else
  * 0; dataset score = mean. The reference canonicalizes through RDKit
  * (`Chem.MolToSmiles(canonical=True)`); without a chemistry toolkit the
  * comparison degrades to trimmed string equality — the aggregation
  * shape and the scoring contract are identical, the canonicalizer is a
  * seam (`canon`). */
final case class SmilesEquivalenceDatasetEvaluator(goldKey: String,
    synthKey: String,
    canon: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => org.apache.spark.sql.functions.trim(c)) {
  import org.apache.spark.sql.functions._
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val eq = (canon(col(goldKey)) === canon(col(synthKey))).cast("int")
    df.agg(count(lit(1)).as("total"),
      sum(eq).cast("bigint").as("equivalent"),
      round(sum(eq).cast("double") / count(lit(1)).cast("double"), 6).as("accuracy"))
  }
}
