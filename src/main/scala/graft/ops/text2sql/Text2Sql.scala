package graft.ops.text2sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Op
import graft.serving.{LLMMap, ServingClient}

/** Text2SQL suite — SURVEY §2.10. */

/** Extract the first ```sql fenced block (fallback: whole string) —
  * the parse step of `text2sql/generate/sql_generator.py:56-67`. */
object SqlExtract {
  def apply(c: Column): Column = {
    val block = regexp_extract(c, "(?s)```sql\\s*(.*?)```", 1)
    when(block =!= "", trim(block)).otherwise(trim(c))
  }
}

/** LLM synthesizes SQL per schema then parses the fenced block
  * (`sql_generator.py:19-67`). */
final case class SQLGenerator(schemaKey: String, outputKey: String,
    serving: ServingClient, generateNum: Int = 0) extends Op {
  val name = "sql_generator"
  val inputKeys = Seq(schemaKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame = {
    val capped = if (generateNum > 0) df.limit(generateNum) else df
    val raw = LLMMap.generated(capped, schemaKey, "__raw", serving, "SQLGEN")
    raw.withColumn(outputKey, SqlExtract(col("__raw"))).drop("__raw")
  }
}

/** LLM produces variations of existing SQL (`sql_variation_generator.py:20-77`). */
final case class SQLVariationGenerator(sqlKey: String, outputKey: String,
    serving: ServingClient) extends Op {
  val name = "sql_variation_generator"
  val inputKeys = Seq(sqlKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.generated(df, sqlKey, outputKey, serving, "VARY")
}

/** NL question for each SQL (`text2sql_question_generator.py:19-116`). */
final case class Text2SQLQuestionGenerator(sqlKey: String, outputKey: String,
    serving: ServingClient) extends Op {
  val name = "text2sql_question_generator"
  val inputKeys = Seq(sqlKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.generated(df, sqlKey, outputKey, serving, "QUESTION")
}

/** Builds the training prompt by joining the per-`db_id` schema dimension
  * onto each row (`text2sql_prompt_generator.py:17-58`). The schema table
  * is small → broadcast-hash join, no shuffle of the fact side. */
final case class Text2SQLPromptGenerator(dbKey: String, questionKey: String,
    outputKey: String, schemas: DataFrame, schemaKey: String = "schema_ddl")
    extends Op {
  val name = "text2sql_prompt_generator"
  val inputKeys = Seq(dbKey, questionKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    df.join(broadcast(schemas), Seq(dbKey), "left")
      .withColumn(outputKey,
        concat(lit("-- schema\n"), coalesce(col(schemaKey), lit("")),
          lit("\n-- question: "), col(questionKey), lit("\nSELECT")))
}

/** Keep SELECT-only statements after comment stripping
  * (`sql_executability_filter.py:14-49`). */
final case class SQLExecutabilityFilter(sqlKey: String) extends Op {
  val name = "sql_executability_filter"
  val inputKeys = Seq(sqlKey)
  val outputKeys = Nil
  def stripped: Column =
    regexp_replace(regexp_replace(col(sqlKey), "--[^\n]*", " "),
      "(?s)/\\*.*?\\*/", " ")
  def apply(df: DataFrame): DataFrame =
    df.filter(lower(stripped).rlike("^\\s*(select|with)\\b"))
}

/** Spider-style hardness classification (easy/medium/hard/extra) — a
  * rule-count port of `sql_component_classifier.py:42-741`'s component
  * counting, as pure string expressions. */
final case class SQLComponentClassifier(sqlKey: String,
    outputKey: String = "hardness") extends Op {
  val name = "sql_component_classifier"
  val inputKeys = Seq(sqlKey)
  val outputKeys = Seq(outputKey)
  def components: Column = {
    val s = lower(col(sqlKey))
    val count = (p: String) => size(regexp_extract_all(s, lit(p), lit(0)))
    count("\\bjoin\\b") + count("\\bgroup\\s+by\\b") + count("\\border\\s+by\\b") +
      count("\\b(sum|avg|min|max|count)\\s*\\(") + count("\\bwhere\\b") +
      count("\\b(union|intersect|except)\\b") +
      // nested selects: every select beyond the first
      greatest(count("\\bselect\\b") - 1, lit(0))
  }
  def apply(df: DataFrame): DataFrame =
    df.withColumn(outputKey,
      when(components <= 1, "easy")
        .when(components <= 3, "medium")
        .when(components <= 5, "hard")
        .otherwise("extra"))
}

/** Execute each DISTINCT SQL against the engine with a timeout and keep
  * rows whose SQL runs (`sql_execution_filter.py:13-80`,
  * `database_manager.py:110-113` query_timeout=5s). Distinct statements
  * are collected to the driver (the reference's pooled exec is also
  * driver-coordinated), executed against registered temp views, and the
  * verdicts broadcast-joined back — executor-side per-row DB connections
  * are avoided entirely. */
final case class SQLExecutionFilter(sqlKey: String, timeoutSec: Int = 5)
    extends Op {
  val name = "sql_execution_filter"
  val inputKeys = Seq(sqlKey)
  val outputKeys = Nil
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val distinctSql = df.select(sqlKey).distinct()
      .collect().map(_.getString(0)).toSeq
    // spark.sql is thread-safe: fan the distinct statements over a driver
    // pool (the reference uses 20 workers, database_manager.py:110-113)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(16, Runtime.getRuntime.availableProcessors()))
    val verdicts = try {
      import scala.jdk.CollectionConverters._
      val tasks = distinctSql.map { q =>
        new java.util.concurrent.Callable[(String, Boolean)] {
          def call(): (String, Boolean) = (q, SqlExecutor.runs(spark, q, timeoutSec))
        }
      }
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
    } finally pool.shutdown()
    val vdf = spark.createDataFrame(verdicts).toDF(sqlKey, "__ok")
    df.join(broadcast(vdf), Seq(sqlKey), "left")
      .filter(col("__ok")).drop("__ok")
  }
}

/** CoT generation with majority voting over n samples
  * (`text2sql_cot_voting_generator.py:86`): n LLM samples per row →
  * the modal answer wins (ties break lexicographically). */
final case class Text2SQLCoTVotingGenerator(sqlKey: String, outputKey: String,
    serving: ServingClient, samples: Int = 3) extends Op {
  val name = "text2sql_cot_voting_generator"
  val inputKeys = Seq(sqlKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame = {
    val sampled = (0 until samples).foldLeft(df) { (d, i) =>
      val p = d.withColumn("__p", concat(col(sqlKey), lit("#"), lit(i % 2)))
      LLMMap.generated(p, "__p", s"__s$i", serving, "COT").drop("__p")
    }
    val votes = array((0 until samples).map(i => col(s"__s$i")): _*)
    // modal element: for each candidate count occurrences; keep max count,
    // lexicographically smallest on ties
    val counted = transform(array_distinct(votes),
      v => struct(size(filter(votes, x => x === v)).as("n"), v.as("v")))
    val winner = aggregate(counted,
      struct(lit(0).as("n"), lit("").as("v")),
      (acc, s) => when(acc("n") === 0, s)
        .when(s("n") > acc("n"), s)
        .when(s("n") === acc("n") && s("v") < acc("v"), s)
        .otherwise(acc))
    (0 until samples).foldLeft(
      sampled.withColumn(outputKey, winner("v")))((d, i) => d.drop(s"__s$i"))
  }
}

/** Driver-side SQL execution with timeout — the engine-native analogue of
  * the reference's pooled `DatabaseManager` timed execution. */
object SqlExecutor {
  def runs(spark: SparkSession, sql: String, timeoutSec: Int): Boolean = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    try {
      Await.result(Future(spark.sql(sql).limit(1).collect()).map(_ => true)
        .recover { case _ => false }, timeoutSec.seconds)
    } catch { case _: Throwable => false }
  }

  /** Timed result for classification use
    * (`sql_execution_classifier.py:15-243`): Some(rows-hash) or None. */
  def resultHash(spark: SparkSession, sql: String, timeoutSec: Int): Option[Long] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    try {
      Await.result(Future {
        val rows = spark.sql(sql).collect()
        Some(rows.map(_.toString).sorted.mkString("\n").hashCode.toLong)
      }.recover { case _ => None }, timeoutSec.seconds)
    } catch { case _: Throwable => None }
  }
}
