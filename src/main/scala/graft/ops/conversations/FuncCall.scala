package graft.ops.conversations

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Op
import graft.serving.{LLMMap, ServingClient}

/** The full 7-operator function-calling synthesis chain
  * (`conversations/generate/func_call_generators.py:26-540`). Each stage
  * is an independent operator (as in the reference) so pipelines can
  * start/stop anywhere; all are narrow LLM maps except the multi-turn
  * conversation loop, which is a bounded sequence of LLM maps.
  */

/** Chat → scenario (`func_call_generators.py:26-80`). */
final case class ScenarioExtractGenerator(chatKey: String,
    serving: ServingClient, outputKey: String = "scenario") extends Op {
  val name = "scenario_extract_generator"
  val inputKeys = Seq(chatKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.generated(df, chatKey, outputKey, serving, "SCENARIO")
}

/** Scenario → modified scenario (`func_call_generators.py:82-136`). */
final case class ScenarioExpandGenerator(scenarioKey: String,
    serving: ServingClient, outputKey: String = "modified_scenario")
    extends Op {
  val name = "scenario_expand_generator"
  val inputKeys = Seq(scenarioKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.generated(df, scenarioKey, outputKey, serving, "EXPAND")
}

/** Scenario → atomic task (`func_call_generators.py:137-191`). */
final case class AtomTaskGenerator(scenarioKey: String,
    serving: ServingClient, outputKey: String = "atom_task") extends Op {
  val name = "atom_task_generator"
  val inputKeys = Seq(scenarioKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.generated(df, scenarioKey, outputKey, serving, "ATOM")
}

/** Atomic task → subsequent + composition tasks, parsed from the
  * response's "### Subsequent Task:" / "### Composition Task:" sections
  * (`func_call_generators.py:192-266`). */
final case class SequentialTaskGenerator(taskKey: String,
    serving: ServingClient,
    subsequentKey: String = "subsequent_task",
    compositionKey: String = "composition_task") extends Op {
  val name = "sequential_task_generator"
  val inputKeys = Seq(taskKey)
  val outputKeys = Seq(subsequentKey, compositionKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.generated(df, taskKey, "__raw", serving, "SEQTASK")
      .withColumn(subsequentKey,
        FuncCallParse.section(col("__raw"), "Subsequent Task"))
      .withColumn(compositionKey,
        FuncCallParse.tailSection(col("__raw"), "Composition Task"))
      .drop("__raw")
}

/** Atomic task → parallel + subsequent + composition tasks
  * (`func_call_generators.py:267-351`). */
final case class ParaSeqTaskGenerator(taskKey: String,
    serving: ServingClient,
    parallelKey: String = "parallel_task",
    subsequentKey: String = "subsequent_task",
    compositionKey: String = "composition_task") extends Op {
  val name = "para_seq_task_generator"
  val inputKeys = Seq(taskKey)
  val outputKeys = Seq(parallelKey, subsequentKey, compositionKey)
  def apply(df: DataFrame): DataFrame =
    LLMMap.generated(df, taskKey, "__raw", serving, "PARASEQ")
      .withColumn(parallelKey, FuncCallParse.section(col("__raw"), "Parallel Task"))
      .withColumn(subsequentKey, FuncCallParse.section(col("__raw"), "Subsequent Task"))
      .withColumn(compositionKey, FuncCallParse.tailSection(col("__raw"), "Composition Task"))
      .drop("__raw")
}

/** Composition task + sub-tasks → function signatures
  * (`func_call_generators.py:352-416`). */
final case class FunctionGenerator(compositionKey: String,
    subTaskKeys: Seq[String], serving: ServingClient,
    outputKey: String = "functions") extends Op {
  val name = "function_generator"
  val inputKeys = compositionKey +: subTaskKeys
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame = {
    val prompt = concat_ws(" <SUB> ",
      (col(compositionKey) +: subTaskKeys.map(col)): _*)
    val p = df.withColumn("__p", prompt)
    LLMMap.generated(p, "__p", outputKey, serving, "FUNCGEN").drop("__p")
  }
}

/** Multi-turn user/assistant/tool conversation synthesis
  * (`func_call_generators.py:417-540`): a user-agent turn, then up to
  * `maxTurns` assistant turns; an assistant response containing
  * `<final>…</final>` completes the dialog, otherwise its
  * `<func_call>…</func_call>` is answered by the tool agent and the loop
  * continues. The loop is a BOUNDED unroll of narrow LLM maps — rows
  * already complete keep their conversation unchanged (their per-turn
  * generation is discarded), so the plan stays shuffle-free and the turn
  * count is a static bound exactly like the reference's `turns >= 5`. */
final case class MultiTurnConversationGenerator(taskKey: String,
    subTaskKeys: Seq[String], functionsKey: String,
    serving: ServingClient, outputKey: String = "conversations",
    maxTurns: Int = 5) extends Op {
  val name = "multi_turn_conversation_generator"
  val inputKeys = (taskKey +: subTaskKeys) :+ functionsKey
  val outputKeys = Seq(outputKey)

  private def turn(role: String, content: Column): Column =
    struct(lit(role).as("role"), content.as("content"))

  def apply(df: DataFrame): DataFrame = {
    val seed = df.withColumn("__p",
      concat_ws(" <SUB> ", (col(taskKey) +: subTaskKeys.map(col)) :+ col(functionsKey): _*))
    val user = LLMMap.generated(seed, "__p", "__user", serving, "USERGEN")
      .withColumn(outputKey, array(turn("user", col("__user"))))
      .withColumn("__done", lit(false))
      .drop("__p", "__user")
    val chatted = (1 to maxTurns).foldLeft(user) { (d, _) =>
      val serialized = d.withColumn("__conv",
        concat_ws("\n", transform(col(outputKey),
          t => concat(t("role"), lit(": "), t("content")))))
      val replied = LLMMap.generated(serialized, "__conv", "__assist", serving, "ASSIST")
      val isFinal = col("__assist").contains("<final>")
      val funcCall = regexp_extract(col("__assist"), "(?s)<func_call>(.*?)</func_call>", 1)
      val toolPrompted = replied.withColumn("__fc", funcCall)
      val tooled = LLMMap.generated(toolPrompted, "__fc", "__tool", serving, "TOOL")
      tooled
        .withColumn(outputKey,
          when(col("__done"), col(outputKey))
            .when(isFinal, concat(col(outputKey), array(turn("assistant", col("__assist")))))
            .otherwise(concat(col(outputKey),
              array(turn("assistant", col("__assist")), turn("tool", col("__tool"))))))
        .withColumn("__done", col("__done") || isFinal)
        .drop("__conv", "__assist", "__fc", "__tool")
    }
    chatted.drop("__done")
  }
}

private[conversations] object FuncCallParse {
  /** "### <name>: <value>\n" mid-response section (reference regex
    * `### Subsequent Task: (.*?)\n`); null when absent. */
  def section(c: Column, sectionName: String): Column = {
    val m = regexp_extract(c, s"### $sectionName: (.*?)\n", 1)
    when(m =!= "", m)
  }

  /** "### <name>: <value>$" end-anchored section (`(.*?)$`). */
  def tailSection(c: Column, sectionName: String): Column = {
    val m = regexp_extract(c, s"(?s)### $sectionName: (.*)$$", 1)
    when(m =!= "", m)
  }
}
