package graft.ops.text2sql

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Op

/** Spider-semantics hardness classifier — the structural counterpart of
  * the regex-count [[SQLComponentClassifier]], following the reference's
  * full component parser (`text2sql/eval/sql_component_classifier.py:42-741`,
  * itself the public Spider `evaluation.py` hardness):
  *
  *   comp1 = [WHERE] + [GROUP BY] + [ORDER BY] + [LIMIT] + #joins
  *           + #OR + #LIKE                              (top level)
  *   comp2 = #nested SELECTs + #set operations
  *   others = [#aggs > 1] + [#select cols > 1]
  *           + [#where conds > 1] + [#group-by cols > 1]
  *
  *   easy   : comp1 ≤ 1 ∧ others = 0 ∧ comp2 = 0
  *   medium : (others ≤ 2 ∧ comp1 ≤ 1 ∧ comp2 = 0)
  *          ∨ (comp1 ≤ 2 ∧ others < 2 ∧ comp2 = 0)
  *   hard   : (others > 2 ∧ comp1 ≤ 2 ∧ comp2 = 0)
  *          ∨ (2 < comp1 ≤ 3 ∧ others ≤ 2 ∧ comp2 = 0)
  *          ∨ (comp1 ≤ 1 ∧ others = 0 ∧ comp2 ≤ 1)
  *   extra  : otherwise
  *
  * Counting runs on a paren-depth-aware token walk (strings and comments
  * stripped) — a faithful approximation of the AST parser: top-level
  * clauses counted at depth 0, any deeper SELECT counted as nesting. */
final case class SpiderHardnessClassifier(sqlKey: String,
    outputKey: String = "hardness") extends Op {
  val name = "spider_hardness_classifier"
  val inputKeys = Seq(sqlKey)
  val outputKeys = Seq(outputKey)

  private val classify = udf { sql: String =>
    if (sql == null) "easy"
    else {
      val cleaned = sql
        .replaceAll("--[^\n]*", " ")
        .replaceAll("(?s)/\\*.*?\\*/", " ")
        .replaceAll("'[^']*'", "'s'")
        .replaceAll("\"[^\"]*\"", "\"s\"")
      // tokenize with paren depth
      val toks = cleaned.split("(?=[(),])|(?<=[(),])|\\s+").filter(_.nonEmpty)
        .map(_.toLowerCase)
      var depth = 0
      var comp1 = 0
      var nested = 0
      var aggs = 0
      var selectCols = 1
      var whereConds = 1
      var groupCols = 1
      var hasWhere = false; var hasGroup = false; var hasOrder = false
      var hasLimit = false
      // clause tracker at depth 0: select | from | where | group | order
      var clause = ""
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        t match {
          case "(" => depth += 1
          case ")" => depth -= 1
          case "select" =>
            if (depth > 0) nested += 1
            // depth-0 SELECT only occurs at statement start or right after
            // a set operator — reset the clause tracker either way, else the
            // second SELECT's column commas still match the stale clause
            // (e.g. "from" → phantom implicit joins → misclassification)
            else clause = "select"
          case "union" | "intersect" | "except" if depth == 0 => nested += 1
          case _ if depth == 0 =>
            t match {
              case "from" => clause = "from"
              case "where" => clause = "where"; hasWhere = true
              case "group" => clause = "group"; hasGroup = true
              case "order" => clause = "order"; hasOrder = true
              case "limit" => hasLimit = true; clause = "limit"
              case "having" => clause = "having"
              case "join" => comp1 += 1
              case "or" if clause == "where" => comp1 += 1; whereConds += 1
              case "and" if clause == "where" => whereConds += 1
              case "like" if clause == "where" => comp1 += 1
              case "," if clause == "select" => selectCols += 1
              case "," if clause == "group" => groupCols += 1
              case "," if clause == "from" => comp1 += 1 // implicit join
              case a if a.matches("(sum|avg|min|max|count)") => aggs += 1
              case _ => ()
            }
          case _ if depth > 0 =>
            // aggregates only matter at top level select; nothing to do
            ()
          case _ => ()
        }
        i += 1
      }
      if (hasWhere) comp1 += 1
      if (hasGroup) comp1 += 1
      if (hasOrder) comp1 += 1
      if (hasLimit) comp1 += 1
      var others = 0
      if (aggs > 1) others += 1
      if (selectCols > 1) others += 1
      if (hasWhere && whereConds > 1) others += 1
      if (hasGroup && groupCols > 1) others += 1
      val comp2 = nested
      if (comp1 <= 1 && others == 0 && comp2 == 0) "easy"
      else if ((others <= 2 && comp1 <= 1 && comp2 == 0) ||
        (comp1 <= 2 && others < 2 && comp2 == 0)) "medium"
      else if ((others > 2 && comp1 <= 2 && comp2 == 0) ||
        (comp1 > 2 && comp1 <= 3 && others <= 2 && comp2 == 0) ||
        (comp1 <= 1 && others == 0 && comp2 <= 1)) "hard"
      else "extra"
    }
  }

  def apply(df: DataFrame): DataFrame =
    df.withColumn(outputKey, classify(col(sqlKey)))
}
