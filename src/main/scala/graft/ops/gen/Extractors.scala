package graft.ops.gen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Op

/** Structured extraction / formatting operators (knowledge_cleaning +
  * pdf2vqa families). All pure Column expressions — narrow, codegen. */

/** Extract Q/A pairs from cleaned text
  * (`knowledge_cleaning/generate/qa_extract.py:80-200`): every
  * "Q: … A: …" span becomes one exploded (pos, question, answer) row. */
final case class QAExtractGenerator(inputKey: String = "text",
    idKey: String = "doc_id") extends Op {
  val name = "qa_extract_generator"
  val inputKeys = Seq(inputKey, idKey)
  val outputKeys = Seq("pos", "question", "answer")
  def apply(df: DataFrame): DataFrame = {
    val pairs = regexp_extract_all(col(inputKey),
      lit("(?s)Q:\\s*(.*?)\\s*A:\\s*(.*?)(?=(?:Q:)|$)"), lit(0))
    df.withColumn("__pairs", pairs)
      .select(col(idKey), posexplode(col("__pairs")).as(Seq("pos", "__pair")))
      .withColumn("question",
        trim(regexp_extract(col("__pair"), "(?s)Q:\\s*(.*?)\\s*A:", 1)))
      .withColumn("answer",
        trim(regexp_extract(col("__pair"), "(?s)A:\\s*(.*)$", 1)))
      .drop("__pair")
  }
}

/** Mathbook question extraction
  * (`knowledge_cleaning/generate/mathbook_question_extract.py:253-290`):
  * questions are separated by `<SPACE>`; each carries optional
  * `<image>name.jpg</image>` references which are collected and stripped
  * from the question text. */
final case class MathbookQuestionExtract(inputKey: String = "text",
    idKey: String = "doc_id") extends Op {
  val name = "mathbook_question_extract"
  val inputKeys = Seq(inputKey, idKey)
  val outputKeys = Seq("pos", "question", "images")
  def apply(df: DataFrame): DataFrame =
    df.select(col(idKey),
      posexplode(split(col(inputKey), "<SPACE>")).as(Seq("pos", "__q")))
      .filter(trim(col("__q")) =!= "")
      .withColumn("images",
        regexp_extract_all(col("__q"), lit("<image>(.*?)\\.jpg</image>"), lit(1)))
      .withColumn("question",
        trim(regexp_replace(col("__q"), "<image>(.*?)\\.jpg</image>", "")))
      .drop("__q")
}

/** ShareGPT VQA formatting (`pdf2vqa/generate/vqa_formatter.py:22-251`):
  * (question, answer, images) → one JSON record with `messages`
  * (user/assistant turns) and `images`. */
final case class VQAFormatter(questionKey: String = "question",
    answerKey: String = "answer", imagesKey: String = "images",
    outputKey: String = "sharegpt") extends Op {
  val name = "vqa_formatter"
  val inputKeys = Seq(questionKey, answerKey, imagesKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    df.withColumn(outputKey, to_json(struct(
      array(
        struct(lit("user").as("role"), col(questionKey).as("content")),
        struct(lit("assistant").as("role"), col(answerKey).as("content"))
      ).as("messages"),
      col(imagesKey).as("images"))))
}

/** Page-ordered document reassembly (`pdf2vqa/generate/pdf_merger.py`,
  * `qa_merger.py`): group page rows by document id, concatenate page
  * content in page order — one shuffle on the id. */
final case class PDFMerger(idKey: String = "doc_id",
    pageKey: String = "page", contentKey: String = "content",
    outputKey: String = "document", sep: String = "\n\n") extends Op {
  val name = "pdf_merger"
  val inputKeys = Seq(idKey, pageKey, contentKey)
  val outputKeys = Seq(outputKey)
  def apply(df: DataFrame): DataFrame =
    df.groupBy(col(idKey))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(pageKey), col(contentKey)))),
        s => s(contentKey)), sep).as(outputKey))
}

/** Parse structured fields out of raw LLM output
  * (`pdf2vqa/generate/llm_output_parser.py`): named regex groups →
  * typed columns; unmatched fields null. */
final case class LLMOutputParser(inputKey: String = "raw",
    fields: Seq[(String, String)] = Seq(
      "question" -> "(?s)Question:\\s*(.*?)\\s*(?:Answer:|$)",
      "answer" -> "(?s)Answer:\\s*(.*)$")) extends Op {
  val name = "llm_output_parser"
  val inputKeys = Seq(inputKey)
  val outputKeys = fields.map(_._1)
  def apply(df: DataFrame): DataFrame =
    fields.foldLeft(df) { case (d, (k, pattern)) =>
      val m = regexp_extract(col(inputKey), pattern, 1)
      d.withColumn(k, when(trim(m) =!= "", trim(m)))
    }
}
