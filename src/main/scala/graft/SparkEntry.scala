package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{FilterOp, RefineOp, Storage}
import graft.ops.filter._
import graft.ops.refine._
import graft.ops.dedup._
import graft.ops.eval._
import graft.ops.text._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent oracle where the semantics are
  * SQL-expressible. Column names are aligned between the Spark result and
  * the oracle SQL (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the minimum end-to-end slice of SURVEY §7.3 — refine → filter →
    * order-sensitive dedup over the documents table. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = Storage.table(spark, "/root/testdata/sf0.001", "documents")
    val pipeline = graft.core.Pipeline.of(
      RemoveExtraSpacesRefiner("text"),
      WordNumberFilter("text", 5, 100000),
      HashDeduplicateFilter(Seq("text"), "doc_id"))
    pipeline(docs)
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Storage.table(s, dir, name)

  // ---- oracle SQL snippets (DuckDB dialect) -------------------------------
  /** Non-empty whitespace tokens of a column. */
  private def sqlWords(c: String) =
    s"list_filter(regexp_split_to_array($c, '\\s+'), x -> x <> '')"
  private def sqlWordCount(c: String) = s"len(${sqlWords(c)})"
  private val D = "documents"

  private case class Q(fn: (SparkSession, String) => DataFrame, sql: Option[String])
  private def oracled(sql: String)(fn: (SparkSession, String) => DataFrame) = Q(fn, Some(sql))
  private def rowsOnly(fn: (SparkSession, String) => DataFrame) = Q(fn, None)

  private lazy val registry: Map[String, Q] = relational ++ filters ++ dedups ++
    refiners ++ evals ++ aggs

  // ---- relational / TPC-H-ish bench surface -------------------------------
  private def relational: Map[String, Q] = Map(
    "q1_pricing" -> oracled(
      """SELECT l_returnflag, l_linestatus,
        |  SUM(CAST(l_quantity AS DECIMAL(20,2))) AS sum_qty,
        |  SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS sum_base_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("decimal(20,2)")).as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(20,2)")).as("sum_base_price"),
            count(lit(1)).as("count_order"))
    },
    "q3_revenue_by_customer" -> oracled(
      """SELECT c_custkey, c_name,
        |  SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_custkey, c_name""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      // customer is the small side at scale → broadcast; orders⋈lineitem
      // co-shuffles on the orderkey.
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(20,4)")).as("revenue"))
    },
    "q5_region_revenue" -> oracled(
      """SELECT r_name, n_name,
        |  SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,4))) AS revenue
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |JOIN supplier ON s_nationkey = n_nationkey
        |JOIN lineitem ON l_suppkey = s_suppkey
        |GROUP BY r_name, n_name""".stripMargin) { (s, dir) =>
      val r = t(s, dir, "region"); val n = t(s, dir, "nation")
      val sup = t(s, dir, "supplier"); val l = t(s, dir, "lineitem")
      // dims are tiny → broadcast all; single shuffle for the final agg.
      l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(20,4)")).as("revenue"))
    })

  // ---- rule filters (§2.2) -----------------------------------------------
  private def filterQ(op: FilterOp, sqlPred: String): Q =
    oracled(s"SELECT doc_id, n_chars FROM $D WHERE $sqlPred") { (s, dir) =>
      op(t(s, dir, D)).select("doc_id", "n_chars")
    }

  private def filters: Map[String, Q] = Map(
    "filter_word_number" -> filterQ(WordNumberFilter("text", 40, 100000),
      s"${sqlWordCount("text")} >= 40 AND ${sqlWordCount("text")} < 100000"),
    "filter_char_number" -> filterQ(CharNumberFilter("text", 200),
      "length(text) >= 200"),
    "filter_content_null" -> filterQ(ContentNullFilter("text"),
      "text IS NOT NULL AND trim(text) <> ''"),
    "filter_unique_words" -> filterQ(UniqueWordsFilter("text", 0.5),
      s"CAST(len(list_distinct(${sqlWords("text")})) AS DOUBLE) / " +
        s"CAST(${sqlWordCount("text")} AS DOUBLE) >= 0.5"),
    "filter_mean_word_length" -> filterQ(MeanWordLengthFilter("text", 3.0, 10.0),
      s"CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / " +
        s"CAST(${sqlWordCount("text")} AS DOUBLE) BETWEEN 3.0 AND 10.0"),
    "filter_stop_word" -> filterQ(StopWordFilter("text", 0.06),
      s"CAST(len(list_filter(${sqlWords("lower(text)")}, w -> list_contains(${sqlLex(Lexicons.englishStopwords)}, w))) AS DOUBLE) / " +
        s"CAST(${sqlWordCount("text")} AS DOUBLE) > 0.06"),
    "filter_language" -> filterQ(LanguageFilter("lang", Seq("en", "fr")),
      "lang IN ('en','fr')"),
    "filter_colon_end" -> filterQ(ColonEndFilter("text"),
      "NOT ends_with(rtrim(text), ':')"),
    "filter_blocklist" -> filterQ(BlocklistFilter("text", Seq("dup", "slow"), 2),
      s"len(list_filter(${sqlWords("lower(text)")}, w -> list_contains(['dup','slow'], w))) < 2"),
    "filter_watermark" -> filterQ(WatermarkFilter("text", Seq("watermark", "copyright")),
      "NOT regexp_matches(lower(text), 'watermark|copyright')"),
    "filter_alpha_words" -> filterQ(AlphaWordsFilter("text", 0.6),
      s"CAST(len(list_filter(${sqlWords("text")}, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) / " +
        s"CAST(${sqlWordCount("text")} AS DOUBLE) >= 0.6"),
    "filter_ngram" -> filterQ(NgramFilter("text", 5, 0.4, 1.0),
      s"(${sqlNgramUnique("text", 5)}) BETWEEN 0.4 AND 1.0"))

  /** DuckDB literal string list. */
  private def sqlLex(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ",", "]")

  /** DuckDB unique-n-gram ratio (matches text.ngramUniqueRatio). */
  private def sqlNgramUnique(c: String, n: Int): String = {
    val grams = s"CASE WHEN len(${sqlWords(c)}) < $n THEN [] " +
      s"ELSE list_transform(range(0, len(${sqlWords(c)}) - $n + 1), " +
      s"i -> array_to_string(list_slice(${sqlWords(c)}, i + 1, i + $n), ' ')) END"
    s"CASE WHEN len($grams) = 0 THEN 1.0 ELSE " +
      s"CAST(len(list_distinct($grams)) AS DOUBLE) / CAST(len($grams) AS DOUBLE) END"
  }

  // ---- dedup (§2.3) -------------------------------------------------------
  private def dedupOracle(hashExpr: String): String =
    s"""SELECT doc_id, n_chars FROM (
       |  SELECT doc_id, n_chars,
       |    row_number() OVER (PARTITION BY $hashExpr ORDER BY doc_id) AS rn
       |  FROM $D) WHERE rn = 1""".stripMargin

  private def dedups: Map[String, Q] = Map(
    "dedup_hash" -> oracled(dedupOracle("md5(text)")) { (s, dir) =>
      HashDeduplicateFilter(Seq("text"), "doc_id")(t(s, dir, D))
        .select("doc_id", "n_chars")
    },
    "dedup_ccnet" -> oracled(dedupOracle("substr(md5(text), 1, 16)")) { (s, dir) =>
      CCNetDeduplicateFilter("text", "doc_id")(t(s, dir, D))
        .select("doc_id", "n_chars")
    },
    "dedup_ngram_hash" -> oracled(dedupOracle(
      s"md5(array_to_string(list_sort(list_distinct(${sqlWordNgrams("text", 3)})), ''))")) {
      (s, dir) =>
        NgramHashDeduplicateFilter("text", "doc_id", 3)(t(s, dir, D))
          .select("doc_id", "n_chars")
    },
    "dedup_minhash" -> oracled(
      s"""WITH sh AS (SELECT doc_id, list_distinct(${sqlWordNgrams("text", 3)}) AS g FROM $D)
         |SELECT d.doc_id, d.n_chars FROM $D d WHERE NOT EXISTS (
         |  SELECT 1 FROM sh a, sh b
         |  WHERE b.doc_id = d.doc_id AND a.doc_id < b.doc_id
         |    AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE) >= 0.9)
         |""".stripMargin) { (s, dir) =>
      MinHashDeduplicateFilter("text", "doc_id", ngram = 3, threshold = 0.9)(t(s, dir, D))
        .select("doc_id", "n_chars")
    },
    "dedup_sem" -> oracled(
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |SELECT d.vec_id, d.label FROM embeddings d WHERE NOT EXISTS (
        |  SELECT 1 FROM v a, v b
        |  WHERE b.vec_id = d.vec_id AND a.vec_id < b.vec_id
        |    AND list_dot_product(a.e, b.e) /
        |        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.95)
        |""".stripMargin) { (s, dir) =>
      SemDeduplicateFilter("embedding", "vec_id", eps = 0.05)(t(s, dir, "embeddings"))
        .select("vec_id", "label")
    },
    "dedup_simhash" -> rowsOnly { (s, dir) =>
      SimHashDeduplicateFilter("text", "doc_id", hammingK = 3)(t(s, dir, D))
        .select("doc_id", "n_chars")
    },
    "dedup_kcenter" -> rowsOnly { (s, dir) =>
      KCenterGreedyFilter("embedding", "vec_id", k = 100)(t(s, dir, "embeddings"))
        .select("vec_id", "label")
    })

  /** DuckDB word n-grams (matches text.wordNgrams). */
  private def sqlWordNgrams(c: String, n: Int): String =
    s"CASE WHEN len(${sqlWords(c)}) < $n THEN [] " +
      s"ELSE list_transform(range(0, len(${sqlWords(c)}) - $n + 1), " +
      s"i -> array_to_string(list_slice(${sqlWords(c)}, i + 1, i + $n), ' ')) END"

  // ---- refiners (§2.4) ----------------------------------------------------
  private def refineQ(op: RefineOp, sqlExpr: String): Q =
    oracled(s"SELECT doc_id, $sqlExpr AS text FROM $D") { (s, dir) =>
      op(t(s, dir, D)).select("doc_id", "text")
    }

  private def refiners: Map[String, Q] = Map(
    "refine_remove_extra_spaces" -> refineQ(RemoveExtraSpacesRefiner("text"),
      "trim(regexp_replace(text, '\\s+', ' ', 'g'))"),
    "refine_lowercase" -> refineQ(LowercaseRefiner("text"), "lower(text)"),
    "refine_remove_number" -> refineQ(RemoveNumberRefiner("text"),
      "regexp_replace(text, '[0-9]', '', 'g')"),
    "refine_remove_stopwords" -> refineQ(RemoveStopwordsRefiner("text"),
      s"array_to_string(list_filter(${sqlWords("text")}, " +
        s"w -> NOT list_contains(${sqlLex(Lexicons.englishStopwords)}, lower(w))), ' ')"),
    "refine_remove_punctuation" -> refineQ(RemovePunctuationRefiner("text"),
      """regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')"""),
    "refine_html_url_remover" -> refineQ(HtmlUrlRemoverRefiner("text"),
      "regexp_replace(regexp_replace(text, 'https?://[^\\s]+', '', 'g'), '<[^>]+>', '', 'g')"))

  // ---- sample evaluators (§2.5) + text analysis ---------------------------
  private def evals: Map[String, Q] = Map(
    "eval_ngram_score" -> oracled(
      s"SELECT doc_id, round(${sqlNgramUnique("text", 5)}, 6) AS ngram_score FROM $D") {
      (s, dir) =>
        NgramSampleEvaluator("text", 5)(t(s, dir, D)).select("doc_id", "ngram_score")
    },
    "eval_lexical_diversity" -> oracled(
      s"""SELECT doc_id,
         |  round(CAST(len(list_distinct(${sqlWords("text")})) AS DOUBLE) /
         |        CAST(${sqlWordCount("text")} AS DOUBLE), 6) AS ttr,
         |  round(CAST(len(list_distinct(${sqlWords("text")})) AS DOUBLE) /
         |        sqrt(CAST(${sqlWordCount("text")} AS DOUBLE)), 6) AS rttr
         |FROM $D""".stripMargin) { (s, dir) =>
      LexicalDiversitySampleEvaluator("text")(t(s, dir, D))
        .select("doc_id", "ttr", "rttr")
    },
    "eval_langkit" -> oracled(
      s"""SELECT doc_id, length(text) AS char_count,
         |  CAST(${sqlWordCount("text")} AS BIGINT) AS word_count,
         |  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS sentence_count,
         |  round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) /
         |        CAST(${sqlWordCount("text")} AS DOUBLE), 6) AS mean_word_len,
         |  round(4.71 * (CAST(length(text) AS DOUBLE) / CAST(${sqlWordCount("text")} AS DOUBLE))
         |    + 0.5 * (CAST(${sqlWordCount("text")} AS DOUBLE) /
         |             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE))
         |    - 21.43, 6) AS ari
         |FROM $D""".stripMargin) { (s, dir) =>
      LangkitSampleEvaluator("text")(t(s, dir, D))
        .select("doc_id", "char_count", "word_count", "sentence_count", "mean_word_len", "ari")
    },
    "text_token_count" -> oracled(
      s"""SELECT doc_id, CAST(${sqlWordCount("text")} AS BIGINT) AS word_tokens,
         |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS bpe_tokens
         |FROM $D""".stripMargin) { (s, dir) =>
      TokenCountEvaluator("text")(t(s, dir, D))
        .select("doc_id", "word_tokens", "bpe_tokens")
    },
    "text_fingerprint" -> oracled(
      s"""SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
         |  list_transform(${sqlWords("text")}, w -> ('0x' || substr(md5(w),1,8))::BIGINT)),
         |  (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
         |FROM $D""".stripMargin) { (s, dir) =>
      FingerprintEvaluator("text")(t(s, dir, D)).select("doc_id", "fingerprint")
    },
    "text_quality_score" -> oracled(
      s"""SELECT doc_id, round((
         |  least(CAST(${sqlWordCount("text")} AS DOUBLE) / 100.0, 1.0)
         |  + CAST(len(list_distinct(${sqlWords("text")})) AS DOUBLE) /
         |    CAST(${sqlWordCount("text")} AS DOUBLE)
         |  + least(CAST(len(list_filter(${sqlWords("lower(text)")},
         |      w -> list_contains(${sqlLex(Lexicons.englishStopwords)}, w))) AS DOUBLE) /
         |      CAST(${sqlWordCount("text")} AS DOUBLE) * 5.0, 1.0)
         |) / 3.0, 6) AS quality_score FROM $D""".stripMargin) { (s, dir) =>
      QualityScoreEvaluator("text")(t(s, dir, D)).select("doc_id", "quality_score")
    })

  // ---- dataset-level aggregations (§2.6) ----------------------------------
  private def aggs: Map[String, Q] = Map(
    "agg_category_distribution" -> oracled(
      s"SELECT lang, COUNT(*) AS n FROM $D GROUP BY lang") { (s, dir) =>
      DatasetEvaluators.categoryDistribution(t(s, dir, D), "lang")
    },
    "agg_token_stats" -> oracled(
      s"""SELECT CAST(SUM(wc) AS BIGINT) AS total_tokens,
         |  round(CAST(SUM(wc) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_tokens,
         |  MIN(wc) AS min_tokens, MAX(wc) AS max_tokens
         |FROM (SELECT CAST(${sqlWordCount("text")} AS BIGINT) AS wc FROM $D)""".stripMargin) {
      (s, dir) => DatasetEvaluators.tokenStats(t(s, dir, D), "text")
    },
    "agg_numeric_stats" -> oracled(
      """SELECT COUNT(o_totalprice) AS n,
        |  round(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(o_totalprice) AS DOUBLE), 6) AS mean,
        |  round(sqrt((CAST(SUM(CAST(o_totalprice AS DECIMAL(19,6)) * x) AS DOUBLE)
        |    - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE) /
        |      CAST(COUNT(o_totalprice) AS DOUBLE)) /
        |    (CAST(COUNT(o_totalprice) AS DOUBLE) - 1.0)), 6) AS stddev
        |FROM (SELECT o_totalprice, CAST(o_totalprice AS DECIMAL(18,6)) AS x FROM orders)""".stripMargin) {
      (s, dir) => DatasetEvaluators.numericStats(t(s, dir, "orders"), "o_totalprice")
    })

  // ---- driver contract ----------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
