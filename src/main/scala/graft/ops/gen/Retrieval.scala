package graft.ops.gen

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.core.Op
import graft.serving.{LLMMap, ServingClient}
import graft.ops.sim.Similarity

/** Retrieval-augmented generation
  * (`core_text/generate/retrieval_generator.py:11-70`): answer each query
  * with knowledge-base context. The reference delegates retrieval to a
  * LightRAG serving instance; the Spark-native seam is a corpus DataFrame
  * with text — queries and corpus are embedded through the SAME serving
  * client, the top-k neighbors come from the distributed cosine top-k
  * (brute-force here; swap `Similarity.lshTopK` at corpus scale), and the
  * retrieved contexts join back rank-ordered into the generation prompt.
  * Every stage is a DataFrame op: embedding is a narrow mapPartitions,
  * retrieval shuffles candidates not the corpus, generation is narrow. */
final case class RetrievalGenerator(queryKey: String, outputKey: String,
    corpus: DataFrame, corpusTextKey: String, corpusIdKey: String,
    serving: ServingClient, k: Int = 1, idKey: String = "doc_id",
    systemPrompt: String = "RAG") extends Op {
  val name = "retrieval_generator"
  val inputKeys = Seq(queryKey, idKey)
  val outputKeys = Seq(outputKey)

  def apply(df: DataFrame): DataFrame = {
    val qEmb = LLMMap.embedded(
      df.select(col(idKey), col(queryKey)), queryKey, "__emb", serving)
    val cEmb = LLMMap.embedded(
      corpus.select(col(corpusIdKey).as(idKey), col(corpusTextKey)),
      corpusTextKey, "__emb", serving)
    // a corpus row sharing the query's id is excluded by the top-k (the
    // query document never retrieves itself)
    val topk = Similarity.bruteForceTopK(cEmb, qEmb, "__emb", idKey, k)
    // rank-ordered context per query
    val ctx = topk
      .join(cEmb.select(col(idKey).as("neighbor_id"),
        col(corpusTextKey).as("__ctx")).hint("merge"), Seq("neighbor_id"))
      .groupBy(col("query_id").as(idKey))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rank"), col("__ctx")))),
        s => s("__ctx")), " | ").as("__context"))
    // merge hints (both joins): topk×corpus and df×per-query-aggregate
    // pair corpus-scaled sides whose static estimates can pick broadcast
    val prompted = df.join(ctx.hint("merge"), Seq(idKey), "left")
      .withColumn("__p",
        concat(coalesce(col("__context"), lit("")), lit(" <SEP> "), col(queryKey)))
    LLMMap.generated(prompted, "__p", outputKey, serving, systemPrompt)
      .drop("__p", "__context")
  }
}
