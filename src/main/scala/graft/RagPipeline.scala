package graft

import graft.functions.{GraftFunctions, HashEmbedder}
import graft.operators.{PromptAssembly, VectorSearch}
import graft.streaming.EventLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The System-1 query lifecycle (SURVEY §3.1) as one public API: config →
  * embed query → exact k-NN over the corpus → dynamic (or fixed) threshold
  * retrieval → numbered context block → progress events. A user of the
  * reference's `rag_system.query(...)` switches to
  * `RagPipeline.query(spark, corpus, text)`; the LLM call on the assembled
  * prompt stays external by design (S9).
  */
object RagPipeline {

  final case class RetrievedDoc(docId: Long, text: String, source: String,
                                score: Double, rank: Int)
  final case class QueryResult(
      query: String,
      docs: Seq[RetrievedDoc],
      stats: VectorSearch.ThresholdStats,
      contextBlock: String,
      events: DataFrame)

  /** Attach an `embedding` column to a text corpus (idempotent helper). */
  def embedCorpus(corpus: DataFrame, textCol: String = "text",
                  dim: Int = HashEmbedder.DefaultDim): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    if (corpus.columns.contains("embedding")) corpus
    else corpus.withColumn("embedding",
      GraftFunctions.hashEmbed(col(textCol), lit(dim)))
  }

  /** One interactive query end-to-end. `corpus` needs (doc_id, text,
    * source[, embedding]) — embeddings are derived when absent. */
  def query(spark: SparkSession, corpus: DataFrame, queryText: String,
            config: GraftConfig = GraftConfig(),
            queryId: Long = 0L,
            textCol: String = "text", sourceCol: String = "source"): QueryResult = {
    val r = config.retrieval
    val embedded = embedCorpus(corpus, textCol, config.embedding.dimension)
    val qVec = HashEmbedder.embed(queryText, config.embedding.dimension)
    val top = VectorSearch.knnSingle(embedded, qVec, r.topK)
      .select(col("doc_id"), col(textCol), col(sourceCol), col("score"))
      .collect()
    val scores = top.map(_.getDouble(3)).toSeq
    val stats =
      if (r.dynamicEnabled) VectorSearch.dynamicThresholdSelect(scores, r.hitTarget, r.step)
      else {
        // fixed mode (P6): a one-step "grid" at the configured threshold
        val hits = scores.count(_ >= r.similarityThreshold)
        VectorSearch.ThresholdStats(r.hitTarget, r.step,
          r.similarityThreshold, hits, target_reached = hits >= r.hitTarget,
          attempts = 1, progression = Seq(VectorSearch.ThresholdAttempt(
            r.similarityThreshold, hits, hits >= r.hitTarget)))
      }
    val docs = top.toSeq
      .filter(_.getDouble(3) >= stats.final_threshold)
      .zipWithIndex
      .map { case (row, i) => RetrievedDoc(row.getLong(0), row.getString(1),
        row.getString(2), row.getDouble(3), i + 1) }
    val context = docs.map(d =>
      f"[Document ${d.rank}] (Source: ${d.source}, Relevance: ${d.score}%.2f)%n${d.text}")
      .mkString("\n\n")
    QueryResult(queryText, docs, stats, context,
      EventLog.retrievalEvents(spark, queryId, stats))
  }

  /** Assemble the final prompt from a template with `{query}` / `{context}`
    * placeholders (F3). */
  def buildPrompt(template: String, result: QueryResult): String =
    PromptAssembly.applyTemplate(template,
      Map("query" -> result.query, "context" -> result.contextBlock))
}
