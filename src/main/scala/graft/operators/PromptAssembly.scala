package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prompt construction (SURVEY §2.8 F3,
  * `components/services/prompt_service.py:74-91,120-163`): numbered context
  * block `[Document i] (Source: f, Relevance: s)\n text` over ranked hits,
  * plus `{placeholder}` template substitution. Template text is cached at
  * the driver exactly like the reference caches template files (`:49-64`).
  */
object PromptAssembly {

  /** Shared entry format — used by both the distributed and driver-side
    * context builders so the two can't drift ("\n", not platform %n). */
  val EntryFormat = "[Document %d] (Source: %s, Relevance: %.2f)\n%s"

  /** Per-hit context entry; `doc_rank` must be 1-based (W2 ordering). */
  def contextEntry(rank: Column, source: Column, score: Column, text: Column): Column =
    format_string(EntryFormat, rank, source, score, text)

  /** Assemble one context block per query from ranked hits
    * (`(query_id, doc_rank, source, score, text)`). Order inside
    * `collect_list` is pinned by sorting the struct array on rank. */
  def contextBlocks(hits: DataFrame, queryIdCol: String = "query_id"): DataFrame =
    hits.groupBy(col(queryIdCol))
      .agg(array_sort(collect_list(struct(col("doc_rank"),
        contextEntry(col("doc_rank"), col("source"), col("score"), col("text"))
          .as("entry")))).as("entries"))
      .select(col(queryIdCol),
        concat_ws("\n\n", transform(col("entries"), e => e.getField("entry")))
          .as("context"))

  /** `str.format`-style template application with named placeholders. */
  def applyTemplate(template: String, vars: Map[String, String]): String =
    vars.foldLeft(template) { case (acc, (k, v)) => acc.replace(s"{$k}", v) }

  /** Driver-side template cache (reference caches template file reads). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def cachedTemplate(name: String, load: String => String): String =
    cache.computeIfAbsent(name, load(_))
  def clearTemplateCache(): Unit = cache.clear()
}
