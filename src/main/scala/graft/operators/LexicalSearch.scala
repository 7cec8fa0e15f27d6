package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical (keyword) retrieval over the corpus — the BM25 complement to
  * the engine's vector search path. The reference retrieves by embedding
  * only; a training-data pipeline also needs term-targeted corpus audits
  * ("every doc mentioning X", ranked) where lexical scoring is the tool,
  * so this ships as a first-class extension beside the ANN family.
  *
  * Okapi BM25 (Robertson/Spärck Jones; the Lucene-style
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf that keeps weights positive),
  * default k1 = 1.2, b = 0.75.
  *
  * Scale shape (nothing here is per-query-term quadratic):
  *  - document lengths ride the corpus scan as a narrow projection;
  *  - only QUERY-term occurrences are exploded (the HOF prefilter runs
  *    inside the scan projection, so the explode emits a few rows per
  *    doc, not the whole token stream);
  *  - df and the corpus length stats are tiny aggregates, broadcast
  *    back; the per-doc fold is one groupBy on the (sparse) matched set.
  *
  * Cross-engine determinism: per-doc scores fold LEFT-TO-RIGHT over
  * term-sorted per-term scores (`aggregate` over
  * `array_sort(collect_list(...))`) — a plain SUM's unspecified
  * accumulation order can differ by an ULP and flip a rounded oracle
  * boundary (the q62 lesson). All arithmetic is double with a fixed
  * parenthesization the SQL oracle mirrors exactly.
  */
object LexicalSearch {

  /** Whitespace tokens of `text`, lowercased, empties dropped — the q56
    * tokenization contract (`[ \t\n\x0b\f\r]+` on both engines). */
  private def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Top-`k` docs for `queryTerms` by BM25, with the score fold and
    * deterministic (score desc, id asc) tie-break. Output:
    * (idCol, score, n_terms — distinct query terms matched). */
  def bm25Search(docs: DataFrame, queryTerms: Seq[String], k: Int,
                 textCol: String = "text", idCol: String = "doc_id",
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Search needs at least one query term")
    require(k > 0, s"k must be positive: $k")
    val qt = queryTerms.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).distinct
    val withDl = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")))
    // Corpus stats: exact integer sums, divided once in double.
    val stats = withDl.agg(count(lit(1)).as("__nd"), sum("__dl").as("__sdl"))
    val matched = withDl
      .select(col(idCol), col("__dl"),
        explode(filter(col("__toks"), t => t.isInCollection(qt))).as("__term"))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfs = matched.groupBy("__term")
      .agg(countDistinct(col(idCol)).as("__df"))
    val scored = matched
      .join(broadcast(dfs), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__nd").cast("double") - col("__df").cast("double") + lit(0.5))
          / (col("__df").cast("double") + lit(0.5))))
      .withColumn("__avgdl", col("__sdl").cast("double") / col("__nd").cast("double"))
      .withColumn("__s",
        col("__idf") * (col("__tf").cast("double") * lit(k1 + 1.0))
          / (col("__tf").cast("double")
            + lit(k1) * (lit(1.0 - b) + lit(b) * (col("__dl").cast("double") / col("__avgdl")))))
    scored.groupBy(col(idCol))
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("__term"), col("__s")))),
            s => s.getField("__s")),
          lit(0.0), (acc, x) => acc + x).as("__score"),
        count(lit(1)).cast("long").as("n_terms"))
      .orderBy(col("__score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("__score"), 4).as("score"), col("n_terms"))
  }
}
