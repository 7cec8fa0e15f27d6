package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical (keyword) retrieval over the corpus — the BM25 complement to
  * the engine's vector search path. The reference retrieves by embedding
  * only; a training-data pipeline also needs term-targeted corpus audits
  * ("every doc mentioning X", ranked) where lexical scoring is the tool,
  * so this ships as a first-class extension beside the ANN family, with
  * the same two-tier shape as vector search: a scan-time form
  * ([[bm25Search]]) and a prebuilt-index scale path ([[invertedIndex]] /
  * [[bm25SearchIndexed]], persisted bucketed like the IVF/LSH stores).
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
  * parenthesization the SQL oracle mirrors exactly; both search forms
  * share ONE score-expression builder so scan-time and indexed scores
  * are bit-identical.
  */
object LexicalSearch {

  /** Whitespace tokens of `text`, lowercased, empties dropped — the q56
    * tokenization contract (`[ \t\n\x0b\f\r]+` on both engines). */
  private def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  private def normTerms(queryTerms: Seq[String]): Seq[String] = {
    require(queryTerms.nonEmpty, "bm25 search needs at least one query term")
    queryTerms.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).distinct
  }

  /** The BM25 per-term score as ONE expression tree, shared by the
    * scan-time and indexed paths — identical structure means identical
    * float rounding, so an index rebuild can never flip a ranking
    * against the scan-time truth. All inputs integral columns. */
  private def bm25Term(tf: Column, dl: Column, df: Column, nd: Column,
                       sdl: Column, k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) + (nd.cast("double") - df.cast("double") + lit(0.5))
      / (df.cast("double") + lit(0.5)))
    val avgdl = sdl.cast("double") / nd.cast("double")
    idf * (tf.cast("double") * lit(k1 + 1.0)) /
      (tf.cast("double")
        + lit(k1) * (lit(1.0 - b) + lit(b) * (dl.cast("double") / avgdl)))
  }

  /** Shared tail of both search forms: term-sorted left fold of the
    * per-term scores (deterministic accumulation), (score desc, id asc)
    * top-k, 4-decimal rounding. Input: (idCol, __term, __s). */
  private def foldTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
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

  /** Top-`k` docs for `queryTerms` by BM25, with the score fold and
    * deterministic (score desc, id asc) tie-break. Output:
    * (idCol, score, n_terms — distinct query terms matched). */
  def bm25Search(docs: DataFrame, queryTerms: Seq[String], k: Int,
                 textCol: String = "text", idCol: String = "doc_id",
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val qt = normTerms(queryTerms)
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
      .withColumn("__s", bm25Term(col("__tf"), col("__dl"), col("__df"),
        col("__nd"), col("__sdl"), k1, b))
    foldTopK(scored, idCol, k)
  }

  // ==================================================================
  // Prebuilt-index scale path
  // ==================================================================

  /** Postings per shard row before the list splits ([[invertedIndex]]):
    * 1M entries ≈ 24 MB of (id, tf, dl) — bounded single-task state for
    * the `collect_list`, far under executor memory. */
  val DefaultPostingShard = 1L << 20

  /** One-row exact corpus statistics (nd = docs, sdl = total tokens) —
    * the denominator state [[bm25SearchIndexed]] broadcasts. Built
    * beside the index because the index alone cannot recover nd (docs
    * with zero tokens never reach a posting list). */
  def corpusStats(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs.select(tokens(col(textCol)).as("__toks"))
      .agg(count(lit(1)).cast("long").as("nd"),
        sum(size(col("__toks"))).cast("long").as("sdl"))

  /** Inverted index: `(term, shard, df, postings)` with postings an
    * id-sorted `array<struct<id, tf, dl>>`. Document length rides IN the
    * posting (impact-index style) so a search never joins back to the
    * corpus — the index + the one-row [[corpusStats]] are sufficient.
    *
    * Hot terms are the skew hazard: at corpus scale a stopword's posting
    * list is billions of entries — unboundable as ONE `collect_list`.
    * Postings therefore shard by id range (`floor(id / shardSize)`), so
    * per-task state is bounded at `shardSize` entries while the full
    * list survives across rows; `df` is the GLOBAL per-term count (a
    * window over the term's shard aggregates — term-level rows, cheap).
    * The default shard never splits at test scale (semantics identical);
    * size it so one shard row stays comfortably in a task at yours. */
  def invertedIndex(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id",
                    shardSize: Long = DefaultPostingShard): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive: $shardSize")
    val tfs = docs
      .select(col(idCol).cast("long").as("__id"), tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("long"))
      .select(col("__id"), col("__dl"), explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("__id"), col("__dl"))
      .agg(count(lit(1)).as("__tf"))
    tfs
      .withColumn("shard", floor(col("__id") / shardSize).cast("long"))
      .groupBy(col("term"), col("shard"))
      .agg(count(lit(1)).as("__sdf"),
        array_sort(collect_list(struct(col("__id").as("id"),
          col("__tf").cast("long").as("tf"), col("__dl").as("dl")))).as("postings"))
      .withColumn("df",
        sum(col("__sdf")).over(Window.partitionBy(col("term"))).cast("long"))
      .select(col("term"), col("shard"), col("df"), col("postings"))
  }

  /** Top-`k` BM25 via a prebuilt [[invertedIndex]] + [[corpusStats]] —
    * output contract identical to [[bm25Search]] (same kernel, same
    * fold, bit-identical scores). The only corpus-sized work left is the
    * index scan itself, and against a [[saveIndex]]ed table even that
    * prunes: the term filter selects buckets, not files-at-large. */
  def bm25SearchIndexed(index: DataFrame, stats: DataFrame,
                        queryTerms: Seq[String], k: Int,
                        idCol: String = "doc_id",
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val qt = normTerms(queryTerms)
    val matched = index
      .filter(col("term").isInCollection(qt))
      .select(col("term").as("__term"), col("df").as("__df"),
        explode(col("postings")).as("__p"))
      .select(col("__term"), col("__df"), col("__p.id").as(idCol),
        col("__p.tf").as("__tf"), col("__p.dl").as("__dl"))
    val scored = matched
      .crossJoin(broadcast(stats.select(col("nd").as("__nd"), col("sdl").as("__sdl"))))
      .withColumn("__s", bm25Term(col("__tf"), col("__dl"), col("__df"),
        col("__nd"), col("__sdl"), k1, b))
    foldTopK(scored, idCol, k)
  }

  /** Bucket count for [[saveIndex]]'s table. */
  val DefaultIndexBuckets = 64

  /** Deterministic catalog name for a saved index (metadata only; files
    * live under `path` — the [[Dedup.signatureStoreTable]] idiom). */
  def indexTable(path: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(path.getBytes("UTF-8")).take(6)
      .map(b => f"${b & 0xff}%02x").mkString
    s"graft_lex_index_$h"
  }

  /** Persist an [[invertedIndex]] + [[corpusStats]] as an on-disk index:
    * postings as an EXTERNAL bucketed table `CLUSTERED BY (term)` (term
    * filters — the only access path a search needs — prune to the query
    * terms' buckets instead of scanning the index; plan-asserted in
    * LexicalSearchSpec), stats as a one-row parquet sidecar. Returns the
    * table name; reopen in a fresh session with [[openIndex]]. */
  def saveIndex(index: DataFrame, stats: DataFrame, path: String,
                buckets: Int = DefaultIndexBuckets): String = {
    val spark = index.sparkSession
    val tbl = indexTable(path)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // Retry-safe: a killed prior build leaves a partial postings dir,
    // which CTAS refuses (non-empty location) — a rebuild must clobber
    // it, not require manual cleanup.
    val postings = new org.apache.hadoop.fs.Path(s"$path/postings")
    postings.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(postings, true)
    // One file per bucket: repartition with the bucket spec's own
    // hash+modulus so each write task owns exactly one bucket id.
    index.repartition(buckets, col("term"))
      .write.bucketBy(buckets, "term").sortBy("term")
      .option("path", s"$path/postings").saveAsTable(tbl)
    stats.coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    tbl
  }

  /** Reopen a [[saveIndex]]ed index: (postings table, stats). Re-issues
    * the external-table DDL if the catalog lost it (fresh session) —
    * the data needs no rewrite. */
  def openIndex(spark: SparkSession, path: String,
                buckets: Int = DefaultIndexBuckets): (DataFrame, DataFrame) = {
    val tbl = indexTable(path)
    if (!spark.catalog.tableExists(tbl)) {
      spark.sql(
        s"""CREATE TABLE $tbl (term STRING, shard BIGINT, df BIGINT,
           |  postings ARRAY<STRUCT<id: BIGINT, tf: BIGINT, dl: BIGINT>>)
           |USING PARQUET
           |CLUSTERED BY (term) SORTED BY (term) INTO $buckets BUCKETS
           |LOCATION '$path/postings'""".stripMargin)
    }
    (spark.table(tbl), spark.read.parquet(s"$path/stats"))
  }

  // ==================================================================
  // Rank fusion
  // ==================================================================

  /** Reciprocal-rank fusion of top-k rankings (lexical + vector is the
    * canonical pair): `rrf = Σ_r 1/(rrfK + rank_r)`, summed in the given
    * Seq order (fixed-order double accumulation — deterministic), docs
    * absent from a ranking contribute 0. Output: (idCol, rrf rounded to
    * 6, rank_<name> per input, nulls where absent), top-k by (rrf desc,
    * id asc).
    *
    * Inputs are (id, rank) frames — TOP-K OUTPUTS, driver-small by
    * construction; the fusion is a chain of tiny outer joins that AQE
    * broadcasts, never a corpus-side operation. Rank ties upstream must
    * already be broken deterministically (rank on a ROUNDED score then
    * id — see q67's construction — so a sub-ULP cross-engine difference
    * in raw scores cannot flip a rank). */
  def rrfFuse(rankings: Seq[(String, DataFrame)], k: Int,
              idCol: String = "doc_id", rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, s"k must be positive: $k")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranking names must be distinct")
    val named = rankings.map { case (name, df) =>
      df.select(col(idCol), col("rank").cast("long").as(s"rank_$name"))
    }
    val joined = named.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val rrf = rankings.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(rrfK).cast("double") + col(s"rank_$name").cast("double")),
        lit(0.0))
    }.reduce(_ + _)
    joined.withColumn("rrf", round(rrf, 6))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol) +: col("rrf") +:
        rankings.map { case (name, _) => col(s"rank_$name") }: _*)
  }
}
