package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance resampling toward a target
  * distribution over hashed n-gram features (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"): fit two
  * bag-of-hashed-ngram unigram LMs (target corpus, raw corpus), weight
  * every raw document by its log likelihood ratio, and resample by
  * Gumbel top-k. The standard way to slice "looks like my target
  * domain" out of a web-scale crawl.
  *
  * Scale shape (the reason DSIR works at 100 TB where classifiers
  * don't): the ONLY corpus-wide aggregations are the two bucket-count
  * fits — `buckets` rows each after partial aggregation, regardless of
  * corpus size. Everything per-document is a narrow single-pass scan:
  * the log-ratio table folds to one broadcast map row
  * ([[TextAnalysis.lmScore]]'s posture) and the weight is a per-row
  * fold over the doc's features in document order — no explode, no
  * shuffle, no state. Selection is either a TakeOrdered top-k or a
  * threshold filter, both shuffle-free.
  *
  * Determinism, for the oracle and for retry-safety: feature hashing
  * and the Gumbel noise are md5-derived (no `rand()`), and every fold
  * runs in document order on both engines. */
object Dsir {
  val DefaultBuckets = 256

  /** Word unigram + bigram features in document order (unigrams first,
    * then bigrams), tokenized exactly like the LM-quality family
    * (lowercase, `\s+` split, empties dropped). */
  def features(textCol: Column): Column = {
    val toks = filter(split(lower(trim(textCol)), "\\s+"), t => length(t) > 0)
    val bis = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(toks, bis)
  }

  /** Feature → bucket: first 8 hex chars of md5 (32 bits, the engine's
    * oracle-replicable hash idiom) mod `buckets`. */
  def bucketOf(f: Column, buckets: Int): Column =
    conv(substring(md5(f.cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Hashed-feature unigram LM: `(bucket, cnt, logp)` with add-1
    * smoothing over all `buckets` rows (absent buckets carry cnt 0, so
    * the ratio table downstream is total — no OOV path needed).
    * `logp = ln((cnt+1) / (total+buckets))`. */
  def hashedLm(docs: DataFrame, buckets: Int = DefaultBuckets,
               textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(explode(features(col(textCol))).as("f"))
      .select(bucketOf(col("f"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(coalesce(sum("cnt"), lit(0L)).cast("long").as("__total"))
    docs.sparkSession.range(buckets).toDF("bucket")
      .join(counts, Seq("bucket"), "left")
      .crossJoin(broadcast(total))
      .select(col("bucket"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("__total") + lit(buckets.toLong)).cast("double")).as("logp"))
  }

  /** Per-bucket log likelihood ratio `ln p_target(b) − ln p_raw(b)` of
    * two [[hashedLm]] fits — `buckets` rows, the broadcastable model. */
  def logRatio(target: DataFrame, raw: DataFrame): DataFrame =
    target.select(col("bucket"), col("logp").as("__lt"))
      .join(raw.select(col("bucket"), col("logp").as("__lr")), Seq("bucket"))
      .select(col("bucket"), (col("__lt") - col("__lr")).as("lr"))

  /** Per-document importance log-weight: `Σ_f lr[bucket(f)]` folded in
    * document order (rounded 4, the oracle compare precision).
    * Output `(idCol, dsir_logw, n_features)`; empty docs weigh 0.0. */
  def importanceWeights(docs: DataFrame, ratio: DataFrame,
                        buckets: Int = DefaultBuckets,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val rmap = broadcast(ratio.agg(
      map_from_entries(collect_list(struct(col("bucket"), col("lr"))))
        .as("__rmap")))
    docs.crossJoin(rmap)
      .withColumn("__f", features(col(textCol)))
      .select(col(idCol),
        round(aggregate(col("__f"), lit(0.0),
          (acc, f) => acc + element_at(col("__rmap"), bucketOf(f, buckets))), 4)
          .as("dsir_logw"),
        size(col("__f")).cast("long").as("n_features"))
  }

  /** Gumbel top-`k` resample over [[importanceWeights]]: rank by
    * `logw + g` where `g = −ln(−ln(u))` and `u` is an md5-derived
    * uniform in (0,1) keyed on `(salt, id)` — 13 hex chars = 52 bits,
    * exactly representable in a double, so the draw is reproducible
    * across retries and engines (the paper's without-replacement
    * sampler; deterministic-noise variant of the q53 sampling
    * posture). Zero-shuffle TakeOrdered. */
  def gumbelTopK(weights: DataFrame, k: Int, salt: String,
                 idCol: String = "doc_id",
                 wCol: String = "dsir_logw"): DataFrame = {
    val u = (conv(substring(md5(
        concat_ws(":", lit(salt), col(idCol).cast("string")).cast("binary")),
        1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(math.pow(2.0, 52))
    val g = -log(-log(u))
    weights
      .withColumn("gumbel_key", col(wCol) + g)
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(k)
  }
}
