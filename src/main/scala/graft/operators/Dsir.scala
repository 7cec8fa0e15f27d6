package graft.operators

import graft.functions.GraftFunctions
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
    * `logp = ln((cnt+1) / (total+buckets))`.
    *
    * ONE corpus scan: the bucket counts (≤ `buckets` rows after partial
    * aggregation) are collected and the smoothing arithmetic runs at the
    * driver — the previous lazy-composed form had two consumers of the
    * count aggregate (the bucket-fill join and the total), and Spark
    * re-evaluated the whole explode lineage per consumer; together with
    * the single-row-group sf0.1 scan artifact that made each fit two
    * single-task corpus passes (profiled 2×8 s where one parallel scan
    * does). The scan side is spread via the stats-gated
    * [[Dedup.spreadSmallInput]] (a no-op on real-scale inputs, where
    * parquet splits provide the parallelism). Same IEEE arithmetic
    * (`Math.log` IS Spark's `log`), so the oracle replay is unchanged.
    *
    * The per-document feature work runs in the single-pass
    * [[graft.functions.DsirBucketCounts]] kernel (one digest + one
    * primitive array slot per feature); what leaves each document is a
    * `buckets`-length count array, posexploded so position is the
    * bucket id — zero per-feature expression work after the kernel, and
    * the groupBy's map-side combine keeps the shuffle at `buckets` rows
    * per partition. The composed `explode(features)`→`md5`→groupBy form
    * re-materialized every feature as a row through the full Catalyst
    * expression stack: 521 s for one fit over the 250k-doc probe corpus
    * vs scan-speed here, same counts (BASELINE.md round-8 selection
    * probe). */
  def hashedLm(docs: DataFrame, buckets: Int = DefaultBuckets,
               textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    val counts = Dedup.spreadSmallInput(docs.select(col(textCol)))
      .select(posexplode(
        GraftFunctions.dsirBuckets(col(textCol), lit(buckets))))
      .toDF("bucket", "c")
      .groupBy("bucket").agg(sum(col("c")).as("cnt"))
      .filter(col("cnt") > 0)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    import spark.implicits._
    (0 until buckets).map { b =>
      val cnt = counts.getOrElse(b, 0L)
      (b.toLong, cnt,
        math.log((cnt + 1L).toDouble / (total + buckets.toLong).toDouble))
    }.toDF("bucket", "cnt", "logp")
  }

  /** Per-bucket log likelihood ratio `ln p_target(b) − ln p_raw(b)` of
    * two [[hashedLm]] fits — `buckets` rows, the broadcastable model. */
  def logRatio(target: DataFrame, raw: DataFrame): DataFrame =
    target.select(col("bucket"), col("logp").as("__lt"))
      .join(raw.select(col("bucket"), col("logp").as("__lr")), Seq("bucket"))
      .select(col("bucket"), (col("__lt") - col("__lr")).as("lr"))

  /** Per-document importance log-weight: `Σ_f lr[bucket(f)]` folded in
    * document order (rounded 4, the oracle compare precision).
    * Output `(idCol, dsir_logw, n_features)`; empty docs weigh 0.0.
    *
    * The ratio table (exactly `buckets` rows by [[hashedLm]]/[[logRatio]]
    * construction) collapses to a driver-side `Array[Double]` — the
    * query-LUT class of fetch — and scoring is the single-pass
    * [[graft.functions.DsirLogw]] expression: one digest + one array
    * index per feature. The composed HOF-fold alternative paid an
    * interpreted O(buckets) MAP scan per feature — measured 31.9 s vs
    * ~1 s on the sf0.1 corpus, same arithmetic. */
  def importanceWeights(docs: DataFrame, ratio: DataFrame,
                        buckets: Int = DefaultBuckets,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val byBucket = ratio.select(col("bucket").cast("long"), col("lr"))
      .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    require(byBucket.size == buckets,
      s"ratio table must cover all $buckets buckets, got ${byBucket.size}")
    val lr = Array.tabulate(buckets)(byBucket)
    docs
      .withColumn("__w",
        GraftFunctions.dsirLogw(col(textCol), typedLit(lr.toSeq)))
      .select(col(idCol),
        round(col("__w.logw"), 4).as("dsir_logw"),
        col("__w.n_features").as("n_features"))
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
