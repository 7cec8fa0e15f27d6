package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * pipelines: membership depends only on (salt, key) — stable across
  * runs, executors, partitionings, and engines, which is what makes a
  * held-out set actually held out. Never `rand()`: a nondeterministic
  * sample re-drawn under task retry silently leaks rows across splits.
  *
  * The uniform draw is the first 8 lowercase hex chars of
  * `md5(salt:key)`. At fixed width, lexicographic order IS numeric
  * order, so thresholds are plain string compares — exact in any engine
  * with md5, no float rounding at the boundaries.
  *
  * Scale shape: a narrow per-row predicate over the scan — no shuffle,
  * no state, pushes down like any filter.
  */
object Sampling {

  /** 8-hex-char uniform bucket of (salt, key). */
  def hashBucket(key: Column, salt: String): Column =
    substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 8)

  /** The hex threshold below which a bucket falls with probability `p`. */
  def thresholdHex(p: Double): String = {
    require(p >= 0 && p <= 1, s"fraction out of [0,1]: $p")
    f"${math.min((p * (1L << 32)).toLong, (1L << 32) - 1)}%08x"
  }

  /** Keep ~`fraction` of rows, deterministically. `fraction = 1.0` is
    * the identity — special-cased because the threshold caps at
    * "ffffffff", which a hash bucket can equal (p = 2⁻³² per row; at
    * corpus scale that silently drops real rows). */
  def deterministicSample(df: DataFrame, fraction: Double,
                          keyCol: String = "doc_id",
                          salt: String = "sample"): DataFrame =
    if (fraction >= 1.0) { thresholdHex(fraction); df } // still validates range
    else df.filter(hashBucket(col(keyCol), salt) < lit(thresholdHex(fraction)))

  /** [[thresholdHex]] with an open top end: fraction 1.0 maps to "g",
    * which is lexicographically above every 8-hex bucket — the identity
    * without the 2⁻³² "ffffffff" edge. Validates BEFORE branching so a
    * mis-scaled weight (75 meaning 75%) throws instead of silently
    * keeping the whole stratum. */
  def thresholdHexOpen(p: Double): String = {
    require(p >= 0 && p <= 1, s"fraction out of [0,1]: $p")
    if (p >= 1.0) "g" else thresholdHex(p)
  }

  /** Per-stratum deterministic sampling — the data-MIXING primitive:
    * resample each shard (source, language, quality bucket) to its
    * target weight in one pass. Same salted-hash membership as
    * [[deterministicSample]], so mixtures are reproducible and a row's
    * draw never changes when other strata's weights do. Strata absent
    * from `fractions` are dropped (weight 0). Still a pure scan
    * predicate: no shuffle, no state. */
  def stratifiedSample(df: DataFrame, fractions: Map[String, Double],
                       strataCol: String = "source",
                       keyCol: String = "doc_id",
                       salt: String = "mix"): DataFrame = {
    require(fractions.nonEmpty, "at least one stratum fraction required")
    // deterministic when-chain order (sorted keys) — Map iteration order
    // must never influence the plan
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(lit(null).cast("string")) {
      case (acc, (k, f)) =>
        when(col(strataCol) === k, lit(thresholdHexOpen(f))).otherwise(acc)
    }
    // the explicit isin is redundant with thr.isNotNull but, unlike a
    // CASE, it is a PUSHABLE predicate: the parquet scan skips row
    // groups of dropped strata entirely (PushedFilters: In(strataCol))
    df.filter(col(strataCol).isInCollection(fractions.keys.toSeq.sorted))
      .filter(thr.isNotNull && hashBucket(col(keyCol), salt) < thr)
  }

  /** Reproducible split assignment: adds a `split` column. `splits` are
    * (name, fraction) in order; fractions must sum to 1 (±1e-9) — the
    * last split takes the remainder of the hash range so no row is ever
    * unassigned by a float boundary. */
  /** Temperature-reweighted domain mixing weights: per domain d,
    * `weight_d = n_d^alpha / Σ_d n_d^alpha` — the standard α-temperature
    * rebalance a multi-source training mix uses (α < 1 upweights small
    * domains toward uniform; α = 1 is proportional; α = 0 uniform).
    * Output: (domain, n_docs, weight), one row per domain.
    *
    * Scale shape: one map-side-combined count per domain (the only
    * corpus-wide work), then all per-domain math on the domain-count
    * frame — domains ≪ corpus by definition, so the single-partition
    * normalization window is a few-row fold, not a scale risk.
    *
    * Float-parity note (oracle-checked queries): the normalizing total is
    * an ORDERED unbounded window sum, not a scalar aggregate — both
    * engines fold the domain rows in the same (domain-sorted) order, so
    * the double total is bitwise reproducible; a groupBy total would sum
    * in partition-arrival order and wobble in the last ulp. */
  def mixWeights(df: DataFrame, domainCol: String, alpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha >= 0, s"negative temperature exponent: $alpha")
    val w = Window.orderBy(domainCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.groupBy(col(domainCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("__s", pow(col("n_docs").cast("double"), lit(alpha)))
      .withColumn("weight", col("__s") / sum(col("__s")).over(w))
      .drop("__s")
  }

  /** Integer mixture quotas: apportion a total `budget` (docs, tokens,
    * sequences — the unit is the caller's) over [[mixWeights]]'
    * temperature weights by LARGEST-REMAINDER rounding, so the quotas
    * are integers that sum to the budget EXACTLY — what a mix executor
    * actually consumes (fractional weights under-/over-fill shards).
    *
    * Determinism chain: the weight is q72's replayable construction
    * (correctly-rounded `pow` at α, ordered window sum), `raw = w·B`
    * and `floor(raw)` are single IEEE ops, the leftover
    * `B − Σ floor(raw)` distributes by (fractional part DESC, domain
    * ASC) — every comparison on bit-identical doubles, so the quota
    * table replays exactly in SQL. Domain-table-sized throughout (one
    * groupBy exchange, then windows over ≤ |domains| rows). */
  def mixQuotas(df: DataFrame, domainCol: String, alpha: Double,
                budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, s"negative budget: $budget")
    val all = Window.orderBy(domainCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val byFrac = Window.orderBy(col("__frac").desc, col(domainCol).asc)
    mixWeights(df, domainCol, alpha)
      .withColumn("__raw", col("weight") * lit(budget.toDouble))
      .withColumn("__base", floor(col("__raw")).cast("long"))
      .withColumn("__frac", col("__raw") - col("__base").cast("double"))
      .withColumn("__left", lit(budget) - sum(col("__base")).over(all))
      .withColumn("quota",
        col("__base") + when(row_number().over(byFrac) <= col("__left"), 1L)
          .otherwise(0L))
      .select(col(domainCol), col("n_docs"), col("weight"), col("quota"))
  }

  /** Cluster-balanced subsample: at most `perCell` members from each IVF
    * cell of an embedding corpus — the diversity-preserving selection of
    * cluster-based data-pruning pipelines (pick evenly across semantic
    * clusters instead of letting dense modes dominate a uniform draw).
    * Deterministic: within a cell, the salted-md5 draw order used by
    * every sampler here (ties → lowest id), so the selection is
    * reproducible and independent of partitioning.
    *
    * Scale: cell assignment is the codegen kernel; the per-cell
    * row_number shuffles on `cell_id` once; output is ≤ ncells·perCell
    * rows. The corpus text is NOT carried through the window — join the
    * returned ids back when payloads are needed (the knnScores narrow
    * contract). */
  def clusterBalancedSample(emb: DataFrame, ivf: IvfIndex.Ivf, perCell: Int,
                            idCol: String = "doc_id",
                            embCol: String = "embedding",
                            salt: String = "balance"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cell_id")
      .orderBy(hashBucket(col(idCol), salt).asc, col(idCol).asc)
    IvfIndex.assign(emb, ivf, embCol)
      .select(col(idCol), col("cell_id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= perCell)
      .select(col(idCol), col("cell_id").cast("long").as("cell_id"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Exact-quota stratified sample: EXACTLY `ceil(fraction · n_s)` rows
    * from each stratum s (vs [[stratifiedSample]]'s hash-threshold draw,
    * which is only right in expectation — fine for mixing weights, wrong
    * for "give me a 1000-doc eval slice per language"). Selection order
    * within a stratum is the salted-md5 draw every sampler here uses
    * (ties → lowest key), so the sample is reproducible, independent of
    * partitioning, and STABLE under fraction growth: raising the
    * fraction only ever ADDS rows (the draw order is fraction-free) —
    * the property that lets a pipeline grow an eval set without
    * invalidating the old one.
    *
    * Scale: one shuffle on the stratum key; each window partition is one
    * stratum (languages/sources — thousands at most, each corpus/strata
    * sized). A stratum too large for one task means quota sampling at
    * that granularity is the wrong tool — use [[stratifiedSample]]'s
    * scan predicate instead. */
  def stratifiedQuotaSample(df: DataFrame, fraction: Double,
                            strataCol: String = "lang",
                            keyCol: String = "doc_id",
                            salt: String = "quota"): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction out of (0,1]: $fraction")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(hashBucket(col(keyCol), salt).asc, col(keyCol).asc)
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(strataCol)
    df.withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__r") <= ceil(col("__n").cast("double") * lit(fraction)))
      .drop("__r", "__n")
  }

  /** Execute a quota table ([[mixQuotas]]' output or any frame carrying
    * (domain, quota)): per domain, keep the first `quota` rows of the
    * salted-md5 draw order — the deterministic mix EXECUTOR. A domain
    * with fewer rows than its quota yields what it has (the shortfall is
    * the caller's audit signal — see q185). Quotas are
    * domain-table-sized and broadcast; the corpus pays one per-domain
    * rank window.
    *
    * Returns exactly `df`'s columns: the quota frame is projected to
    * (domain, quota) before the join and both bookkeeping columns are
    * dropped afterwards, so extra columns of a [[mixQuotas]] output
    * (n_docs, weight) never leak into the sample
    * (SamplingSpec "drawQuotas returns only corpus columns"). */
  def drawQuotas(df: DataFrame, quotas: DataFrame, domainCol: String,
                 keyCol: String = "doc_id",
                 salt: String = "mix"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(domainCol)
      .orderBy(hashBucket(col(keyCol), salt).asc, col(keyCol).asc)
    df.join(broadcast(quotas.select(col(domainCol), col("quota"))),
        Seq(domainCol))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= col("quota"))
      .drop("__r", "quota")
  }

  /** Efraimidis–Spirakis weighted-sampling-without-replacement draw key,
    * INTEGER-EXACT: a row with integer weight `w ≥ 1` holds `w` salted
    * md5 "tickets" and its key is the MIN of them; ranking rows
    * ascending by (ticket, key) is distributionally EXACT E–S WOR
    * sampling — the min of w iid uniforms is Beta(1, w), whose
    * ascending order is the descending order of E–S's u^(1/w) keys
    * (CDF xʷ) — with none of the cross-engine pow/log last-ulp risk a
    * float u^(1/w) carries (the q136 integer-exactness stance applied
    * to sampling). One projection per row (no explode, no shuffle);
    * selection of the top-k is a TakeOrdered. Cost is O(w) per row —
    * the intended regime is small integer weights (quality buckets,
    * length tiers); for huge weights the production path switches to
    * the float exponential-race key, losing oracle exactness only.
    * `weightCol` must be ≥ 1: `sequence(1, 0)` DESCENDS in Spark, so a
    * zero weight would silently mint tickets instead of excluding the
    * row — callers clamp or filter first. */
  def esTicket(keyCol: Column, weightCol: Column, salt: String): Column =
    array_min(transform(sequence(lit(1), weightCol.cast("int")),
      j => conv(substring(md5(concat_ws(":", lit(salt), keyCol.cast("string"),
        j.cast("string"))), 1, 15), 16, 10).cast("long")))

  /** Capped water-filling allocation over a (source, cap, w) table —
    * see q250's docstring for the algorithm contract: single sorted
    * pass, integer cross-multiplied saturation test, floor + name-order
    * remainder apportionment; Σ alloc = min(budget, Σ cap). All
    * BIGINT — bit-exact on any engine. The table is mixture-sized
    * (driver-tiny — the unpartitioned windows are deliberate);
    * executing the resulting quotas is [[drawQuotas]]. Requires
    * `cap ≥ 1` and `w ≥ 1` per row (ANSI division; a zero weight has
    * no water-fill meaning — drop such sources first). */
  def waterfill(src: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ratioOrd = Window
      .orderBy((col("cap").cast("double") / col("w")).asc, col("source"))
    val cum = ratioOrd.rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    src
      .withColumn("cumcap", coalesce(sum("cap").over(cum), lit(0L)))
      .withColumn("cumw", coalesce(sum("w").over(cum), lit(0L)))
      .withColumn("totcap", sum("cap").over(all))
      .withColumn("totw", sum("w").over(all))
      .withColumn("bb", least(lit(budget), col("totcap")))
      .withColumn("sat", col("bb") === col("totcap") ||
        col("cap") * (col("totw") - col("cumw")) <=
          col("w") * (col("bb") - col("cumcap")))
      .withColumn("satcap",
        sum(when(col("sat"), col("cap")).otherwise(0L)).over(all))
      .withColumn("wunsat",
        sum(when(col("sat"), 0L).otherwise(col("w"))).over(all))
      .withColumn("base", when(col("sat"), col("cap"))
        .otherwise(expr("(w * (bb - satcap)) div wunsat")))
      .withColumn("rfloor", col("bb") - col("satcap") -
        sum(when(col("sat"), 0L).otherwise(
          expr("(w * (bb - satcap)) div wunsat"))).over(all))
      .withColumn("rn",
        row_number().over(Window.partitionBy("sat").orderBy("source")))
      .select(col("source"), col("cap"), col("w"),
        col("sat").cast("long").as("saturated"),
        (col("base") + when(!col("sat") && col("rn") <= col("rfloor"), 1L)
          .otherwise(0L)).cast("long").as("alloc"))
  }

  def assignSplit(df: DataFrame, splits: Seq[(String, Double)],
                  keyCol: String = "doc_id",
                  salt: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions must sum to 1: $total")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val h = hashBucket(col(keyCol), salt)
    val assigned = splits.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cumP)) =>
        val thr = lit(thresholdHex(cumP))
        Some(acc.fold(when(h < thr, name))(_.when(h < thr, name)))
    }.get.otherwise(splits.last._1)
    df.withColumn("split", assigned)
  }
}
