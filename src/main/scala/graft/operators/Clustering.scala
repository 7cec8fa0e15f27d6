package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FAISS `Clustering` (faiss/Clustering.cpp, the `kmeans_clustering`
  * entry) as a first-class engine op: Lloyd's k-means with the training
  * loop itself under the oracle gate — not just the trained artifact
  * (the IVF family gates artifacts; q136 gates the TRAINING).
  *
  * Everything is deterministic and cross-engine replayable:
  *  - INIT: the k lowest-id vectors (FAISS samples a random permutation;
  *    this is the engine's reproducible analog — same posture as the
  *    salted draws of q53/q95, with the identity permutation).
  *  - ASSIGN: the shared [[graft.functions.GraftFunctions.nearestCentroidF32]]
  *    codegen kernel — sequential double accumulation, ties to the
  *    lowest cell, bit-replicable in SQL.
  *  - UPDATE: centroid coordinates are INTEGER-EXACT means — per-element
  *    `floor(x·1e6 + 0.5)` scaled longs, summed distributively (exact,
  *    associative — a double sum over a shuffle is addition-order
  *    nondeterministic), divided once at the driver:
  *    `sum / (n · 1e6)` in IEEE double. The 1e-6 coordinate quantization
  *    is far inside float32's own mantissa at embedding magnitudes, and
  *    it buys bit-identical centroids on any partitioning AND in the
  *    DuckDB replay — so iteration i+1's assignment can never diverge.
  *  - EMPTY CELLS keep their previous centroid (FAISS splits the largest
  *    cluster; that rule needs a tiebreak chain the replay can't state
  *    cheaply — the keep rule is the deterministic simplification, and
  *    a kept centroid is still a valid Voronoi site).
  *  - OBJECTIVE (FAISS `ClusteringIterationStats.obj`): per-cell sum of
  *    squared distances under the decimal idiom (`round(d2, 6)` →
  *    DECIMAL(22,6) → exact sum), reported per iteration.
  *
  * Scale shape: each iteration is two passes — one k-row aggregate for
  * (n, obj), one (cell, dim)-grained partial-sum exchange (k·d rows out
  * of the map side, corpus never shuffled) — and one k·d-double driver
  * round-trip, exactly FAISS's train loop with the sample replaced by
  * the full corpus. At 100 TB you train on a sample (FAISS's own
  * posture, `max_points_per_centroid`); pass a sampled frame in.
  */
object Clustering {

  final case class LloydStat(iter: Int, cell: Int, n: Long, obj: Double)
  final case class LloydResult(centroids: Array[Array[Double]],
                               history: Seq[LloydStat])

  /** Squared L2 to the assigned centroid, in the kernel's exact
    * accumulation order (zip → per-dim squared diff → left fold). */
  private def d2Col(emb: Column, centsLit: Column, cell: Column): Column =
    aggregate(
      zip_with(emb, element_at(centsLit, cell + lit(1)),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (acc, e) => acc + e)

  /** Run `iters` Lloyd iterations from the deterministic init; returns
    * the final centroids plus the per-(iteration, cell) occupancy and
    * objective history.
    *
    * `spherical = true` is FAISS's `ClusteringParameters.spherical`
    * (faiss/Clustering.cpp): each updated centroid is L2-normalized
    * after the mean — the right quantizer geometry when the index
    * metric is inner product / cosine (the engine's IVF probe rule),
    * where an un-normalized mean systematically under-weights dense
    * cells. The norm is computed in double from the integer-exact mean
    * coordinates (sequential fold), so normalized centroids stay
    * bit-replicable; a zero-norm mean keeps the unnormalized zero
    * vector (division guard). Assignment stays squared-L2 argmin — for
    * unit-norm centroids that is the cosine argmax up to the point's
    * own norm, FAISS's own equivalence. */
  /** `weightCol` is FAISS `Clustering::train_encoded`'s per-point
    * sample weight, restricted to INTEGER multiplicities — the case a
    * data pipeline actually has: train the quantizer on deduplicated
    * representatives weighted by how many copies each one stands for,
    * and the solution is IDENTICAL to training on the un-deduped corpus
    * (each rep's contribution multiplies instead of repeating). Integer
    * weights keep every update exact: weighted sums stay BIGINT
    * (`Σ w·x̂` with `x̂ = floor(x·1e6 + 0.5)`), the mean divides once in
    * IEEE double, and the weighted objective uses the same scaled-long
    * trick (`Σ w·floor(d2·1e6 + 0.5)`, one division at the end) —
    * bit-replicable on any partitioning and in the SQL replay, where a
    * float-weighted sum would be addition-order nondeterministic.
    * Overflow headroom: per (cell, dim), `Σ w·|x̂|` must stay under
    * 2⁶³ — at |x| ≤ 128 that is ~7·10¹⁰ of total weight mass, far above
    * any training sample (FAISS itself trains on at most
    * `k·max_points_per_centroid` points). */
  def lloyd(corpus: DataFrame, k: Int, iters: Int,
            embCol: String = "embedding", idCol: String = "doc_id",
            spherical: Boolean = false,
            weightCol: Option[String] = None): LloydResult = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    require(k >= 1 && iters >= 1, "k and iters must be positive")

    // Deterministic init: the k lowest-id vectors, float bits widened to
    // double exactly (no arithmetic).
    var cents: Array[Array[Double]] = corpus
      .orderBy(col(idCol).asc).limit(k)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(cents.length == k, s"corpus has fewer than k=$k rows")

    val dim = cents.head.length
    val history = Seq.newBuilder[LloydStat]
    for (it <- 1 to iters) {
      val centsLit = typedLit(cents.map(_.toSeq).toSeq)
      // ONE job per iteration (round-17, the [[lloydSweep]] fusion
      // carried back to the single-k loop): occupancy + objective AND
      // the per-dimension integer-exact centroid sums ride one groupBy
      // — the per-dim sums are `dim` extra agg buffers instead of a
      // second posexplode pass, so the MEMORY_AND_DISK persist that
      // existed only to share the argmin kernel between the two passes
      // is gone. Every expression is unchanged (same decimal/scaled
      // objective, same `Σ w·floor(x·1e6 + 0.5)` long sums, same
      // division), so history and centroids stay bit-identical —
      // ClusteringSpec pins replication/partitioning equivalence and
      // lloydSweep ≡ per-k lloyd.
      val wCol = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
      val assigned = corpus.select(
        col(embCol).as("__e"), wCol.as("__w"),
        GraftFunctions.nearestCentroidF32(col(embCol), centsLit).as("cell"))
      val statsAgg =
        if (weightCol.isEmpty)
          Seq(count(lit(1)).as("n"),
            sum(round(col("__d2"), 6).cast("decimal(22,6)"))
              .cast("double").as("obj"))
        else
          Seq(sum("__w").cast("long").as("n"),
            (sum(floor(col("__d2") * 1e6 + lit(0.5)).cast("long") * col("__w"))
              .cast("double") / 1e6).as("obj"))
      val dimAggs = (0 until dim).map(j =>
        sum(col("__w") *
          floor(element_at(col("__e"), j + 1).cast("double") * 1e6 + 0.5)
            .cast("long")).as(s"__s$j"))
      val aggs = statsAgg ++ dimAggs
      val rows = assigned
        .withColumn("__d2", d2Col(col("__e"), centsLit, col("cell")))
        .groupBy("cell")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      rows.foreach(r => history +=
        LloydStat(it, r.getInt(0), r.getLong(1), r.getDouble(2)))

      val next = cents.map(_.clone()) // empty cells keep their centroid
      val updated = Array.fill(k)(false)
      rows.foreach { r =>
        val (cell, n) = (r.getInt(0), r.getLong(1))
        val tgt = next(cell)
        var j = 0
        while (j < dim) { tgt(j) = r.getLong(3 + j).toDouble / (n.toDouble * 1e6); j += 1 }
        updated(cell) = true
      }
      if (spherical) for (c <- 0 until k if updated(c)) {
        var ss = 0.0
        var j = 0
        while (j < next(c).length) { ss += next(c)(j) * next(c)(j); j += 1 }
        val nrm = math.sqrt(ss)
        if (nrm > 0) { j = 0; while (j < next(c).length) { next(c)(j) /= nrm; j += 1 } }
      }
      cents = next
    }
    LloydResult(cents, history.result().sortBy(s => (s.iter, s.cell)))
  }

  /** Multi-k Lloyd sweep ([[lloyd]] at every k in `ks`, unweighted,
    * non-spherical) fused into ONE Spark job per iteration — the
    * k-elbow shape (q141) runs the SAME deterministic training as
    * |ks| independent [[lloyd]] calls but with the driver-barrier
    * count collapsed from |ks|·(1 + iters·(2 jobs + persist)) to
    * 1 init collect + iters collects:
    *
    *  - INIT is shared: the k lowest-id vectors are a PREFIX of the
    *    kMax lowest-id vectors, so one `orderBy.limit(kMax)` collect
    *    seeds every k.
    *  - Each iteration assigns all |ks| cell ids in one projection,
    *    `stack`s to (k, cell, d2) rows, and aggregates occupancy,
    *    objective AND the per-dimension integer-exact centroid sums in
    *    a single groupBy — the per-dim sums ride as `dim` extra agg
    *    buffers instead of [[lloyd]]'s second posexplode pass, so the
    *    MEMORY_AND_DISK persist that existed only to share the argmin
    *    kernel between the two passes disappears entirely.
    *  - The LAST iteration skips the centroid update (the sweep's
    *    consumer reads the history, never the final centroids).
    *
    * Every expression is bit-identical to [[lloyd]]'s (same argmin
    * kernel, same decimal objective fold, same scaled-long sums, same
    * empty-cell keep rule), so the history matches the per-k [[lloyd]]
    * runs and the unrolled SQL oracle exactly. Fewer, fatter barriers
    * is the whole point: at local[32] under external load each tiny
    * barrier job pays a straggler tail, and q141's ~21 of them
    * amplified a 2.2 s quiet profile to ~20 s (driver round 16). */
  def lloydSweep(corpus: DataFrame, ks: Seq[Int], iters: Int,
                 embCol: String = "embedding", idCol: String = "doc_id")
      : Map[Int, Seq[LloydStat]] = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    require(ks.nonEmpty && ks.forall(_ >= 1) && iters >= 1,
      s"ks and iters must be positive: ks=$ks iters=$iters")
    val kMax = ks.max
    val init = corpus
      .orderBy(col(idCol).asc).limit(kMax)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(init.length == kMax, s"corpus has fewer than k=$kMax rows")
    val dim = init.head.length
    var cents: Map[Int, Array[Array[Double]]] =
      ks.map(k => k -> init.take(k).map(_.clone())).toMap
    val history = ks.map(k => k -> Seq.newBuilder[LloydStat]).toMap
    for (it <- 1 to iters) {
      val centsLit = ks.map(k => k -> typedLit(cents(k).map(_.toSeq).toSeq)).toMap
      val assigned = corpus.select(
        col(embCol).as("__e") +:
          ks.map(k => GraftFunctions.nearestCentroidF32(col(embCol), centsLit(k))
            .as(s"__c$k")): _*)
      val withD2 = ks.foldLeft(assigned) { (df, k) =>
        df.withColumn(s"__d$k", d2Col(col("__e"), centsLit(k), col(s"__c$k")))
      }
      val stacked = withD2.selectExpr("__e",
        s"stack(${ks.size}, " +
          ks.map(k => s"$k, __c$k, __d$k").mkString(", ") +
          ") AS (__k, cell, __d2)")
      val aggCols =
        Seq(count(lit(1)).as("n"),
          sum(round(col("__d2"), 6).cast("decimal(22,6)"))
            .cast("double").as("obj")) ++
          (0 until dim).map(j =>
            sum(floor(element_at(col("__e"), j + 1).cast("double") * 1e6 + 0.5)
              .cast("long")).as(s"__s$j"))
      val rows = stacked.groupBy("__k", "cell")
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      rows.foreach { r =>
        history(r.getInt(0)) +=
          LloydStat(it, r.getInt(1), r.getLong(2), r.getDouble(3))
      }
      if (it < iters) {
        val next = cents.map { case (k, c) => k -> c.map(_.clone()) }
        rows.foreach { r =>
          val (k, cell, n) = (r.getInt(0), r.getInt(1), r.getLong(2))
          val tgt = next(k)(cell)
          var j = 0
          while (j < dim) { tgt(j) = r.getLong(4 + j).toDouble / (n.toDouble * 1e6); j += 1 }
        }
        cents = next
      }
    }
    history.map { case (k, b) => k -> b.result().sortBy(s => (s.iter, s.cell)) }
  }
}
