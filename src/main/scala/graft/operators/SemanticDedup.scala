package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): embedding-space
  * deduplication — cluster the corpus with k-means, call two documents
  * semantic duplicates when their cosine similarity inside a cluster
  * clears a threshold, and keep ONE member per duplicate group: the one
  * FARTHEST from its cluster centroid (the paper's keep-low-centroid-
  * similarity policy — it preserves the cluster's diversity edge rather
  * than its redundant core).
  *
  * Everything composes from machinery the engine already has, which is
  * the point of the operator family:
  *  - the clusters ARE an [[IvfIndex]] coarse quantizer (trained once,
  *    persisted, shared with ANN search);
  *  - cell assignment is the codegen `nearest_centroid_f32` scan;
  *  - candidate pairs are a cell-blocked equality self-join — the
  *    [[Dedup.embeddingNearDups]] shape with learned cells instead of
  *    given labels, capped per cell like every LSH bucket join;
  *  - centroid distance is `norm(residual_f32(…))` — the IVFADC
  *    residual kernel reread as a scalar;
  *  - group resolution is [[Dedup.keepBestResolution]] with that
  *    distance as the quality score.
  *
  * Scale: the join is equality-keyed on `cell_id` (shuffle both sides by
  * cell, never all-pairs), `maxCellSize` bounds the per-cell pair count
  * exactly like the MinHash bucket cap, and the per-doc score is a
  * narrow codegen projection. Cosine here is the inner product — the
  * corpus embedding contract is unit-normalized vectors (reference
  * normalizes at encode time; F2). */
object SemanticDedup {
  val DefaultMaxCellSize = 250

  /** Cell-blocked semantic-duplicate candidate pairs:
    * `(cell_id, id_a, id_b, cos)` with `id_a < id_b` and
    * `cos ≥ minCos`. Cells larger than `maxCellSize` are truncated to
    * their `maxCellSize` lowest ids (deterministic, the bucket-cap
    * contract — at corpus scale a mega-cell means the quantizer needs
    * more cells, not an O(m²) join). */
  def pairs(docs: DataFrame, ivf: IvfIndex.Ivf, minCos: Double,
            maxCellSize: Int = DefaultMaxCellSize,
            idCol: String = "doc_id",
            embCol: String = "embedding"): DataFrame =
    pairsAssigned(IvfIndex.assign(docs, ivf, embCol), minCos, maxCellSize,
      idCol, embCol)

  /** [[pairs]] over an ALREADY cell-assigned frame (`cell_id` present) —
    * the caller owns the single assign pass (or reads the persisted
    * cell-partitioned IVF corpus, where assignment happened at ingest
    * and the query-time plan carries NO `nearest_centroid_f32` at all). */
  def pairsAssigned(celled: DataFrame, minCos: Double,
                    maxCellSize: Int = DefaultMaxCellSize,
                    idCol: String = "doc_id",
                    embCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(celled.sparkSession)
    val base = celled
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("cell_id"))
    val capped = base
      .withColumn("__rn",
        row_number().over(Window.partitionBy("cell_id").orderBy("id")))
      .filter(col("__rn") <= maxCellSize)
      .drop("__rn")
    capped.select(col("id").as("id_a"), col("emb").as("ea"), col("cell_id"))
      .join(capped.select(col("id").as("id_b"), col("emb").as("eb"),
        col("cell_id")), Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", GraftFunctions.dotF32(col("ea"), col("eb")))
      .filter(col("cos") >= minCos)
      .select("cell_id", "id_a", "id_b", "cos")
  }

  /** Full SemDeDup resolution: `(id, comp, score, kept)` for every
    * member of a semantic-duplicate group — `score` is the member's L2
    * distance to its cell centroid and the group keeps its maximum
    * (ties to the lower id). Filter `kept` for the survivor set, or
    * anti-join `!kept` ids against the corpus for the deduped corpus
    * (the [[Dedup.keepBestCorpus]] pattern).
    *
    * The corpus is cell-assigned ONCE: the raw-docs overload assigns and
    * delegates here; this overload takes the assigned frame (ideally the
    * PERSISTED cell-partitioned IVF corpus, making dedup a pure read of
    * ingest-time work — at 100 TB an extra assign pass is an extra
    * corpus scan + kernel sweep per dedup run). */
  def resolveAssigned(celled: DataFrame, ivf: IvfIndex.Ivf, minCos: Double,
                      maxCellSize: Int = DefaultMaxCellSize,
                      idCol: String = "doc_id",
                      embCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(celled.sparkSession)
    val dist = GraftFunctions.normF32(
      PqIndex.residualColumn(ivf, col(embCol), col("cell_id")))
    Dedup.keepBestResolution(celled, dist,
      pairsAssigned(celled, minCos, maxCellSize, idCol, embCol), idCol)
  }

  /** [[resolveAssigned]] from raw docs. The explicit
    * `repartition(cell_id)` puts ONE exchange over the assign
    * projection so every consumer within a job shares it (Catalyst does
    * no cross-consumer CSE; a bare shared DataFrame would re-assign per
    * consumer). The component closure still materializes its edge set
    * in its own jobs, so a raw-docs run pays the assign kernel once per
    * job (edge build + scoring) — when the corpus already has a
    * persisted cell-partitioned IVF store, call [[resolveAssigned]] on
    * it instead and the query-time plan carries NO assign kernel at all
    * (plan-asserted in SemanticDedupSpec). */
  def resolve(docs: DataFrame, ivf: IvfIndex.Ivf, minCos: Double,
              maxCellSize: Int = DefaultMaxCellSize,
              idCol: String = "doc_id",
              embCol: String = "embedding"): DataFrame =
    resolveAssigned(
      IvfIndex.assign(docs, ivf, embCol)
        .select(col(idCol), col(embCol), col("cell_id"))
        .repartition(col("cell_id")),
      ivf, minCos, maxCellSize, idCol, embCol)
}
