package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-walked ANN — the engine's answer to FAISS's HNSW family
  * (faiss/IndexHNSW.cpp), re-shaped for a scan engine.
  *
  * A literal HNSW port would be wrong here: its hierarchical skip-list
  * lives in single-machine RAM and its search is a fine-grained pointer
  * chase — per-edge latency that an executor JVM amortizes poorly and a
  * distributed shuffle amortizes not at all. What survives the
  * translation is the GRAPH: the persisted cell-blocked k-NN graph
  * ([[KnnGraph.cellBlocked]], q87) is the NSW base layer, and search is
  * a deterministic greedy BEAM walk over it, expressed the way this
  * engine expresses every driver-known small-key-set operation
  * ([[PqIndex.searchRefined]] precedent):
  *
  *  - ENTRY: the coarse quantizer replaces HNSW's upper layers — probe
  *    `nprobe` cells ([[IvfIndex.probeCells]]), seed with each probed
  *    cell's lowest doc id. Deterministic, no extra artifact.
  *  - WALK: each hop expands the beam's out-edges with a driver-known
  *    `src IN (beam)` filter (pushed to the graph parquet as
  *    `In(src,…)` row-group pruning), scores only the NEW candidates
  *    against the float corpus with an `In(doc_id,…)`-pruned scan, and
  *    keeps the global top-`beamWidth` by (score DESC, id ASC).
  *  - The graph is cell-blocked, so the walk explores the probed cells'
  *    subgraphs; per query it touches O(hops · beam · degree) rows of
  *    the graph and corpus instead of the probed cells' full mass — the
  *    HNSW value proposition, paid for in driver round-trips that are
  *    each the same tiny-result class as a single-query fetch.
  *
  * When to prefer it over [[IvfIndex.searchScores]]: very large cells
  * with a built graph (search cost independent of cell size); when to
  * prefer IVF: throughput batch search, where the scan amortizes. The
  * walk is rows-deterministic end-to-end, so the whole operator sits
  * under a generated DuckDB oracle that replays the unrolled hops
  * ([[graft.OracleSqlGen.graphSearchSql]]).
  */
object GraphSearch {

  /** Beam search over a `(src, dst, rnk, …)` k-NN graph. `withCells` is
    * the cell-assigned float corpus (the persisted IVF store); `graph`
    * must be keyed by the same ids. Returns `(rnk, idCol, score)` in
    * the engine total order, `rnk` 1-based. */
  def searchBeam(graph: DataFrame, withCells: DataFrame, ivf: IvfIndex.Ivf,
                 queryVec: Array[Float], k: Int, nprobe: Int = 4,
                 beamWidth: Int = 8, hops: Int = 3,
                 idCol: String = "doc_id",
                 embCol: String = "embedding"): DataFrame = {
    val spark = withCells.sparkSession
    GraftFunctions.register(spark)
    import spark.implicits._
    val qLit = typedlit(queryVec)

    def scoreIds(ids: Seq[Long]): Map[Long, Double] =
      if (ids.isEmpty) Map.empty
      else withCells.filter(col(idCol).isin(ids: _*))
        .select(col(idCol).cast("long"),
          GraftFunctions.dotF32(col(embCol), qLit))
        .as[(Long, Double)].collect().toMap

    val probed = IvfIndex.probeCells(ivf, queryVec, nprobe)
    val entry = withCells.filter(col("cell_id").isin(probed: _*))
      .groupBy("cell_id").agg(min(col(idCol)).as("id"))
      .select(col("id").cast("long")).as[Long].collect().toSeq.sorted

    var scores = scoreIds(entry)
    def beamOf(m: Map[Long, Double]): Seq[Long] =
      m.toSeq.sortBy { case (id, s) => (-s, id) }.take(beamWidth).map(_._1)
    var beam = beamOf(scores)
    var hop = 0
    var grew = true
    while (hop < hops && grew) {
      val frontier = graph.filter(col("src").isin(beam: _*))
        .select(col("dst").cast("long")).distinct().as[Long].collect()
        .toSeq.filterNot(scores.contains).sorted
      if (frontier.isEmpty) grew = false
      else {
        scores ++= scoreIds(frontier)
        beam = beamOf(scores)
      }
      hop += 1
    }
    val top = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
    top.zipWithIndex
      .map { case ((id, s), i) => ((i + 1).toLong, id, s) }
      .toDF("rnk", idCol, "score")
  }
}
