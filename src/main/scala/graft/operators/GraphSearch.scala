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

  /** Batched beam walk: N queries walk TOGETHER, sharing every read —
    * the [[PqIndex.searchIvfAdcBatch]] posture applied to the graph
    * tier. Per hop there are exactly TWO jobs regardless of N: one
    * graph expansion with `src IN (union of the active beams)` (row-
    * group pruned like the single walk) and one corpus scoring scan
    * with `doc_id IN (union of the new frontiers)` carrying one
    * `dot_f32` column per query — instead of the single form's 2·N
    * driver round-trips per hop, which dominate the walk's cost at the
    * local scheduler's per-job floor. Each query's beam rule, visited
    * set and early exhaustion replicate [[searchBeam]] EXACTLY (parity
    * is spec-pinned), so the result is the single walks' union.
    * Stale-graph behavior (dangling dst ids after a corpus removal)
    * matches the single walk: missing ids are dropped from the frontier,
    * batch ≡ singles — GraphSearchSpec "stale graph (dangling dst ids)
    * drops missing ids", the round-10 driver-finding closure.
    * Returns `(query_id, rnk, idCol, score)`. */
  def searchBeamBatch(graph: DataFrame, withCells: DataFrame,
                      ivf: IvfIndex.Ivf, queries: Seq[(Long, Array[Float])],
                      k: Int, nprobe: Int = 4, beamWidth: Int = 8,
                      hops: Int = 3, idCol: String = "doc_id",
                      embCol: String = "embedding"): DataFrame = {
    val spark = withCells.sparkSession
    GraftFunctions.register(spark)
    import spark.implicits._
    require(queries.nonEmpty, "searchBeamBatch needs at least one query")
    val nq = queries.size
    val qLits = queries.map { case (_, v) => typedlit(v) }

    // One pruned scan scores the union of requested ids against EVERY
    // query (a dot column per query); callers then read only the
    // (id, query) pairs they asked for — extra columns are cheap, extra
    // jobs are not.
    def scoreIds(ids: Seq[Long]): Map[Long, Array[Double]] =
      if (ids.isEmpty) Map.empty
      else {
        val cols = col(idCol).cast("long").as("__id") +:
          qLits.zipWithIndex.map { case (ql, i) =>
            GraftFunctions.dotF32(col(embCol), ql).as(s"__s$i") }
        withCells.filter(col(idCol).isin(ids: _*))
          .select(cols: _*).collect()
          .map(r => r.getLong(0) -> Array.tabulate(nq)(i => r.getDouble(i + 1)))
          .toMap
      }

    // Entry seeds: ONE aggregation over the union of all probed cells.
    val probedPer = queries.map { case (_, v) => IvfIndex.probeCells(ivf, v, nprobe) }
    val allCells = probedPer.flatten.distinct
    val entryByCell = withCells.filter(col("cell_id").isin(allCells: _*))
      .groupBy("cell_id").agg(min(col(idCol)).as("id"))
      .select(col("cell_id").cast("long"), col("id").cast("long"))
      .as[(Long, Long)].collect().toMap
    val entries: Seq[Seq[Long]] =
      probedPer.map(_.flatMap(c => entryByCell.get(c.toLong)).sorted)

    val scores = Array.fill(nq)(Map.empty[Long, Double])
    val seed = scoreIds(entries.flatten.distinct)
    // Ids absent from the scored map (a stale graph pointing at ids the
    // corpus no longer has) are DROPPED, exactly as the single walk's
    // scoreIds-join does — never a strict lookup, which would crash on
    // out-of-sync graph/corpus inputs.
    for (i <- 0 until nq)
      scores(i) = entries(i).flatMap(id => seed.get(id).map(a => id -> a(i))).toMap
    def beamOf(i: Int): Seq[Long] =
      scores(i).toSeq.sortBy { case (id, s) => (-s, id) }
        .take(beamWidth).map(_._1)
    val beams = Array.tabulate(nq)(beamOf)
    val done = Array.fill(nq)(false)
    var hop = 0
    while (hop < hops && done.exists(!_)) {
      val active = (0 until nq).filter(!done(_))
      val unionBeam = active.flatMap(beams(_)).distinct
      val adj = graph.filter(col("src").isin(unionBeam: _*))
        .select(col("src").cast("long"), col("dst").cast("long")).distinct()
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      val frontiers = active.map { i =>
        i -> beams(i).flatMap(adj.getOrElse(_, Nil)).distinct
          .filterNot(scores(i).contains).sorted
      }.toMap
      val fresh = scoreIds(frontiers.values.flatten.toSeq.distinct)
      active.foreach { i =>
        if (frontiers(i).isEmpty) done(i) = true
        else {
          scores(i) ++= frontiers(i).flatMap(id => fresh.get(id).map(a => id -> a(i)))
          beams(i) = beamOf(i)
        }
      }
      hop += 1
    }
    queries.zipWithIndex.flatMap { case ((qid, _), i) =>
      scores(i).toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
        .zipWithIndex.map { case ((id, s), r) => (qid, (r + 1).toLong, id, s) }
    }.toDF("query_id", "rnk", idCol, "score")
  }

  /** Incremental graph INSERT — FAISS `IndexHNSW::add`
    * (faiss/IndexHNSW.cpp `hnsw_add_vertices`) re-shaped for the
    * persisted cell-blocked graph, closing the maintenance gap the IVF
    * tier already covers (removeIds/merge/retrain): ST4 write-back can
    * now GROW the graph index without a rebuild.
    *
    * Per new row, in insertion order (later inserts see earlier ones,
    * FAISS's add semantics):
    *  1. the row joins its quantizer cell by L2 argmin
    *     ([[IvfIndex.probeCellsL2]] top-1 — the SAME rule
    *     [[IvfIndex.assign]]/a rebuild applies; the IP probe order is
    *     used only for walk seeding, never assignment);
    *  2. candidate neighbors come from the EXISTING walk (batched per
    *     conflict-free wave — see [[insertWithEdits]]; `4·kGraph`
    *     candidates per row) restricted to the row's cell — the
    *     cell-blocked
    *     invariant (edges never cross cells) is what keeps the walk's
    *     entry seeding and the rebuild parity meaningful. A cell the
    *     walk never reached (its subgraph unreachable from the probed
    *     entries) falls back to the exact in-cell scan — bounded by the
    *     build's own cell cap;
    *  3. forward edges: the row's top-`kGraph` of those candidates by
    *     (score DESC, id ASC) — the build's exact comparator;
    *  4. reverse edges: each chosen neighbor u gains (u → new), then
    *     u's list is re-capped to its top-`kGraph` (FAISS
    *     `shrink_neighbor_list`); only chosen neighbors' lists change.
    *  5. CONNECTIVITY GUARD (deliberate deviation from FAISS's naive
    *     shrink, documented here because the walk depends on it): if
    *     EVERY chosen neighbor's cap prunes the new reverse edge — a
    *     dense cell where the newcomer outranks nothing — the rank-1
    *     neighbor force-keeps it in place of its own worst edge, so
    *     every inserted node retains ≥ 1 in-edge and stays reachable
    *     by the walk (entry seeds are per-cell min ids, which a new
    *     high id can never be; without the guard such a node is
    *     findable by IVF scan but invisible to the graph tier).
    *
    * Driver state is bounded by `batch · kGraph` edited nodes, each
    * holding ≤ `kGraph` edges; the walk/fetch jobs per insert are the
    * same pruned tiny-result class as a single-query search. The
    * returned graph is `base minus edited-src rows ∪ edited rows` — at
    * a persisted 100 TB store the edited-src set is driver-known and
    * bounded, so the write is the removeIds-style affected-partition
    * rewrite, never a graph rewrite. Walk-on-grown ≡ walk-on-rebuilt
    * parity (within recall tolerance) is spec-pinned in GraphSearchSpec.
    * Returns (grownGraph, grownCorpus). */
  def insert(graph: DataFrame, withCells: DataFrame, ivf: IvfIndex.Ivf,
             newRows: Seq[(Long, Array[Float])], kGraph: Int,
             nprobe: Int = 4, beamWidth: Int = 8, hops: Int = 3,
             idCol: String = "doc_id",
             embCol: String = "embedding"): (DataFrame, DataFrame) = {
    val (g, c, _) = insertWithEdits(graph, withCells, ivf, newRows, kGraph,
      nprobe, beamWidth, hops, idCol, embCol)
    (g, c)
  }

  /** [[insert]] exposing the touched nodes' final edge lists — what a
    * persisted store needs to splice only the affected partitions
    * ([[insertPersisted]]). Keys: every new node and every chosen
    * neighbor; values in final rank order.
    *
    * BATCHED BY CONFLICT-FREE WAVES (the round-12 perf-weak closure),
    * EXACTLY ≡ the sequential reference by construction: edges are
    * cell-blocked, so a row's walk never leaves its probed cells and its
    * splice edits land only in its own L2 cell — therefore an
    * order-contiguous run of rows whose `(probed ∪ own)` cell sets avoid
    * every EARLIER run member's own cell walks the identical graph the
    * per-row sequential form would see. The batch is split greedily into
    * such runs ("waves"); each wave's candidate discovery is ONE
    * [[searchBeamBatch]] walk over the current composed graph (2 jobs
    * per hop for the whole wave, plus one cell-lookup scan and one
    * edge-list prefetch), and the order-dependent splice stays
    * driver-side. A batch spread over many cells collapses to a handful
    * of waves (cost ~flat in batch size — the ScaleProbe `graph insert`
    * point); the worst case (every row in one cell) degrades to the
    * sequential walk count, never below it. Parity is pinned
    * edge-for-edge against [[insertWithEditsSeq]] in GraphSearchSpec. */
  def insertWithEdits(graph: DataFrame, withCells: DataFrame,
                      ivf: IvfIndex.Ivf, newRows: Seq[(Long, Array[Float])],
                      kGraph: Int, nprobe: Int = 4, beamWidth: Int = 8,
                      hops: Int = 3, idCol: String = "doc_id",
                      embCol: String = "embedding")
      : (DataFrame, DataFrame, Map[Long, Seq[(Long, Double)]]) = {
    val spark = withCells.sparkSession
    GraftFunctions.register(spark)
    import spark.implicits._
    require(newRows.nonEmpty, "insert needs at least one new row")
    require(newRows.map(_._1).distinct.size == newRows.size,
      "insert ids must be unique within a batch")

    val corpusBase = withCells.select(col(idCol), col(embCol), col("cell_id"))

    // assignment metric = the STORE's (L2 argmin — IvfIndex.assign); the
    // IP probe stays what it is everywhere: walk seeding. Both are
    // driver-known, so wave construction runs with zero jobs.
    val cellOfNew: Map[Long, Int] = newRows.map { case (id, v) =>
      id -> IvfIndex.probeCellsL2(ivf, v, 1).head }.toMap
    val reachOfNew: Map[Long, Set[Int]] = newRows.map { case (id, v) =>
      id -> (IvfIndex.probeCells(ivf, v, nprobe).toSet + cellOfNew(id)) }.toMap

    val edits = scala.collection.mutable.LinkedHashMap.empty[Long, Seq[(Long, Double)]]
    val added = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Int)]
    def editsDf: DataFrame =
      edits.toSeq.flatMap { case (src, es) =>
        es.zipWithIndex.map { case ((dst, s), i) => (src, dst, (i + 1).toLong, s) }
      }.toDF("src", "dst", "rnk", "score")
        .select(graph.columns.map(col): _*)
    def composedGraph: DataFrame =
      if (edits.isEmpty) graph
      else graph.filter(!col("src").isin(edits.keys.toSeq: _*))
        .unionByName(editsDf)
    def composedCorpus: DataFrame =
      if (added.isEmpty) corpusBase
      else corpusBase.unionByName(
        added.toSeq.toDF(idCol, embCol, "cell_id")
          .select(corpusBase.columns.map(col): _*))

    // base edge lists are read once per node across the whole batch;
    // nodes edited earlier always resolve through `edits` first
    val baseLists = scala.collection.mutable.Map.empty[Long, Seq[(Long, Double)]]
    def fetchLists(ids: Seq[Long]): Unit = if (ids.nonEmpty) {
      val got = graph.filter(col("src").isin(ids: _*))
        .select(col("src").cast("long"), col("dst").cast("long"), col("score"))
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3))
          .sortBy { case (d, s) => (-s, d) }.toSeq).toMap
      ids.foreach(id => baseLists(id) = got.getOrElse(id, Seq.empty))
    }

    var idx = 0
    while (idx < newRows.length) {
      // wave = maximal order-contiguous run where no row can observe an
      // earlier run member's edits: its reachable cells avoid their own
      // cells (edits of row i land only in cellOfNew(i))
      val waveCells = scala.collection.mutable.Set.empty[Int]
      var end = idx
      var blocked = false
      while (end < newRows.length && !blocked) {
        val id = newRows(end)._1
        if (reachOfNew(id).exists(waveCells.contains)) blocked = true
        else { waveCells += cellOfNew(id); end += 1 }
      }
      val wave = newRows.slice(idx, end)

      // one batched walk for the whole wave, over the CURRENT graph —
      // identical to each row's sequential walk by the wave invariant
      val gNow = composedGraph
      val cNow = composedCorpus
      val walked: Map[Long, Seq[(Long, Double)]] =
        searchBeamBatch(gNow, cNow, ivf, wave, k = 4 * kGraph,
          nprobe = nprobe, beamWidth = beamWidth, hops = hops,
          idCol = idCol, embCol = embCol)
          .select(col("query_id"), col(idCol).cast("long"), col("score"))
          .as[(Long, Long, Double)].collect().toSeq
          .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap

      // cell of every walked id: earlier-inserted ids driver-side, base
      // ids in one pruned scan per wave
      val addedCells = added.map(t => t._1 -> t._3).toMap
      val baseIds = walked.values.flatten.map(_._1).toSeq.distinct
        .filterNot(addedCells.contains)
      val cellOfWalked: Map[Long, Int] = addedCells ++ (
        if (baseIds.isEmpty) Map.empty[Long, Int]
        else corpusBase.filter(col(idCol).isin(baseIds: _*))
          .select(col(idCol).cast("long"), col("cell_id").cast("int"))
          .as[(Long, Int)].collect().toMap)

      // prefetch base lists for this wave's in-cell candidates (only the
      // rare unreached-cell fallback ever misses)
      fetchLists(wave.flatMap { case (id, _) =>
        walked.getOrElse(id, Seq.empty).map(_._1)
          .filter(w => cellOfWalked.get(w).contains(cellOfNew(id)))
      }.distinct.filterNot(id => edits.contains(id) || baseLists.contains(id)))

      wave.foreach { case (newId, vec) =>
        val cell = cellOfNew(newId)
        val candidates = walked.getOrElse(newId, Seq.empty)
          .filter { case (id, _) => cellOfWalked.get(id).contains(cell) }
        val chosen =
          (if (candidates.nonEmpty) candidates
           else // unreached cell: exact in-cell scan, bounded by the cell cap
             cNow.filter(col("cell_id") === cell && col(idCol) =!= newId)
               .select(col(idCol).cast("long"),
                 GraftFunctions.dotF32(col(embCol), typedlit(vec)))
               .as[(Long, Double)].collect().toSeq)
            .sortBy { case (id, s) => (-s, id) }.take(kGraph)

        // forward list for the new node
        edits(newId) = chosen
        added += ((newId, vec, cell))

        // reverse splice: current lists come from edits first (a node
        // edited earlier this batch must not be re-read stale), then the
        // prefetched base lists; add (u -> new), re-cap.
        fetchLists(chosen.map(_._1)
          .filterNot(id => edits.contains(id) || baseLists.contains(id)))
        var kept = false
        chosen.foreach { case (u, s) =>
          val current = edits.getOrElse(u, baseLists.getOrElse(u, Seq.empty))
          val merged = (current :+ (newId, s))
            .sortBy { case (id, sc) => (-sc, id) }.take(kGraph)
          if (merged.exists(_._1 == newId)) kept = true
          edits(u) = merged
        }
        if (!kept && chosen.nonEmpty) { // connectivity guard (doc pt. 5)
          val (uStar, sStar) = chosen.head
          edits(uStar) = (edits(uStar).take(kGraph - 1) :+ (newId, sStar))
            .sortBy { case (id, sc) => (-sc, id) }
        }
      }
      idx = end
    }
    (composedGraph, composedCorpus, edits.toMap)
  }

  /** The REFERENCE insert semantics — one full beam walk per row over
    * the graph as mutated so far (FAISS add, literally). Kept as the
    * adjudicator the batched [[insertWithEdits]] is parity-pinned
    * against (GraphSearchSpec); not for production batches — B rows pay
    * B × walk jobs at the scheduler's per-job floor, the round-12
    * perf-weak finding. */
  private[graft] def insertWithEditsSeq(graph: DataFrame, withCells: DataFrame,
                      ivf: IvfIndex.Ivf, newRows: Seq[(Long, Array[Float])],
                      kGraph: Int, nprobe: Int = 4, beamWidth: Int = 8,
                      hops: Int = 3, idCol: String = "doc_id",
                      embCol: String = "embedding")
      : (DataFrame, DataFrame, Map[Long, Seq[(Long, Double)]]) = {
    val spark = withCells.sparkSession
    GraftFunctions.register(spark)
    import spark.implicits._
    require(newRows.nonEmpty, "insert needs at least one new row")

    // (src -> edge list) for every node this batch touches: new nodes'
    // forward lists and chosen neighbors' re-capped lists.
    val edits = scala.collection.mutable.LinkedHashMap.empty[Long, Seq[(Long, Double)]]
    val added = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Int)]

    // the walk and the returned corpus carry the index triple only — a
    // store with extra payload columns keeps them in ITS copy; new rows
    // have no payload by definition
    val corpusBase = withCells.select(col(idCol), col(embCol), col("cell_id"))
    def composedCorpus: DataFrame =
      if (added.isEmpty) corpusBase
      else corpusBase.unionByName(
        added.toSeq.toDF(idCol, embCol, "cell_id")
          .select(corpusBase.columns.map(col): _*))
    def composedGraph: DataFrame =
      if (edits.isEmpty) graph
      else graph.filter(!col("src").isin(edits.keys.toSeq: _*))
        .unionByName(editsDf)
    def editsDf: DataFrame =
      edits.toSeq.flatMap { case (src, es) =>
        es.zipWithIndex.map { case ((dst, s), i) => (src, dst, (i + 1).toLong, s) }
      }.toDF("src", "dst", "rnk", "score")
        .select(graph.columns.map(col): _*)

    newRows.foreach { case (newId, vec) =>
      // assignment metric = the STORE's (L2 argmin, ties to the lower
      // cell — NearestCentroidF32 / IvfIndex.assign); the IP probe stays
      // what it is everywhere: walk seeding. Using the IP top-1 here
      // would place a large-norm-skewed node in a different cell than a
      // rebuild's assign, splitting node and edges across partitions.
      val cell = IvfIndex.probeCellsL2(ivf, vec, 1).head
      val corpusNow = composedCorpus
      val walked = searchBeam(composedGraph, corpusNow, ivf, vec,
        k = 4 * kGraph, nprobe = nprobe, beamWidth = beamWidth, hops = hops,
        idCol = idCol, embCol = embCol)
        .select(col(idCol).cast("long"), col("score"))
        .as[(Long, Double)].collect().toSeq
      val walkedIds = walked.map(_._1)
      val inCellIds: Set[Long] =
        if (walkedIds.isEmpty) Set.empty
        else corpusNow.filter(col(idCol).isin(walkedIds: _*) &&
            col("cell_id") === cell)
          .select(col(idCol).cast("long")).as[Long].collect().toSet
      val candidates = walked.filter(c => inCellIds.contains(c._1))
      val chosen =
        (if (candidates.nonEmpty) candidates
         else // unreached cell: exact in-cell scan, bounded by the cell cap
           corpusNow.filter(col("cell_id") === cell && col(idCol) =!= newId)
             .select(col(idCol).cast("long"),
               GraftFunctions.dotF32(col(embCol), typedlit(vec)))
             .as[(Long, Double)].collect().toSeq)
          .sortBy { case (id, s) => (-s, id) }.take(kGraph)

      // forward list for the new node
      edits(newId) = chosen
      added += ((newId, vec, cell))

      // reverse splice: fetch the chosen neighbors' current lists in one
      // pruned read (edits map first — a node edited earlier this batch
      // must not be re-read stale), add (u -> new), re-cap.
      val toFetch = chosen.map(_._1).filterNot(edits.contains)
      val fetched: Map[Long, Seq[(Long, Double)]] =
        if (toFetch.isEmpty) Map.empty
        else graph.filter(col("src").isin(toFetch: _*))
          .select(col("src").cast("long"), col("dst").cast("long"), col("score"))
          .as[(Long, Long, Double)].collect()
          .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3))
            .sortBy { case (id, s) => (-s, id) }.toSeq).toMap
      var kept = false
      chosen.foreach { case (u, s) =>
        val current = edits.getOrElse(u, fetched.getOrElse(u, Seq.empty))
        val merged = (current :+ (newId, s))
          .sortBy { case (id, sc) => (-sc, id) }.take(kGraph)
        if (merged.exists(_._1 == newId)) kept = true
        edits(u) = merged
      }
      if (!kept && chosen.nonEmpty) { // connectivity guard (doc pt. 5)
        val (uStar, sStar) = chosen.head
        edits(uStar) = (edits(uStar).take(kGraph - 1) :+ (newId, sStar))
          .sortBy { case (id, sc) => (-sc, id) }
      }
    }
    (composedGraph, composedCorpus, edits.toMap)
  }

  /** Graph-side `remove_ids` — [[insert]]'s counterpart, completing the
    * graph tier's maintenance pair the way the IVF tier pairs
    * append/remove: drop the removed nodes' rows, and REFILL every
    * surviving node that pointed at a removed one so no dangling edge
    * remains and no list silently shrinks.
    *
    * Refill is REBUILD-EQUIVALENT for the affected nodes: each gets
    * exactly the list [[KnnGraph.cellBlocked]] would give it on the
    * shrunken corpus — top-`kGraph` by (score DESC, id ASC) among the
    * re-capped survivors of its cell (the cap re-admits previously
    * capped-out ids exactly like a rebuild would; their own lists stay
    * absent until a rebuild or [[insert]], which the stale-tolerant walk
    * handles). Untouched nodes' rows pass through BYTE-UNCHANGED.
    *
    * Scale: `affected` = survivors pointing at removed ids, bounded by
    * |removed| · in-degree and driver-collected (the walk tier's
    * driver-known-key discipline); the refill scans only the affected
    * CELLS (partition-pruned on a persisted store) and joins them to a
    * broadcast of the affected nodes — the removeIds-style
    * affected-partition rewrite, never a graph rewrite. Returns the new
    * graph frame. */
  def removeNodes(graph: DataFrame, withCells: DataFrame,
                  removed: Seq[Long], kGraph: Int, maxCellSize: Int,
                  idCol: String = "doc_id",
                  embCol: String = "embedding"): DataFrame =
    removeNodesWithAffected(graph, withCells, removed, kGraph, maxCellSize,
      idCol, embCol)._1

  /** [[removeNodes]] also returning the affected (refilled) node ids —
    * what callers emitting or persisting only the touched slice need,
    * without re-deriving the rule (q199; the insertWithEdits pattern). */
  def removeNodesWithAffected(graph: DataFrame, withCells: DataFrame,
                              removed: Seq[Long], kGraph: Int,
                              maxCellSize: Int, idCol: String = "doc_id",
                              embCol: String = "embedding")
      : (DataFrame, Seq[Long]) = {
    val (untouched, refill, affected) = removeNodesParts(graph, withCells,
      removed, kGraph, maxCellSize, idCol, embCol)
    (refill.fold(untouched)(r =>
      untouched.unionByName(r.select(graph.columns.map(col): _*))), affected)
  }

  /** The removal's three parts — (untouched survivors, refilled lists if
    * any, affected ids) — for callers that splice rather than union
    * ([[removeNodesPersisted]]). */
  private[operators] def removeNodesParts(graph: DataFrame,
                                          withCells: DataFrame,
                                          removed: Seq[Long], kGraph: Int,
                                          maxCellSize: Int,
                                          idCol: String = "doc_id",
                                          embCol: String = "embedding")
      : (DataFrame, Option[DataFrame], Seq[Long]) = {
    val spark = withCells.sparkSession
    GraftFunctions.register(spark)
    import spark.implicits._
    require(removed.nonEmpty, "removeNodes needs a non-empty id set")
    val survivors = graph.filter(!col("src").isin(removed: _*))
    val affected = survivors.filter(col("dst").isin(removed: _*))
      .select(col("src").cast("long")).distinct().as[Long].collect().sorted.toSeq
    if (affected.isEmpty) return (survivors, None, Seq.empty)
    val corpus = withCells.select(col(idCol).cast("long").as("nid"),
      col(embCol).as("emb"), col("cell_id"))
      .filter(!col("nid").isin(removed: _*))
    val affCells = corpus.filter(col("nid").isin(affected: _*))
      .select(col("cell_id")).distinct().collect().map(_.get(0))
    // re-cap the affected cells over the SHRUNKEN corpus — the rebuild's
    // own membership rule, evaluated only where lists change
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cell_id").orderBy("nid")
    val capped = corpus.filter(col("cell_id").isin(affCells.toIndexedSeq: _*))
      .withColumn("__crn", row_number().over(w))
      .filter(col("__crn") <= maxCellSize)
      .drop("__crn")
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(desc("score"), col("dst").asc)
    val refill = broadcast(
        capped.filter(col("nid").isin(affected: _*))
          .select(col("nid").as("src"), col("emb").as("ea"), col("cell_id")))
      .join(capped.select(col("nid").as("dst"), col("emb").as("eb"),
        col("cell_id")), Seq("cell_id"))
      .filter(col("src") =!= col("dst"))
      .withColumn("score", GraftFunctions.dotF32(col("ea"), col("eb")))
      .withColumn("rnk", row_number().over(rw))
      .filter(col("rnk") <= kGraph)
      .select(col("src"), col("dst"), col("rnk").cast("long").as("rnk"),
        col("score"))
    (survivors.filter(!col("src").isin(affected: _*)),
      Some(refill), affected)
  }

  /** [[removeNodes]] applied to a [[savePartitioned]] store IN PLACE —
    * the removal half of the persisted maintenance pair
    * ([[insertPersisted]] is the growth half): every edge is intra-cell,
    * so a removed node's rows AND the survivors pointing at it live in
    * the removed node's own cell partitions — exactly those partitions
    * are rewritten (drop removed srcs, replace affected srcs' lists with
    * the rebuild-equivalent refill), via the same staged-rename/recovery
    * discipline. A partition left empty (every src removed) is deleted —
    * partition discovery then simply reports no rows for that cell.
    * Returns (cellsRewritten, nodesRefilled). */
  def removeNodesPersisted(spark: org.apache.spark.sql.SparkSession,
                           storePath: String, withCells: DataFrame,
                           removed: Seq[Long], kGraph: Int,
                           maxCellSize: Int, idCol: String = "doc_id",
                           embCol: String = "embedding"): (Long, Long) = {
    import spark.implicits._
    val hconf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(hconf)
    recoverGraphStaging(fs, storePath)
    val store = spark.read.parquet(storePath)
    val (_, refillOpt, affected) = removeNodesParts(
      store.select("src", "dst", "rnk", "score"), withCells, removed,
      kGraph, maxCellSize, idCol, embCol)
    // edges are intra-cell: all rows to drop or replace sit in the
    // cells holding removed/affected nodes
    val cells = withCells
      .filter(col(idCol).isin((removed ++ affected).distinct: _*))
      .select(col("cell_id").cast("int")).distinct().as[Int].collect().sorted
    val refillRows: Map[Int, Seq[(Long, Long, Long, Double)]] =
      refillOpt match {
        case None => Map.empty
        case Some(r) =>
          val cellOf = withCells.filter(col(idCol).isin(affected: _*))
            .select(col(idCol).cast("long"), col("cell_id").cast("int"))
            .as[(Long, Int)].collect().toMap
          r.select(col("src").cast("long"), col("dst").cast("long"),
              col("rnk").cast("long"), col("score"))
            .as[(Long, Long, Long, Double)].collect().toSeq
            .groupBy(e => cellOf(e._1)).view.mapValues(_.toSeq).toMap
      }
    var rewritten = 0L
    cells.foreach { cell =>
      val dir = new org.apache.hadoop.fs.Path(s"$storePath/cell_id=$cell")
      if (fs.exists(dir)) {
        rewritten += 1
        val tmp = new org.apache.hadoop.fs.Path(s"$storePath/_gr_tmp_cell_$cell")
        val old = new org.apache.hadoop.fs.Path(s"$storePath/_gr_old_cell_$cell")
        fs.delete(tmp, true); fs.delete(old, true)
        val dropSrcs = (removed ++ affected).distinct
        val kept = spark.read.parquet(dir.toString)
          .filter(!col("src").isin(dropSrcs: _*))
          .select("src", "dst", "rnk", "score")
        val cellRefill = refillRows.getOrElse(cell, Seq.empty)
        val newPart =
          if (cellRefill.isEmpty) kept
          else kept.unionByName(
            cellRefill.toDF("src", "dst", "rnk", "score"))
        if (newPart.isEmpty) { // whole cell removed: drop the partition
          // tombstone FIRST: written only once the removal has computed
          // this cell fully empty, it makes a crash anywhere in the
          // delete complete FORWARD at the next recovery pass — without
          // it, a crash between the stage-out rename and the delete
          // would ROLL BACK the rename and silently resurrect the
          // removed cell while other cells' drops already committed.
          val del = new org.apache.hadoop.fs.Path(
            s"$storePath/_gr_del_cell_$cell")
          fs.create(del, true).close()
          if (!fs.rename(dir, old))
            throw new java.io.IOException(s"graph remove: cannot stage out $dir")
          fs.delete(old, true)
          fs.delete(del, false)
        } else {
          newPart.write.mode("overwrite").parquet(tmp.toString)
          if (!fs.rename(dir, old))
            throw new java.io.IOException(s"graph remove: cannot stage out $dir")
          if (!fs.rename(tmp, dir)) {
            fs.rename(old, dir)
            throw new java.io.IOException(s"graph remove: cannot swap in $tmp")
          }
          fs.delete(old, true)
        }
      }
    }
    (rewritten, affected.size.toLong)
  }

  /** Persist a k-NN graph CELL-PARTITIONED (`cell_id=<c>/` dirs, one per
    * quantizer cell — every edge is intra-cell, so a node's list lives
    * wholly inside its cell's partition). This is the layout that makes
    * graph maintenance an affected-partition write ([[insertPersisted]])
    * and graph reads for a probed walk partition-pruned, the same
    * discipline as the IVF corpus/binary-hash stores. */
  def savePartitioned(graph: DataFrame, withCells: DataFrame, path: String,
                      idCol: String = "doc_id"): Unit =
    graph.join(withCells.select(col(idCol).cast("long").as("src"),
        col("cell_id")), Seq("src"))
      .write.partitionBy("cell_id").parquet(path)

  /** [[insert]] applied to a [[savePartitioned]] store IN PLACE: computes
    * the batch's edits, then rewrites ONLY the cell partitions holding
    * touched nodes — per affected cell, survivors + edited lists land in
    * a `_gr_tmp…` staging dir and two renames swap it in (the
    * `IvfIndex.removeIds` crash discipline, including the recovery pass
    * at call start: a leftover `_gr_old_cell_<c>` with no live dir is
    * completed forward from a `_SUCCESS`-marked `_gr_tmp_cell_<c>`, else
    * rolled back). A new node landing in an EMPTY cell creates that
    * partition. Untouched cells' files are never read or written.
    * Returns (cellsRewritten, nodesTouched). */
  def insertPersisted(spark: org.apache.spark.sql.SparkSession,
                      storePath: String, withCells: DataFrame,
                      ivf: IvfIndex.Ivf, newRows: Seq[(Long, Array[Float])],
                      kGraph: Int, nprobe: Int = 4, beamWidth: Int = 8,
                      hops: Int = 3, idCol: String = "doc_id",
                      embCol: String = "embedding"): (Long, Long) = {
    import spark.implicits._
    val hconf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(hconf)
    recoverGraphStaging(fs, storePath)
    val store = spark.read.parquet(storePath)
    val (_, _, edits) = insertWithEdits(
      store.select("src", "dst", "rnk", "score"), withCells, ivf, newRows,
      kGraph, nprobe, beamWidth, hops, idCol, embCol)
    if (edits.isEmpty) return (0L, 0L)
    // cell of every touched node: existing nodes from the corpus store,
    // new nodes by the same probe-top-1 rule insert used
    val newCells = newRows.map { case (id, v) =>
      id -> IvfIndex.probeCellsL2(ivf, v, 1).head }.toMap
    val existing = edits.keySet -- newCells.keySet
    val cellOf: Map[Long, Int] = newCells ++ (
      if (existing.isEmpty) Map.empty[Long, Int]
      else withCells.filter(col(idCol).isin(existing.toSeq: _*))
        .select(col(idCol).cast("long"), col("cell_id").cast("int"))
        .as[(Long, Int)].collect().toMap)
    val byCell = edits.toSeq.groupBy { case (src, _) => cellOf(src) }
    byCell.foreach { case (cell, cellEdits) =>
      val editedSrcs = cellEdits.map(_._1)
      val dir = new org.apache.hadoop.fs.Path(s"$storePath/cell_id=$cell")
      val tmp = new org.apache.hadoop.fs.Path(s"$storePath/_gr_tmp_cell_$cell")
      val old = new org.apache.hadoop.fs.Path(s"$storePath/_gr_old_cell_$cell")
      fs.delete(tmp, true); fs.delete(old, true)
      val editRows = cellEdits.flatMap { case (src, es) =>
        es.zipWithIndex.map { case ((dst, sc), i) =>
          (src, dst, (i + 1).toLong, sc) }
      }.toDF("src", "dst", "rnk", "score")
      val existed = fs.exists(dir)
      val newPart =
        if (existed)
          spark.read.parquet(dir.toString)
            .filter(!col("src").isin(editedSrcs: _*))
            .select("src", "dst", "rnk", "score")
            .unionByName(editRows)
        else editRows
      newPart.write.mode("overwrite").parquet(tmp.toString)
      if (existed && !fs.rename(dir, old))
        throw new java.io.IOException(s"graph insert: cannot stage out $dir")
      if (!fs.rename(tmp, dir)) {
        if (existed) fs.rename(old, dir)
        throw new java.io.IOException(s"graph insert: cannot swap in $tmp")
      }
      fs.delete(old, true)
    }
    (byCell.size.toLong, edits.size.toLong)
  }

  /** Heal the persisted maintenance pair's crash windows — the
    * `IvfIndex.removeIds` recovery rule over the `_gr_` staging
    * prefixes, plus two cases that rule alone misses:
    *  - a `_gr_del_cell_<c>` TOMBSTONE (a [[removeNodesPersisted]]
    *    empty-cell delete in flight) completes the delete FORWARD —
    *    the tombstone is written only once the removal computed the
    *    cell fully empty, so rolling the stage-out rename back would
    *    resurrect removed nodes beside already-committed sibling cells;
    *  - an ORPHAN `_gr_tmp_cell_<c>` with no `_gr_old_cell_<c>` marker
    *    (a crashed [[insertPersisted]] NEW-CELL write before its
    *    swap-in) is swept — nothing committed, the caller re-runs. */
  private def recoverGraphStaging(fs: org.apache.hadoop.fs.FileSystem,
                                  storePath: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(storePath)
    if (!fs.exists(root)) return
    val entries = fs.listStatus(root)
    def at(name: String) = new org.apache.hadoop.fs.Path(s"$storePath/$name")
    // 1. tombstoned empty-cell deletes complete forward
    val tombCells = entries
      .filter(_.getPath.getName.startsWith("_gr_del_cell_"))
      .map(_.getPath.getName.stripPrefix("_gr_del_cell_")).toSet
    tombCells.foreach { cell =>
      fs.delete(at(s"cell_id=$cell"), true)
      fs.delete(at(s"_gr_old_cell_$cell"), true)
      fs.delete(at(s"_gr_tmp_cell_$cell"), true)
      fs.delete(at(s"_gr_del_cell_$cell"), false)
    }
    // 2. two-rename crash window: _SUCCESS-marked tmp completes forward,
    //    else roll back to the staged-out old partition
    entries.foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("_gr_old_cell_") &&
          !tombCells.contains(name.stripPrefix("_gr_old_cell_"))) {
        val cell = name.stripPrefix("_gr_old_cell_")
        val live = at(s"cell_id=$cell")
        val tmp = at(s"_gr_tmp_cell_$cell")
        if (!fs.exists(live)) {
          val tmpDone = fs.exists(
            new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))
          if (tmpDone && fs.rename(tmp, live)) fs.delete(st.getPath, true)
          else if (!fs.rename(st.getPath, live))
            throw new java.io.IOException(
              s"graph recovery: cannot restore ${st.getPath} -> $live")
          else fs.delete(tmp, true)
        } else { fs.delete(st.getPath, true); fs.delete(tmp, true) }
      }
    }
    // 3. orphan tmp dirs: no old marker claims them, sweep
    entries.foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("_gr_tmp_cell_") &&
          !fs.exists(at("_gr_old_cell_" + name.stripPrefix("_gr_tmp_cell_"))))
        fs.delete(st.getPath, true)
    }
  }
}
