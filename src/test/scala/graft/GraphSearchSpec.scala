package graft

import graft.operators.{GraphSearch, IvfIndex, KnnGraph, VectorSearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clustered(n: Int, nClusters: Int, dim: Int = 16): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(4242)
    val anchors = Array.fill(nClusters)(Array.fill(dim)(r.nextGaussian()))
    def unit(v: Array[Double]): Array[Float] = {
      val n2 = math.sqrt(v.map(x => x * x).sum); v.map(x => (x / n2).toFloat)
    }
    (0 until n).map { i =>
      (i.toLong, unit(anchors(i % nClusters).map(x => x + r.nextGaussian() * 0.05)))
    }
  }

  /** Driver-only reference replay of the beam walk — same entry rule,
    * same orders, no Spark in the loop. */
  private def referenceWalk(data: Seq[(Long, Array[Float])],
                            edges: Map[Long, Seq[Long]],
                            cellOf: Map[Long, Int], probed: Seq[Int],
                            q: Array[Float], k: Int, beamW: Int,
                            hops: Int): Seq[(Long, Long, Double)] = {
    val vec = data.toMap
    def dot(id: Long): Double =
      vec(id).zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum
    val entry = probed.flatMap(c =>
      cellOf.collect { case (id, cc) if cc == c => id } match {
        case ids if ids.nonEmpty => Some(ids.min)
        case _ => None
      }).sorted
    var scores = entry.map(id => id -> dot(id)).toMap
    def beam = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(beamW).map(_._1)
    var hop = 0
    var grew = true
    while (hop < hops && grew) {
      val frontier = beam.flatMap(edges.getOrElse(_, Seq.empty))
        .distinct.filterNot(scores.contains)
      if (frontier.isEmpty) grew = false
      else scores ++= frontier.map(id => id -> dot(id))
      hop += 1
    }
    scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, s), i) => ((i + 1).toLong, id, s) }
  }

  test("beam walk ≡ driver reference replay; deterministic across runs") {
    val data = clustered(300, 5)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 5)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = 4)
    val qVec = data(7)._2

    val got = GraphSearch.searchBeam(graph, withCells, ivf, qVec, k = 10,
        nprobe = 2, beamWidth = 6, hops = 3)
      .as[(Long, Long, Double)].collect().toSeq
    val again = GraphSearch.searchBeam(graph, withCells, ivf, qVec, k = 10,
        nprobe = 2, beamWidth = 6, hops = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == again, "walk not deterministic")

    val edges = graph.select("src", "dst").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val cellOf = withCells.select(col("doc_id"), col("cell_id").cast("int"))
      .as[(Long, Int)].collect().toMap
    val probed = IvfIndex.probeCells(ivf, qVec, 2)
    val want = referenceWalk(data, edges, cellOf, probed, qVec,
      k = 10, beamW = 6, hops = 3)
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)),
      s"walk diverged from reference:\n got=$got\nwant=$want")
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._3 - w._3) < 1e-9) }
  }

  test("walk touches the graph neighborhood, not the probed cells' full mass") {
    val data = clustered(400, 4)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 4)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = 4)
    val qVec = data(3)._2
    // beam 4, degree 4, 2 hops + entry -> the scored set is bounded by
    // entry + hops·beam·degree, far under a 100-doc cell scan
    val res = GraphSearch.searchBeam(graph, withCells, ivf, qVec, k = 40,
        nprobe = 1, beamWidth = 4, hops = 2)
      .as[(Long, Long, Double)].collect()
    assert(res.length <= 1 + 4 * 4 + 4 * 4 * 4,
      s"walk scored more nodes than the expansion bound: ${res.length}")
  }

  test("batched walk ≡ N sequential walks (shared reads change nothing)") {
    val data = clustered(300, 5)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 5)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = 4)
    // Queries in different cells, plus two sharing a cell so beam unions
    // genuinely overlap mid-walk.
    val qs = Seq(7L, 8L, 13L, 44L).map(i => i -> data(i.toInt)._2)

    val batch = GraphSearch.searchBeamBatch(graph, withCells, ivf, qs,
        k = 10, nprobe = 2, beamWidth = 6, hops = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).sortBy(_._1)).toMap
    qs.foreach { case (qid, v) =>
      val single = GraphSearch.searchBeam(graph, withCells, ivf, v, k = 10,
          nprobe = 2, beamWidth = 6, hops = 3)
        .as[(Long, Long, Double)].collect().toSeq
      assert(batch(qid).map(t => (t._1, t._2)) == single.map(t => (t._1, t._2)),
        s"batched walk diverged for query $qid")
      batch(qid).zip(single).foreach { case (b, s) =>
        assert(math.abs(b._3 - s._3) < 1e-12) }
    }
  }

  test("stale graph (dangling dst ids) drops missing ids — batch ≡ singles, no crash") {
    val data = clustered(200, 4)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 4)
    // Graph built BEFORE a corpus shrink: point some edges at ids the
    // corpus no longer has. Both walk forms must silently skip them.
    val graph = KnnGraph.cellBlocked(docs, ivf, k = 4)
      .withColumn("dst",
        when(col("dst") % 7 === 0, col("dst") + 100000L).otherwise(col("dst")))
    val qs = Seq(5L, 21L, 60L).map(i => i -> data(i.toInt)._2)

    val batch = GraphSearch.searchBeamBatch(graph, withCells, ivf, qs,
        k = 10, nprobe = 2, beamWidth = 6, hops = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).sortBy(_._1)).toMap
    qs.foreach { case (qid, v) =>
      val single = GraphSearch.searchBeam(graph, withCells, ivf, v, k = 10,
          nprobe = 2, beamWidth = 6, hops = 3)
        .as[(Long, Long, Double)].collect().toSeq
      assert(single.forall(_._2 < 100000L), "single walk scored a dangling id")
      assert(batch(qid).map(t => (t._1, t._2)) == single.map(t => (t._1, t._2)),
        s"batched walk diverged from single on stale graph for query $qid")
    }
  }

  test("good recall inside the probed cluster (graph reaches the true top)") {
    val data = clustered(300, 3)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 3)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = 6)
    val qVec = data(11)._2
    val gotIds = GraphSearch.searchBeam(graph, withCells, ivf, qVec, k = 5,
        nprobe = 1, beamWidth = 8, hops = 4)
      .select("doc_id").as[Long].collect().toSet
    val probedCell = IvfIndex.probeCells(ivf, qVec, 1).head
    val inCell = withCells.filter(col("cell_id") === probedCell)
    val exact = VectorSearch.knnScores(inCell, qVec, 5)
      .select("doc_id").as[Long].collect().toSet
    val overlap = gotIds.intersect(exact).size
    assert(overlap >= 4, s"graph walk recall too low: $overlap/5")
  }

  test("insert: splice invariants — degree cap, cell-blocked edges, untouched rows") {
    val kG = 4
    val data = clustered(320, 5)
    val base = data.take(300)
    val extra = data.drop(300).map { case (id, v) => (id + 1000L, v) }
    val docs = base.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 5)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = kG)

    val (grown, corpus) = GraphSearch.insert(graph, withCells, ivf, extra,
      kGraph = kG, nprobe = 2, beamWidth = 6, hops = 3)
    val grownEdges = grown.select($"src".cast("long"), $"dst".cast("long"),
      $"rnk".cast("long"), $"score").as[(Long, Long, Long, Double)].collect()

    // corpus grew and every new row carries its nearest-centroid cell
    assert(corpus.count() == 320)
    val cellOf = corpus.select($"doc_id".cast("long"), $"cell_id".cast("int"))
      .as[(Long, Int)].collect().toMap
    extra.foreach { case (id, v) =>
      assert(cellOf(id) == IvfIndex.probeCellsL2(ivf, v, 1).head,
        "insert must assign by the store's L2 rule, not the IP probe") }

    // degree cap + rnk contiguity per src
    grownEdges.groupBy(_._1).foreach { case (src, es) =>
      assert(es.length <= kG, s"node $src over degree cap")
      assert(es.map(_._3).sorted.toSeq == (1L to es.length).toSeq)
      // list ordered by (score DESC, dst ASC)
      val byRnk = es.sortBy(_._3).map(e => (e._2, e._4)).toSeq
      assert(byRnk == byRnk.sortBy { case (d, s) => (-s, d) })
    }
    // new nodes got edges, all inside their own cell (and reverse edges
    // to them stay in-cell too — the cell-blocked invariant)
    extra.foreach { case (id, _) =>
      val fwd = grownEdges.filter(_._1 == id)
      assert(fwd.nonEmpty, s"new node $id has no edges")
      fwd.foreach(e => assert(cellOf(e._2) == cellOf(id)))
    }
    grownEdges.filter(e => e._2 > 1000L).foreach { e =>
      assert(cellOf(e._1) == cellOf(e._2),
        s"reverse edge ${e._1}->${e._2} crosses cells") }
    // only new nodes and their chosen neighbors changed
    val baseEdges = graph.select($"src".cast("long"), $"dst".cast("long"),
      $"rnk".cast("long"), $"score").as[(Long, Long, Long, Double)].collect()
    val touched = grownEdges.filter(e => e._2 > 1000L).map(_._1).toSet ++
      extra.map(_._1).toSet
    val beforeBySrc = baseEdges.groupBy(_._1)
    val afterBySrc = grownEdges.groupBy(_._1)
    (beforeBySrc.keySet -- touched).foreach { src =>
      assert(afterBySrc(src).toSet == beforeBySrc(src).toSet,
        s"untouched node $src changed") }
    // each touched existing node's list: every entry comes from its old
    // list or a reverse edge to a new node, is comparator-sorted (checked
    // above), and unless the connectivity guard fired, equals the exact
    // top-k of (old ∪ new reverse) — guard lists differ only by one
    // force-kept new-node edge displacing the worst entry.
    (touched -- extra.map(_._1)).foreach { src =>
      val old = beforeBySrc.getOrElse(src, Array.empty).map(e => (e._2, e._4))
        .sortBy { case (d, s) => (-s, d) }.toSeq
      val got = afterBySrc(src).sortBy(_._3).map(e => (e._2, e._4)).toSeq
      val newRev = got.filter(_._1 > 1000L)
      got.foreach { e =>
        assert(old.contains(e) || e._1 > 1000L, s"foreign edge $e on $src") }
      // caps only ever drop from the tail: surviving old entries are a
      // PREFIX of the old comparator-sorted list (true for the exact
      // top-k merge AND the connectivity guard)
      val oldKept = got.filter(_._1 <= 1000L)
      assert(oldKept == old.take(oldKept.length), s"non-tail drop on $src")
      // exact top-k of (old ∪ retained reverse edges) unless the guard
      // force-kept a pruned newcomer — then a new edge must be present
      val exact = (old ++ newRev).sortBy { case (d, s) => (-s, d) }.take(kG)
      if (got != exact)
        assert(newRev.nonEmpty, s"list on $src deviates without a new edge")
    }
  }

  test("insert: batched discovery ≡ sequential reference, edge-for-edge") {
    val kG = 4
    val data = clustered(320, 5)
    val base = data.take(300)
    // 20 extras over 5 cells: plenty of same-cell collisions, so the
    // fold-earlier-rows-at-splice-time path is genuinely exercised
    val extra = data.drop(300).map { case (id, v) => (id + 1000L, v) }
    val docs = base.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 5)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = kG)

    val (gB, cB, editsB) = GraphSearch.insertWithEdits(graph, withCells, ivf,
      extra, kGraph = kG, nprobe = 2, beamWidth = 6, hops = 3)
    val (gS, cS, editsS) = GraphSearch.insertWithEditsSeq(graph, withCells, ivf,
      extra, kGraph = kG, nprobe = 2, beamWidth = 6, hops = 3)
    assert(editsB.keySet == editsS.keySet,
      s"touched sets differ: ${editsB.keySet.diff(editsS.keySet)} / ${editsS.keySet.diff(editsB.keySet)}")
    editsS.foreach { case (src, want) =>
      assert(editsB(src) == want, s"list for $src diverged: ${editsB(src)} vs $want")
    }
    def edgeSet(g: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
      g.select($"src".cast("long"), $"dst".cast("long"),
        $"rnk".cast("long"), $"score").as[(Long, Long, Long, Double)].collect().toSet
    assert(edgeSet(gB) == edgeSet(gS), "composed graphs diverged")
    assert(cB.count() == cS.count())
  }

  test("graph recovery: orphan tmp swept, tombstoned delete completes forward") {
    import graft.operators.SemanticDedup
    val kG = 4
    val data = clustered(300, 5)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 5)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = kG)
    val path = java.nio.file.Files.createTempDirectory("graft-grcv").toString + "/graph"
    GraphSearch.savePartitioned(graph, withCells, path)
    val cells = withCells.select($"cell_id".cast("int")).distinct()
      .as[Int].collect().sorted
    assert(cells.length >= 3)
    def mv(a: String, b: String): Unit =
      assert(new java.io.File(s"$path/$a").renameTo(new java.io.File(s"$path/$b")))
    // 1. ORPHAN TMP: a new-cell insert crashed between the tmp write and
    //    its swap-in — no _gr_old_ marker ever claims it
    new java.io.File(s"$path/_gr_tmp_cell_999").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_gr_tmp_cell_999/part-partial.parquet"),
      Array[Byte](0, 1, 2))
    // 2. TOMBSTONE, post-rename crash: empty-cell delete staged out the
    //    partition, crashed before deleting it — must NOT roll back
    val (cA, cBdel) = (cells(0), cells(1))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$path/_gr_del_cell_$cA"))
    mv(s"cell_id=$cA", s"_gr_old_cell_$cA")
    // 3. TOMBSTONE, pre-rename crash: marker written, partition still live
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$path/_gr_del_cell_$cBdel"))
    // any persisted-maintenance call recovers first; remove one node from
    // a THIRD cell so the real mutation is independent of the recovery
    val victim = withCells.filter($"cell_id" === cells(2))
      .select($"doc_id".cast("long")).as[Long].head()
    GraphSearch.removeNodesPersisted(spark, path, withCells, Seq(victim),
      kGraph = kG, maxCellSize = SemanticDedup.DefaultMaxCellSize)
    assert(!new java.io.File(s"$path/cell_id=$cA").exists(),
      "tombstoned cell rolled BACK — removed nodes resurrected")
    assert(!new java.io.File(s"$path/cell_id=$cBdel").exists(),
      "pre-rename tombstoned cell must be deleted forward")
    val debris = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("_gr_"))
    assert(debris.isEmpty, s"staging debris left: ${debris.mkString(",")}")
    val srcCells = spark.read.parquet(path)
      .select($"cell_id".cast("int")).distinct().as[Int].collect().toSet
    assert(!srcCells.contains(cA) && !srcCells.contains(cBdel))
  }

  test("insert: walks on the grown graph track the rebuilt graph (recall)") {
    val kG = 4
    val data = clustered(320, 5)
    val base = data.take(300)
    val extra = data.drop(300).map { case (id, v) => (id + 1000L, v) }
    val docs = base.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 5)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = kG)
    val (grown, corpus) = GraphSearch.insert(graph, withCells, ivf, extra,
      kGraph = kG, nprobe = 2, beamWidth = 6, hops = 3)

    // the rebuild: same 320 rows, same quantizer, fresh edges
    val allDocs = (base ++ extra).toDF("doc_id", "embedding")
    val rebuiltCorpus = IvfIndex.assign(allDocs, ivf)
    val rebuilt = KnnGraph.cellBlocked(allDocs, ivf, k = kG)

    val overlaps = Seq(7, 105, 260).map { qi =>
      val q = data(qi)._2
      def top(g: org.apache.spark.sql.DataFrame,
              c: org.apache.spark.sql.DataFrame): Set[Long] =
        GraphSearch.searchBeam(g, c, ivf, q, k = 10,
          nprobe = 2, beamWidth = 6, hops = 3)
          .select($"doc_id".cast("long")).as[Long].collect().toSet
      top(grown, corpus).intersect(top(rebuilt, rebuiltCorpus)).size
    }
    // deterministic fixture — the observed floor is well above this
    assert(overlaps.forall(_ >= 6), s"grown-vs-rebuilt overlap too low: $overlaps")
    // new nodes are REACHABLE (the connectivity guard's contract): a
    // deep-enough walk on a new vector's own query finds the node —
    // depth 6 here because the guard guarantees an in-edge, not that it
    // hangs off a 3-hop-from-entry node in a degree-4 cell subgraph
    val (nid, nvec) = extra.head
    val hit = GraphSearch.searchBeam(grown, corpus, ivf, nvec, k = 5,
        nprobe = 2, beamWidth = 8, hops = 6)
      .select($"doc_id".cast("long")).as[Long].collect().toSet
    assert(hit.contains(nid), "inserted node not reachable by its own query")
  }

  test("insertPersisted: only affected cell partitions rewritten, reload ≡ DataFrame insert") {
    val kG = 4
    val data = clustered(320, 5)
    val base = data.take(300)
    val extra = data.drop(300).take(6).map { case (id, v) => (id + 1000L, v) }
    val docs = base.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 5)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = kG)
    val path = java.nio.file.Files.createTempDirectory("graft-gstore").toString + "/graph"
    GraphSearch.savePartitioned(graph, withCells, path)

    def fileState(cell: Int): Set[(String, Long)] = {
      val d = new java.io.File(s"$path/cell_id=$cell")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val allCells = withCells.select($"cell_id".cast("int"))
      .distinct().as[Int].collect().toSeq
    val before = allCells.map(c => c -> fileState(c)).toMap

    // reference: the DataFrame-level insert on identical inputs
    val (grownDf, _) = GraphSearch.insert(graph, withCells, ivf, extra,
      kGraph = kG, nprobe = 2, beamWidth = 6, hops = 3)
    val expect = grownDf.select($"src".cast("long"), $"dst".cast("long"),
      $"rnk".cast("long"), $"score").as[(Long, Long, Long, Double)].collect().toSet

    val (cellsRw, touched) = GraphSearch.insertPersisted(spark, path,
      withCells, ivf, extra, kGraph = kG, nprobe = 2, beamWidth = 6, hops = 3)
    assert(touched >= extra.length.toLong)
    assert(cellsRw >= 1L && cellsRw <= allCells.size.toLong)

    val reloaded = spark.read.parquet(path)
      .select($"src".cast("long"), $"dst".cast("long"),
        $"rnk".cast("long"), $"score").as[(Long, Long, Long, Double)]
      .collect().toSet
    assert(reloaded == expect, "persisted splice diverged from DataFrame insert")
    // cells holding no touched node keep their exact files
    val touchedCells = spark.read.parquet(path)
      .filter($"src".isin(extra.map(_._1): _*) || $"dst".isin(extra.map(_._1): _*))
      .select($"cell_id".cast("int")).distinct().as[Int].collect().toSet
    allCells.filterNot(touchedCells).foreach { c =>
      assert(fileState(c) == before(c), s"untouched cell $c was rewritten") }
    assert(touchedCells.size.toLong == cellsRw)
    // no staging debris
    val debris = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("_gr_"))
    assert(debris.isEmpty)
  }

  test("removeNodesPersisted: affected cells spliced, empty cell dropped, reload ≡ removeNodes") {
    import graft.operators.SemanticDedup
    val kG = 4
    val data = clustered(300, 5)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 5)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = kG)
    val path = java.nio.file.Files.createTempDirectory("graft-grm").toString + "/graph"
    GraphSearch.savePartitioned(graph, withCells, path)
    val cellIds = withCells.select($"cell_id".cast("int")).distinct()
      .as[Int].collect().sorted
    // removed set: a scattered slice PLUS one whole cell (its partition
    // must be deleted outright)
    val wholeCell = cellIds.head
    val cellMembers = withCells.filter($"cell_id" === wholeCell)
      .select($"doc_id".cast("long")).as[Long].collect().toSeq
    val removed = (data.map(_._1).filter(_ % 17 == 0) ++ cellMembers).distinct

    def fileState(cell: Int): Set[(String, Long)] = {
      val d = new java.io.File(s"$path/cell_id=$cell")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val before = cellIds.map(c => c -> fileState(c)).toMap

    val expect = GraphSearch.removeNodes(graph, withCells, removed,
        kGraph = kG, maxCellSize = SemanticDedup.DefaultMaxCellSize)
      .select($"src".cast("long"), $"dst".cast("long"),
        $"rnk".cast("long"), $"score").as[(Long, Long, Long, Double)]
      .collect().toSet

    val (cellsRw, refilled) = GraphSearch.removeNodesPersisted(spark, path,
      withCells, removed, kGraph = kG,
      maxCellSize = SemanticDedup.DefaultMaxCellSize)
    assert(cellsRw >= 1L)
    assert(!new java.io.File(s"$path/cell_id=$wholeCell").exists(),
      "fully-removed cell's partition must be deleted")
    val reloaded = spark.read.parquet(path)
      .select($"src".cast("long"), $"dst".cast("long"),
        $"rnk".cast("long"), $"score").as[(Long, Long, Long, Double)]
      .collect().toSet
    assert(reloaded == expect, "persisted removal diverged from removeNodes")
    // cells holding neither removed nor affected nodes keep exact files
    val affected = graph
      .filter($"dst".isin(removed: _*) && !$"src".isin(removed: _*))
      .select($"src".cast("long")).distinct().as[Long].collect().toSeq
    val touchedCells = withCells
      .filter($"doc_id".isin((removed ++ affected).distinct: _*))
      .select($"cell_id".cast("int")).distinct().as[Int].collect().toSet
    cellIds.filterNot(touchedCells).foreach { c =>
      assert(fileState(c) == before(c), s"untouched cell $c rewritten") }
    assert(refilled >= 0L)
    val debris = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("_gr_"))
    assert(debris.isEmpty)
  }

  test("removeNodes: dangling-free, rebuild-equivalent refill, untouched pass-through") {
    import graft.operators.SemanticDedup
    val kG = 4
    val data = clustered(300, 5)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 5)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = kG)
    val removed = data.map(_._1).filter(_ % 13 == 0)

    val pruned = GraphSearch.removeNodes(graph, withCells, removed,
      kGraph = kG, maxCellSize = SemanticDedup.DefaultMaxCellSize)
    val got = pruned.select($"src".cast("long"), $"dst".cast("long"),
      $"rnk".cast("long"), $"score").as[(Long, Long, Long, Double)].collect()
    val rm = removed.toSet
    got.foreach { e =>
      assert(!rm.contains(e._1) && !rm.contains(e._2), s"dangling edge $e") }

    val base = graph.select($"src".cast("long"), $"dst".cast("long"),
      $"rnk".cast("long"), $"score").as[(Long, Long, Long, Double)].collect()
    val affected = base.filter(e => rm.contains(e._2) && !rm.contains(e._1))
      .map(_._1).toSet
    // untouched nodes keep their exact rows
    val untouchedBase = base.filter(e =>
      !rm.contains(e._1) && !affected.contains(e._1)).toSet
    assert(got.filter(e => !affected.contains(e._1)).toSet == untouchedBase)
    // affected nodes: lists identical to a full rebuild on the shrunken corpus
    val rebuilt = KnnGraph.cellBlocked(
        docs.filter(!$"doc_id".isin(removed: _*)), ivf, k = kG)
      .select($"src".cast("long"), $"dst".cast("long"),
        $"rnk".cast("long"), $"score").as[(Long, Long, Long, Double)].collect()
    affected.foreach { u =>
      assert(got.filter(_._1 == u).toSet == rebuilt.filter(_._1 == u).toSet,
        s"refill for $u differs from rebuild") }
  }
}
