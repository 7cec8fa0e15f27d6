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
}
