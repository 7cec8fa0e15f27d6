package graft

import graft.operators.{IvfIndex, KnnGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KnnGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clustered(n: Int, nClusters: Int, dim: Int = 16): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(909)
    val anchors = Array.fill(nClusters)(Array.fill(dim)(r.nextGaussian().toFloat * 4f))
    (0 until n).map { i =>
      val a = anchors(i % nClusters)
      (i.toLong, a.map(x => x + r.nextGaussian().toFloat * 0.05f))
    }
  }

  test("graph matches a driver brute force restricted to cells") {
    val data = clustered(240, 6)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 6)
    val cellOf = withCells.select("doc_id", "cell_id")
      .as[(Long, Int)].collect().toMap
    val got = KnnGraph.cellBlocked(docs, ivf, k = 3)
      .select("src", "dst", "rnk")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val byId = data.toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    data.foreach { case (id, v) =>
      val mates = data.filter { case (o, _) => o != id && cellOf(o) == cellOf(id) }
      val brute = mates
        .map { case (o, ov) => (o, dot(v, ov)) }
        .sortBy { case (o, s) => (-s, o) }.take(3).map(_._1)
      assert(got.getOrElse(id, Seq.empty) == brute, s"neighbors diverged for $id")
    }
  }

  test("cell cap truncates to lowest ids; lone docs are absent") {
    // 2 tight clusters; cap one cell to 5 members
    val data = clustered(60, 2)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 2)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = 2, maxCellSize = 5)
    val members = graph.select("src").distinct().as[Long].collect().toSet
    val cellOf = withCells.select("doc_id", "cell_id")
      .as[(Long, Int)].collect().groupBy(_._2)
    // per cell only the 5 lowest ids may appear as sources
    cellOf.values.foreach { docsInCell =>
      val allowed = docsInCell.map(_._1).sorted.take(5).toSet
      val inCell = members.intersect(docsInCell.map(_._1).toSet)
      assert(inCell.subsetOf(allowed), s"cap leaked: $inCell vs $allowed")
    }
  }

  test("rank window reuses the join partitioning: no exchange on (cell_id, src)") {
    val data = clustered(300, 4)
    val dir = java.nio.file.Files.createTempDirectory("knng").toString
    data.toDF("doc_id", "embedding").write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val ivf = IvfIndex.train(docs, nlist = 4)
    // string inspection: AQE wraps the tree, hiding Exchange nodes from
    // collect() until execution — toString prints the full initial plan
    val plan = KnnGraph.cellBlocked(docs, ivf, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(cell_id"),
      s"expected the cell_id join exchanges:\n$plan")
    assert(!"hashpartitioning\\([^)]*src".r.findFirstIn(plan).isDefined,
      s"window added its own exchange on src — partitioning not reused:\n$plan")
  }
}
