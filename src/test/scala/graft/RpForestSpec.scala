package graft

import graft.functions.GraftFunctions
import graft.operators.RpForest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RpForestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def corpus(n: Int, dim: Int = 8) = {
    // deterministic spread-out vectors (hash-derived, no RNG)
    (0L until n.toLong).map { id =>
      val v = Array.tabulate(dim) { j =>
        val h = (id * 1000003L + j * 37L) % 997L
        (h.toDouble / 997.0 * 2.0 - 1.0).toFloat
      }
      (id, v)
    }.toDF("doc_id", "embedding")
  }

  test("kernel routing matches the driver replay for every corpus vector") {
    val c = corpus(200)
    val f = RpForest.train(c, trees = 2, depth = 3)
    val assigned = RpForest.assign(c, f)
      .select("doc_id", "tree", "leaf").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val embs = c.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    for ((id, v) <- embs; (tree, leaf) <- RpForest.routeQuery(f, v))
      assert(assigned((id, tree)) == leaf, s"doc $id tree $tree")
  }

  test("training is partitioning-invariant (pole picks are min/max aggregates)") {
    val c = corpus(300)
    val f1 = RpForest.train(c, trees = 2, depth = 3)
    val f2 = RpForest.train(c.repartition(7), trees = 2, depth = 3)
    for (t <- 0 until 2; i <- 0 until 7) {
      assert(java.util.Arrays.equals(f1.planes(t)(i), f2.planes(t)(i)),
        s"plane tree=$t node=${i + 1}")
      assert(f1.thetas(t)(i) == f2.thetas(t)(i))
    }
  }

  test("degenerate nodes (singleton / empty) split as w=0, theta=1 and route left") {
    // 2 distinct points -> after the root split each side holds one
    // member; level-1 nodes are singletons, level-2 nodes half empty
    val c = Seq(
      (0L, Array.fill(4)(1.0f)),
      (1L, Array.fill(4)(-1.0f))
    ).toDF("doc_id", "embedding")
    val f = RpForest.train(c, trees = 1, depth = 3)
    // some deeper node must be degenerate
    val degenerate = (2 to 7).filter { n =>
      f.planes(0)(n - 1).forall(_ == 0.0) && f.thetas(0)(n - 1) == 1.0
    }
    assert(degenerate.nonEmpty)
    // both docs still route to a valid leaf and the full corpus is
    // partitioned (each doc in exactly one leaf per tree)
    val leaves = RpForest.assign(c, f).select("doc_id", "leaf")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(leaves.size == 2)
    assert(leaves.values.forall(l => l >= 0 && l < 8))
  }

  test("search reads only the routed leaf partitions (partition pruning)") {
    val c = corpus(500)
    val f = RpForest.train(c, trees = 2, depth = 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft-rpf-spec").toString + "/store"
    RpForest.assign(c, f)
      .write.mode("overwrite").partitionBy("tree", "leaf").parquet(path)
    val store = spark.read.parquet(path)
    val q = c.filter(col("doc_id") === 42L)
      .select("embedding").head().getSeq[Float](0).toArray
    val res = RpForest.search(store, f, q, k = 5)
    val top = res.collect()
    assert(top.length == 5)
    // scores descend; every hit comes from one of the query's routed
    // leaves (no leakage past the partition filter); the query's own
    // vector is among the candidates scored (it lives in its own leaf —
    // IP ranking need not put it first, larger-norm neighbors can win)
    assert(top.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
    val routed = RpForest.routeQuery(f, q).toSet
    val byDoc = RpForest.assign(c, f).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getInt(2), r.getInt(3))).toSet
      }
    assert(top.forall(r => byDoc(r.getLong(0)).exists(routed.contains)))
    val scan = res.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*tree".r.findFirstIn(scan).isDefined,
      s"expected non-empty partition filters in:\n$scan")
  }

  test("forest artifact round-trips through save/load") {
    val c = corpus(150)
    val f = RpForest.train(c, trees = 2, depth = 3)
    val path = java.nio.file.Files
      .createTempDirectory("graft-rpf-art").toString + "/forest.txt"
    RpForest.save(spark, f, path)
    val g = RpForest.load(spark, path)
    assert(g.trees == f.trees && g.depth == f.depth && g.dim == f.dim)
    for (t <- 0 until f.trees; i <- f.planes(t).indices) {
      assert(java.util.Arrays.equals(f.planes(t)(i), g.planes(t)(i)))
      assert(f.thetas(t)(i) == g.thetas(t)(i))
    }
  }
}
