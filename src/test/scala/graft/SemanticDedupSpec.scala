package graft

import graft.operators.{IvfIndex, SemanticDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Unit-normalized clustered corpus: members of a cluster are
    * near-duplicates (cos ≈ 1), cross-cluster cos is far lower. */
  private def clustered(n: Int, nClusters: Int, dim: Int = 16): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(99)
    val anchors = Array.fill(nClusters)(Array.fill(dim)(r.nextGaussian()))
    def unit(v: Array[Double]): Array[Float] = {
      val n2 = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n2).toFloat)
    }
    (0 until n).map { i =>
      val a = anchors(i % nClusters)
      (i.toLong, unit(a.map(x => x + r.nextGaussian() * 0.02)))
    }
  }

  test("resolve keeps exactly one member per group: the centroid-farthest") {
    val data = clustered(240, 6)
    val docs = data.toDF("doc_id", "embedding")
    val ivf = IvfIndex.train(docs, nlist = 6)
    val res = SemanticDedup.resolve(docs, ivf, minCos = 0.9)
      .select("id", "comp", "score", "kept")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(res.nonEmpty, "tight clusters must produce semantic dups")
    val byComp = res.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.count(_._4) == 1, s"comp $comp kept != 1")
      val kept = members.find(_._4).get
      val best = members.maxBy(m => (m._3, -m._1))
      assert(kept._1 == best._1,
        s"comp $comp kept ${kept._1}, expected farthest-from-centroid ${best._1}")
    }
  }

  test("pairs: cell-blocked, thresholded, capped deterministically") {
    val data = clustered(120, 4)
    val docs = data.toDF("doc_id", "embedding")
    val ivf = IvfIndex.train(docs, nlist = 4)
    val pairs = SemanticDedup.pairs(docs, ivf, minCos = 0.9, maxCellSize = 10)
      .select("cell_id", "id_a", "id_b", "cos")
      .as[(Int, Long, Long, Double)].collect()
    assert(pairs.forall(p => p._2 < p._3))
    assert(pairs.forall(_._4 >= 0.9))
    // Cap: with 4 cells at 30 members truncated to 10 lowest ids, no id
    // beyond each cell's 10th may appear.
    val celled = IvfIndex.assign(docs, ivf).select("doc_id", "cell_id")
      .as[(Long, Int)].collect()
    val allowed = celled.groupBy(_._2).valuesIterator.flatMap(ms =>
      ms.map(_._1).sorted.take(10).toSeq).toSet
    val seen = pairs.flatMap(p => Seq(p._2, p._3)).toSet
    assert(seen.subsetOf(allowed), "capped-out ids leaked into pairs")
    // All pair members share the blocking cell.
    val cellOf = celled.toMap
    assert(pairs.forall(p => cellOf(p._2) == p._1 && cellOf(p._3) == p._1))
  }

  test("pairs plan: equality join on cell, no cartesian product") {
    val docs = clustered(120, 4).toDF("doc_id", "embedding")
    val ivf = IvfIndex.train(docs, nlist = 4)
    val plan = SemanticDedup.pairs(docs, ivf, minCos = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"semantic pairs went all-pairs:\n$plan")
  }

  test("resolveAssigned over the persisted store: ≡ resolve, ZERO assign kernels") {
    val data = clustered(200, 4)
    val dir = java.nio.file.Files.createTempDirectory("semstore").toString
    data.toDF("doc_id", "embedding").write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val ivf = IvfIndex.train(docs, nlist = 4)
    // ingest-time work: the cell-partitioned store (the ivfCorpus layout)
    val storeDir = java.nio.file.Files.createTempDirectory("semstore2").toString
    IvfIndex.assign(docs, ivf).write.mode("overwrite")
      .partitionBy("cell_id").parquet(storeDir)
    val withCells = spark.read.parquet(storeDir)

    val fromStore = SemanticDedup.resolveAssigned(withCells, ivf, minCos = 0.9)
    val got = fromStore.select("id", "comp", "score", "kept")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val reference = SemanticDedup.resolve(docs, ivf, minCos = 0.9)
      .select("id", "comp", "score", "kept")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2, t._4)) == reference.map(t => (t._1, t._2, t._4)))
    got.zip(reference).foreach { case (g, r) => assert(math.abs(g._3 - r._3) < 1e-9) }

    // dedup over the persisted store must be a pure READ of ingest-time
    // assignment: no nearest_centroid_f32 anywhere in the executed plan
    fromStore.collect()
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(!plan.contains("nearest_centroid_f32"),
      s"resolveAssigned re-assigned the corpus at query time:\n$plan")
  }
}
