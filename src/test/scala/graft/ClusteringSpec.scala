package graft

import graft.operators.Clustering
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def randVecs(n: Int, dim: Int = 8, seed: Int = 11): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(r.nextGaussian().toFloat)))
  }

  test("objective is non-increasing across Lloyd iterations") {
    val docs = randVecs(300).toDF("doc_id", "embedding")
    val res = Clustering.lloyd(docs, k = 6, iters = 4)
    val objByIter = res.history.groupBy(_.iter).view
      .mapValues(_.map(_.obj).sum).toMap
    for (i <- 1 until 4)
      assert(objByIter(i + 1) <= objByIter(i) + 1e-6,
        s"objective rose at iter ${i + 1}: ${objByIter(i)} -> ${objByIter(i + 1)}")
    // every point assigned every iteration
    res.history.groupBy(_.iter).foreach { case (_, rows) =>
      assert(rows.map(_.n).sum == 300L)
    }
  }

  test("final assignment matches driver brute-force argmin over final centroids") {
    val data = randVecs(200, dim = 6, seed = 23)
    val docs = data.toDF("doc_id", "embedding")
    val res = Clustering.lloyd(docs, k = 5, iters = 3)
    def assignBrute(v: Array[Float]): Int =
      res.centroids.zipWithIndex.map { case (c, j) =>
        var d2 = 0.0; var i = 0
        while (i < v.length) { val d = v(i).toDouble - c(i); d2 += d * d; i += 1 }
        (d2, j)
      }.minBy { case (d, j) => (d, j) }._2
    // one more assignment pass under the final centroids equals brute force
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val got = docs.select(col("doc_id"),
        graft.functions.GraftFunctions.nearestCentroidF32(col("embedding"),
          typedLit(res.centroids.map(_.toSeq).toSeq)).as("cell"))
      .as[(Long, Int)].collect().toMap
    data.foreach { case (id, v) => assert(got(id) == assignBrute(v), s"id $id") }
  }

  test("duplicate seed loses every tie: its cell empties and keeps its centroid") {
    // seeds: id 0 and id 1 identical -> every point ties and goes to cell 0
    val base = Array.fill(4)(1f)
    val pts = Seq((0L, base), (1L, base.clone())) ++
      randVecs(50, dim = 4, seed = 7).map { case (i, v) => (i + 2L, v) }
    // one iteration: every tie resolves to cell 0, so cell 1 is empty and
    // its centroid survives the update unchanged (next iteration it may
    // legitimately re-acquire points once cell 0's centroid moves away)
    val res = Clustering.lloyd(pts.toDF("doc_id", "embedding"), k = 2, iters = 1)
    assert(!res.history.exists(_.cell == 1), "tied cell 1 must be empty at iter 1")
    assert(res.centroids(1).toSeq == base.map(_.toDouble).toSeq,
      "empty cell must keep its init centroid")
  }

  test("centroids are partitioning-independent (integer-exact update)") {
    val data = randVecs(400, dim = 12, seed = 5)
    val a = Clustering.lloyd(data.toDF("doc_id", "embedding"), k = 7, iters = 3)
    val b = Clustering.lloyd(
      data.toDF("doc_id", "embedding").repartition(13), k = 7, iters = 3)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    assert(a.history == b.history)
  }

  test("spherical mode: updated centroids land on the unit sphere, kept ones don't move") {
    val data = randVecs(200, dim = 8, seed = 31)
    val res = Clustering.lloyd(data.toDF("doc_id", "embedding"),
      k = 5, iters = 3, spherical = true)
    res.centroids.foreach { c =>
      val nrm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-12, s"centroid norm $nrm")
    }
    // objective still non-increasing after the first normalize settles
    val objByIter = res.history.groupBy(_.iter).view
      .mapValues(_.map(_.obj).sum).toMap
    assert(objByIter(3) <= objByIter(2) + 1e-6)
    // empty cell keeps its (raw, unnormalized) init centroid
    val base = Array.fill(4)(2f)
    val pts = Seq((0L, base), (1L, base.clone())) ++
      randVecs(40, dim = 4, seed = 3).map { case (i, v) => (i + 2L, v) }
    val r2 = Clustering.lloyd(pts.toDF("doc_id", "embedding"),
      k = 2, iters = 1, spherical = true)
    assert(r2.centroids(1).toSeq == base.map(_.toDouble).toSeq)
  }

  test("degenerate corpora: all-identical and all-zero vectors are safe") {
    // all points identical: everything ties into cell 0, objective 0
    val same = (0L until 40L).map(i => (i, Array(1f, 2f, 3f)))
    val r = Clustering.lloyd(same.toDF("doc_id", "embedding"), k = 3, iters = 2)
    assert(r.history.forall(s => s.cell == 0 && s.obj == 0.0))
    assert(r.centroids(0).toSeq == Seq(1.0, 2.0, 3.0))
    // all-zero vectors under spherical: the updated mean has zero norm —
    // the division guard must keep the zero vector, not emit NaNs
    val zeros = (0L until 30L).map(i => (i, Array(0f, 0f, 0f, 0f)))
    val rz = Clustering.lloyd(zeros.toDF("doc_id", "embedding"),
      k = 2, iters = 2, spherical = true)
    assert(rz.centroids.forall(_.forall(x => !x.isNaN)))
    assert(rz.centroids(0).toSeq == Seq(0.0, 0.0, 0.0, 0.0))
    assert(rz.history.filter(_.iter == 2).forall(_.obj == 0.0))
  }

  test("partitioning independence holds across seeds (integer-exact updates)") {
    for (seed <- Seq(1, 2, 3)) {
      val data = randVecs(150, dim = 5, seed = seed)
      val a = Clustering.lloyd(data.toDF("doc_id", "embedding"), k = 4, iters = 2)
      val b = Clustering.lloyd(
        data.toDF("doc_id", "embedding").repartition(11), k = 4, iters = 2)
      assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq,
        s"seed $seed diverged")
      assert(a.history == b.history, s"seed $seed history diverged")
    }
  }

  test("weighted lloyd ≡ row replication; unit weights ≡ unweighted") {
    import org.apache.spark.sql.functions.lit
    val base = randVecs(60, dim = 6, seed = 7)
    val w = base.map { case (id, _) => (id % 3 + 1).toInt }
    val weighted = base.zip(w).map { case ((id, v), wi) => (id, v, wi.toLong) }
      .toDF("doc_id", "embedding", "w")
    // replicas keep the originals' ids 0..59 (init = k lowest ids must
    // pick the same seed vectors) and copies land at ids >= 1000
    val replicated = base.zip(w).flatMap { case ((id, v), wi) =>
      (0 until wi).map(r => (if (r == 0) id else 1000L + id * 10 + r, v))
    }.toDF("doc_id", "embedding")
    val a = Clustering.lloyd(weighted, k = 4, iters = 3, weightCol = Some("w"))
    val b = Clustering.lloyd(replicated, k = 4, iters = 3)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    assert(a.history.map(s => (s.iter, s.cell) -> s.n).toMap ==
      b.history.map(s => (s.iter, s.cell) -> s.n).toMap)
    // the two exact objective forms (scaled-long vs decimal) agree to
    // their shared 1e-6 quantization times the corpus mass
    a.history.zip(b.history).foreach { case (x, y) =>
      assert(math.abs(x.obj - y.obj) < 1e-3, s"$x vs $y") }
    // weight 1 everywhere ≡ the unweighted path (identical centroids,
    // occupancies)
    val ones = base.toDF("doc_id", "embedding").withColumn("w", lit(1L))
    val c = Clustering.lloyd(ones, k = 4, iters = 3, weightCol = Some("w"))
    val d = Clustering.lloyd(base.toDF("doc_id", "embedding"), k = 4, iters = 3)
    assert(c.centroids.map(_.toSeq).toSeq == d.centroids.map(_.toSeq).toSeq)
    assert(c.history.map(s => (s.iter, s.cell, s.n)) ==
      d.history.map(s => (s.iter, s.cell, s.n)))
  }

  test("k larger than corpus fails loudly") {
    val docs = randVecs(3).toDF("doc_id", "embedding")
    intercept[IllegalArgumentException] {
      Clustering.lloyd(docs, k = 10, iters = 1)
    }
  }

  test("lloydSweep history is bit-identical to the per-k lloyd runs") {
    val data = randVecs(250, dim = 9, seed = 42)
    val docs = data.toDF("doc_id", "embedding")
    val ks = Seq(3, 5, 8)
    val sweep = Clustering.lloydSweep(docs, ks, iters = 3)
    ks.foreach { k =>
      val single = Clustering.lloyd(docs, k, iters = 3)
      assert(sweep(k) == single.history, s"k=$k history diverged")
    }
    // partitioning independence carries over (integer-exact sums)
    val sweep2 = Clustering.lloydSweep(docs.repartition(13), ks, iters = 3)
    assert(sweep2 == sweep)
  }

  test("lloydSweep: kMax larger than corpus fails loudly") {
    val docs = randVecs(4).toDF("doc_id", "embedding")
    intercept[IllegalArgumentException] {
      Clustering.lloydSweep(docs, Seq(2, 10), iters = 1)
    }
  }
}
