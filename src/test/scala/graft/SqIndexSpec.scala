package graft

import graft.operators.SqIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SqIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clustered(n: Int, nClusters: Int, dim: Int = 16): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(4321)
    val anchors = Array.fill(nClusters)(Array.fill(dim)(r.nextGaussian().toFloat * 5f))
    (0 until n).map { i =>
      val a = anchors(i % nClusters)
      (i.toLong, a.map(x => x + r.nextGaussian().toFloat * 0.05f))
    }
  }

  test("below TrainMin stays untrained; encode degrades to zero codes") {
    val small = clustered(40, 4).toDF("doc_id", "embedding")
    val sq = SqIndex.train(small)
    assert(!sq.isTrained)
    val codes = SqIndex.encode(small, sq).select("codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 16 && c.forall(_ == 0)))
  }

  test("codes are in [0,255]; bounds rows reconstruct to themselves") {
    val docs = clustered(300, 8).toDF("doc_id", "embedding")
    val sq = SqIndex.train(docs)
    assert(sq.isTrained)
    val codes = SqIndex.encode(docs, sq).select("codes").as[Seq[Int]].collect()
    assert(codes.forall(_.forall(c => c >= 0 && c <= 255)))
    // Per dim, the corpus min must encode to 0 and the max to 255 (the
    // affine map is exact at its endpoints).
    val perDim = codes.toSeq.transpose
    assert(perDim.forall(d => d.min == 0 && d.max == 255),
      "trained bounds must span the full code range")
  }

  test("save/load round-trips bounds exactly (identical encodes)") {
    val docs = clustered(300, 8).toDF("doc_id", "embedding")
    val sq = SqIndex.train(docs)
    val path = java.nio.file.Files.createTempDirectory("sq").toString + "/bounds.txt"
    SqIndex.save(spark, sq, path)
    val re = SqIndex.load(spark, path)
    val a = SqIndex.encode(docs, sq).select("doc_id", "codes")
      .as[(Long, Seq[Int])].collect().toMap
    val b = SqIndex.encode(docs, re).select("doc_id", "codes")
      .as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
  }

  test("SQ8 search finds the query's cluster; score matches driver replay") {
    val data = clustered(400, 8)
    val docs = data.toDF("doc_id", "embedding")
    val sq = SqIndex.train(docs)
    val encoded = SqIndex.encode(docs, sq)
    val qId = 5L
    val qVec = data.find(_._1 == qId).get._2
    val top = SqIndex.search(encoded, sq, qVec, k = 10)
      .select("doc_id", "codes", "score")
      .as[(Long, Seq[Int], Double)].collect()
    val mates = data.filter(_._1 % 8 == qId % 8).map(_._1).toSet
    assert(top.forall(t => mates.contains(t._1)),
      s"non-cluster-mate in SQ8 top-10: ${top.map(_._1).toSeq}")
    // Column score == driver-side LUT replay (same double op order).
    val lut = SqIndex.reconDotLut(sq, qVec)
    top.foreach { case (_, codes, score) =>
      val replay = codes.zipWithIndex.map { case (c, i) => lut(i)(c) }.sum
      assert(math.abs(replay - score) < 1e-9, s"score drift: $replay vs $score")
    }
    // The distributed top-k must equal a driver brute-force over the
    // quantized scores (search's actual contract; exact-float top-10 can
    // legitimately differ within a cluster — per-dim quantization error
    // step/2 is comparable to the 0.05 jitter).
    val allCodes = SqIndex.encode(docs, sq).select("doc_id", "codes")
      .as[(Long, Seq[Int])].collect()
    val brute = allCodes
      .map { case (id, cs) =>
        (id, cs.zipWithIndex.map { case (c, i) => lut(i)(c) }.sum)
      }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSeq
    assert(top.map(_._1).toSeq == brute,
      "distributed SQ8 top-10 diverged from the driver replay")
  }

  test("search plan: no exchange, codes-only scan, codegen'd kernel") {
    val data = clustered(300, 8)
    val docs = data.toDF("doc_id", "embedding")
    val sq = SqIndex.train(docs)
    val dir = java.nio.file.Files.createTempDirectory("sqplan").toString
    SqIndex.encode(docs, sq).select("doc_id", "codes")
      .write.mode("overwrite").parquet(dir)
    val encoded = spark.read.parquet(dir)
    val plan = SqIndex.search(encoded, sq, data.head._2, k = 5)
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"SQ8 top-k shuffled:\n$plan")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered top-k:\n$plan")
    assert(plan.toString.contains("adc_lut"),
      s"expected the adc_lut kernel in the plan:\n$plan")
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    assert(plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty,
      s"SQ8 scan fell out of codegen:\n$plan")
  }

  test("decode inverts encode at the trained endpoints") {
    val docs = clustered(300, 8).toDF("doc_id", "embedding")
    val sq = SqIndex.train(docs)
    val vmin = sq.vmin.get
    val step = sq.step.get
    val endpoints = Seq(
      (1L, vmin.map(_.toFloat)),
      (2L, vmin.indices.map(i => (vmin(i) + 255.0 * step(i)).toFloat).toArray))
      .toDF("doc_id", "embedding")
    val recon = SqIndex.decode(SqIndex.encode(endpoints, sq), sq)
      .orderBy("doc_id").select("recon").as[Seq[Float]].collect()
    // decode(encode(vmin)) = float(vmin); decode(encode(vmax)) = float(vmax)
    assert(recon(0) == vmin.map(_.toFloat).toSeq)
    assert(recon(1) == vmin.indices
      .map(i => (vmin(i) + 255.0 * step(i)).toFloat).toSeq)
  }

  test("reconstruction error is bounded by the per-dim quantization step") {
    val data = clustered(300, 8)
    val docs = data.toDF("doc_id", "embedding")
    val sq = SqIndex.train(docs)
    val step = sq.step.get
    // worst case per dim is step/2 (round-to-nearest); allow float slack
    val bound = math.sqrt(step.map(s => (s / 2 + 1e-4) * (s / 2 + 1e-4)).sum)
    val errs = SqIndex.reconstructionError(docs, sq)
      .select("err").as[Double].collect()
    assert(errs.length == 300)
    assert(errs.forall(e => e >= 0 && e <= bound),
      s"recon error exceeded the step bound $bound: max ${errs.max}")
  }

  test("IVF-SQ8: probe-all search matches a driver reconstruction brute force") {
    import graft.operators.IvfIndex
    val data = clustered(300, 4)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 4)
    val sq = SqIndex.trainResidual(withCells, ivf)
    val enc = SqIndex.encodeIvf(withCells, ivf, sq)
    val got = SqIndex.searchIvf(enc, ivf, sq, data.head._2, k = 10, nprobe = 4)
      .select("doc_id").as[Long].collect().toSeq
    // driver replay: residual -> byte code -> recon = cent + decode; IP score
    val cents = ivf.centroids.get
    val cellOf = withCells.select("doc_id", "cell_id")
      .as[(Long, Int)].collect().toMap
    val vmin = sq.vmin.get
    val step = sq.step.get
    val brute = data.map { case (id, v) =>
      val c = cents(cellOf(id))
      val score = v.indices.map { i =>
        val res = (v(i).toDouble - c(i)).toFloat
        val t = if (step(i) == 0) 0
        else math.max(0, math.min(255,
          math.floor((res.toDouble - vmin(i)) / step(i) + 0.5).toInt))
        data.head._2(i).toDouble * (c(i) + vmin(i) + t * step(i))
      }.sum
      (id, score)
    }.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    assert(got == brute, "IVF-SQ8 probe-all diverged from driver replay")
  }

  test("IVF-SQ8: nprobe=1 returns rows only from the probed cell") {
    import graft.operators.IvfIndex
    val data = clustered(300, 4)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 4)
    val sq = SqIndex.trainResidual(withCells, ivf)
    val enc = SqIndex.encodeIvf(withCells, ivf, sq)
    val probedCell = IvfIndex.probeCells(ivf, data.head._2, 1).head
    val cells = SqIndex.searchIvf(enc, ivf, sq, data.head._2, k = 10, nprobe = 1)
      .select("cell_id").as[Int].collect().toSet
    assert(cells == Set(probedCell))
  }

  test("untrained decode yields zero vectors") {
    val small = clustered(40, 4).toDF("doc_id", "embedding")
    val sq = SqIndex.train(small)
    val recon = SqIndex.decode(SqIndex.encode(small, sq), sq)
      .select("recon").as[Seq[Float]].collect()
    assert(recon.forall(r => r.length == 16 && r.forall(_ == 0f)))
  }

  // ---- SQ4 (QT_4bit, packed nibbles) --------------------------------

  /** Driver-side 4-bit code of one dim — the kernel's formula. */
  private def sq4Code(x: Float, vmin: Double, step: Double): Int =
    if (step == 0.0) 0
    else {
      val t = math.floor((x.toDouble - vmin) / step + 0.5)
      if (t < 0) 0 else if (t > 15) 15 else t.toInt
    }

  test("SQ4: packed codes unpack to the per-dim 4-bit codes (odd dim too)") {
    for (dim <- Seq(16, 15)) { // even: full pairs; odd: zero low-nibble tail
      val data = clustered(300, 8, dim)
      val docs = data.toDF("doc_id", "embedding")
      val sq = SqIndex.train4(docs)
      assert(sq.isTrained)
      val vmin = sq.vmin.get
      val step = sq.step.get
      val packed = SqIndex.encode4(docs, sq).select("doc_id", "codes")
        .as[(Long, Seq[Int])].collect().toMap
      data.foreach { case (id, v) =>
        val want = v.indices.map(i => sq4Code(v(i), vmin(i), step(i)))
        val ps = packed(id)
        assert(ps.length == (dim + 1) / 2, s"packed length at dim=$dim")
        want.indices.foreach { i =>
          val nib = if (i % 2 == 0) ps(i / 2) / 16 else ps(i / 2) % 16
          assert(nib == want(i), s"dim $i of doc $id (d=$dim)")
        }
        if (dim % 2 == 1)
          assert(ps.last % 16 == 0, "odd tail's low nibble must be 0")
      }
    }
  }

  test("SQ4 search matches a driver brute force over the paired LUT") {
    val data = clustered(400, 8)
    val docs = data.toDF("doc_id", "embedding")
    val sq = SqIndex.train4(docs)
    val encoded = SqIndex.encode4(docs, sq)
    val qVec = data.find(_._1 == 5L).get._2
    val top = SqIndex.search4(encoded, sq, qVec, k = 10)
      .select("doc_id", "codes", "score")
      .as[(Long, Seq[Int], Double)].collect()
    val lut = SqIndex.reconDotLut4(sq, qVec)
    top.foreach { case (_, codes, score) =>
      var acc = 0.0
      codes.indices.foreach(j => acc += lut(j)(codes(j)))
      assert(acc == score, s"score drift: $acc vs $score")
    }
    val all = SqIndex.encode4(docs, sq).select("doc_id", "codes")
      .as[(Long, Seq[Int])].collect()
    val brute = all.map { case (id, cs) =>
      var acc = 0.0
      cs.indices.foreach(j => acc += lut(j)(cs(j)))
      (id, acc)
    }.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSeq
    assert(top.map(_._1).toSeq == brute,
      "distributed SQ4 top-10 diverged from the driver replay")
  }

  test("SQ4 search plan: no exchange, packed-codes scan, codegen'd kernel") {
    val data = clustered(300, 8)
    val docs = data.toDF("doc_id", "embedding")
    val sq = SqIndex.train4(docs)
    val dir = java.nio.file.Files.createTempDirectory("sq4plan").toString
    SqIndex.encode4(docs, sq).select("doc_id", "codes")
      .write.mode("overwrite").parquet(dir)
    val encoded = spark.read.parquet(dir)
    val plan = SqIndex.search4(encoded, sq, data.head._2, k = 5)
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"SQ4 top-k shuffled:\n$plan")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered top-k:\n$plan")
    assert(plan.toString.contains("adc_lut"),
      s"expected the shared adc_lut kernel in the plan:\n$plan")
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    assert(plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty,
      s"SQ4 scan fell out of codegen:\n$plan")
  }

  test("SQ4 decode4 inverts encode at the trained endpoints") {
    val docs = clustered(300, 8).toDF("doc_id", "embedding")
    val sq = SqIndex.train4(docs)
    val vmin = sq.vmin.get
    val step = sq.step.get
    val endpoints = Seq(
      (1L, vmin.map(_.toFloat)),
      (2L, vmin.indices.map(i => (vmin(i) + 15.0 * step(i)).toFloat).toArray))
      .toDF("doc_id", "embedding")
    val recon = SqIndex.decode4(SqIndex.encode4(endpoints, sq), sq)
      .orderBy("doc_id").select("recon").as[Seq[Float]].collect()
    assert(recon(0) == vmin.map(_.toFloat).toSeq)
    assert(recon(1) == vmin.indices
      .map(i => (vmin(i) + 15.0 * step(i)).toFloat).toSeq)
  }

  test("IVF-SQ4: probe-all search matches a driver reconstruction brute force") {
    import graft.operators.IvfIndex
    val data = clustered(300, 4)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 4)
    val sq = SqIndex.trainResidual4(withCells, ivf)
    val enc = SqIndex.encodeIvf4(withCells, ivf, sq)
    val got = SqIndex.searchIvf4(enc, ivf, sq, data.head._2, k = 10, nprobe = 4)
      .select("doc_id").as[Long].collect().toSeq
    // driver replay: float residual -> 4-bit code -> recon = cent + decode
    val cents = ivf.centroids.get
    val cellOf = withCells.select("doc_id", "cell_id")
      .as[(Long, Int)].collect().toMap
    val vmin = sq.vmin.get
    val step = sq.step.get
    val brute = data.map { case (id, v) =>
      val c = cents(cellOf(id))
      val score = v.indices.map { i =>
        val res = (v(i).toDouble - c(i)).toFloat
        val t = if (step(i) == 0) 0
        else math.max(0, math.min(15,
          math.floor((res.toDouble - vmin(i)) / step(i) + 0.5).toInt))
        data.head._2(i).toDouble * (c(i) + vmin(i) + t * step(i))
      }.sum
      (id, score)
    }.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    assert(got == brute, "IVF-SQ4 probe-all diverged from driver replay")
  }

  test("IVF-SQ4: nprobe=1 stays in the probed cell; refined re-rank is exact-ordered") {
    import graft.operators.IvfIndex
    val data = clustered(300, 4)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 4)
    val sq = SqIndex.trainResidual4(withCells, ivf)
    val enc = SqIndex.encodeIvf4(withCells, ivf, sq)
    val q = data.head._2
    val probedCell = IvfIndex.probeCells(ivf, q, 1).head
    val cells = SqIndex.searchIvf4(enc, ivf, sq, q, k = 10, nprobe = 1)
      .select("cell_id").as[Int].collect().toSet
    assert(cells == Set(probedCell))
    def exactDot(id: Long): Double = {
      val v = data(id.toInt)._2
      v.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum
    }
    val ids = SqIndex.searchRefined4(enc, docs, ivf, sq, q,
        k = 5, rerank = 50, nprobe = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == ids.sortBy(id => (-exactDot(id), id)),
      s"refined SQ4 output not exact-ordered: $ids")
  }

  test("SQ4: untrained encode degrades to zero packed codes") {
    for (dim <- Seq(16, 15)) {
      val small = clustered(40, 4, dim).toDF("doc_id", "embedding")
      val sq = SqIndex.train4(small)
      assert(!sq.isTrained)
      val codes = SqIndex.encode4(small, sq).select("codes").as[Seq[Int]].collect()
      assert(codes.forall(c => c.length == (dim + 1) / 2 && c.forall(_ == 0)))
    }
  }
}
