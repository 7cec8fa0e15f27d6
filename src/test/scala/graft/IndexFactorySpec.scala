package graft

import graft.operators._
import graft.operators.IndexFactory.{Descriptor, Flat, PQ, SQ8Code, SQ4Code, LshCode, PcaPre, OpqPre, ItqPre}
import org.scalatest.funsuite.AnyFunSuite

class IndexFactorySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clustered(n: Int, nClusters: Int, dim: Int = 16): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(31337)
    val anchors = Array.fill(nClusters)(Array.fill(dim)(r.nextGaussian().toFloat * 4f))
    (0 until n).map { i =>
      val a = anchors(i % nClusters)
      (i.toLong, a.map(x => x + r.nextGaussian().toFloat * 0.05f))
    }
  }

  test("parse covers the supported FAISS descriptor grammar") {
    assert(IndexFactory.parse("Flat") == Descriptor(None, None, Flat, false))
    assert(IndexFactory.parse("IVF64,Flat") == Descriptor(None, Some(64), Flat, false))
    assert(IndexFactory.parse("IVF64") == Descriptor(None, Some(64), Flat, false))
    assert(IndexFactory.parse("PQ8") == Descriptor(None, None, PQ(8), false))
    assert(IndexFactory.parse("IVF256,PQ16") == Descriptor(None, Some(256), PQ(16), false))
    assert(IndexFactory.parse("IVF64,PQ8,RFlat") == Descriptor(None, Some(64), PQ(8), true))
    assert(IndexFactory.parse("SQ8") == Descriptor(None, None, SQ8Code, false))
    assert(IndexFactory.parse("SQ4") == Descriptor(None, None, SQ4Code, false))
    assert(IndexFactory.parse("IVF16,SQ4") == Descriptor(None, Some(16), SQ4Code, false))
    assert(IndexFactory.parse("IVF16,SQ4,RFlat") == Descriptor(None, Some(16), SQ4Code, true))
    assert(IndexFactory.parse("LSH") == Descriptor(None, None, LshCode, false))
    assert(IndexFactory.parse("PCA16,Flat") == Descriptor(Some(PcaPre(16)), None, Flat, false))
    assert(IndexFactory.parse("IVF16,SQ8,RFlat") == Descriptor(None, Some(16), SQ8Code, true))
    assert(IndexFactory.parse("OPQ8,PQ8") == Descriptor(Some(OpqPre(8)), None, PQ(8), false))
    assert(IndexFactory.parse("IVF16,SQ8") == Descriptor(None, Some(16), SQ8Code, false))
    assert(IndexFactory.parse("BIVF16") == Descriptor(None, Some(16), LshCode, false))
    assert(IndexFactory.parse("OPQ16,IVF64,PQ16") == Descriptor(Some(OpqPre(16)), Some(64), PQ(16), false))
    assert(IndexFactory.parse("ITQ32,LSH") == Descriptor(Some(ItqPre(32)), None, LshCode, false))
    assert(IndexFactory.parse("ITQ,LSH") == Descriptor(Some(ItqPre(0)), None, LshCode, false))
    assert(IndexFactory.parse("IVF64,PQ8+16") ==
      Descriptor(None, Some(64), IndexFactory.PQR(8, 16), false))
    assert(IndexFactory.parse("BHash8") ==
      Descriptor(None, None, IndexFactory.BHashCode(8, 1), false))
    assert(IndexFactory.parse("BMultiHash3x8") ==
      Descriptor(None, None, IndexFactory.BHashCode(8, 3), false))
  }

  test("unsupported descriptors fail loudly, naming the string") {
    // PCAR = PCA + random rotation in FAISS: rejected, not silently
    // mapped to plain PCA; Flat,RFlat would re-rank already-exact scores
    Seq("HNSW32", "NSG32", "IVF64,LSH", "PQ8,RFlat", "Flat,Extra", "OPQ16,PQ8",
      "OPQ8,Flat", "PCA8,BIVF16", "BIVF16,Flat", "PCAR8,IVF4,PQ4",
      "IVF64,Flat,RFlat", "SQ8,RFlat", "SQ4,RFlat",
      "ITQ8,Flat", "ITQ8,PQ4", "ITQ8,BIVF16",
      "PQ8+8", "IVF16,PQ4+4,RFlat",
      "PCA8,BHash8", "BHash8,RFlat", "BMultiHash3x8,Flat", "ITQ8,BMultiHash3x8")
      .foreach { bad =>
        val e = intercept[IllegalArgumentException](IndexFactory.parse(bad))
        assert(e.getMessage.contains(bad.split(",")(0)) ||
          e.getMessage.contains("index_factory") ||
          e.getMessage.contains("RFlat"), s"opaque error for '$bad': $e")
      }
  }

  test("factory builds ≡ direct operator calls") {
    val data = clustered(300, 4)
    val docs = data.toDF("doc_id", "embedding")
    val q = data(7)._2

    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").as[Long].collect().toSeq

    // Flat
    assert(ids(IndexFactory.build(spark, docs, "Flat").search(q, 10)) ==
      ids(VectorSearch.knnScores(docs, q, 10)))

    // IVF4,Flat — both sides train their own KMeans on identical input;
    // training is seeded, so the quantizers agree
    val (withCells, ivf) = IvfIndex.build(docs, 4)
    assert(ids(IndexFactory.build(spark, docs, "IVF4,Flat").search(q, 10)) ==
      ids(IvfIndex.searchScores(withCells, ivf, q, 10, nprobe = 4)))

    // SQ8
    val sq = SqIndex.train(docs)
    val sqEnc = SqIndex.encode(docs, sq).select("doc_id", "codes")
    assert(ids(IndexFactory.build(spark, docs, "SQ8").search(q, 10)) ==
      ids(SqIndex.search(sqEnc, sq, q, 10)))

    // SQ4 (packed nibbles through the shared AdcLut scan)
    val sq4 = SqIndex.train4(docs)
    val sq4Enc = SqIndex.encode4(docs, sq4).select("doc_id", "codes")
    assert(ids(IndexFactory.build(spark, docs, "SQ4").search(q, 10)) ==
      ids(SqIndex.search4(sq4Enc, sq4, q, 10)))

    // LSH (binary sign codes)
    val codes = BinaryIndex.encode(docs)
    assert(ids(IndexFactory.build(spark, docs, "LSH").search(q, 10)) ==
      ids(BinaryIndex.searchHamming(codes, BinaryIndex.packOne(q), 10)))

    // PCA8,Flat — projection front then exact scan
    val pca = PcaTransform.train(docs, 8)
    val projected = PcaTransform.project(docs, pca)
      .select($"doc_id", $"pca")
    assert(ids(IndexFactory.build(spark, docs, "PCA8,Flat").search(q, 10)) ==
      ids(PcaTransform.search(projected, pca, q, 10)))

    // ITQ8,LSH — trained-rotation binary front then Hamming scan
    val itq = ItqTransform.train(docs, 8)
    val itqCodes = ItqTransform.encode(docs, itq)
    assert(ids(IndexFactory.build(spark, docs, "ITQ8,LSH").search(q, 10)) ==
      ids(ItqTransform.search(itqCodes, itq, q, 10)))

    // BHash6 / BMultiHash3x6 — hash-bucketed binary (1-flip probe)
    val hashed1 = BinaryIndex.hashEncode(codes, b = 6)
    assert(ids(IndexFactory.build(spark, docs, "BHash6").search(q, 10)) ==
      ids(BinaryIndex.searchHash(hashed1, BinaryIndex.packOne(q),
        b = 6, nflip = 1, k = 10)))
    val hashed3 = BinaryIndex.hashEncode(codes, b = 6, nhash = 3)
    assert(ids(IndexFactory.build(spark, docs, "BMultiHash3x6").search(q, 10)) ==
      ids(BinaryIndex.searchMultiHash(hashed3, BinaryIndex.packOne(q),
        b = 6, nhash = 3, nflip = 1, k = 10)))
  }

  test("RQ2x3: factory ≡ direct RqIndex chain; unsupported RQ combos fail loudly") {
    import graft.operators.RqIndex
    val data = clustered(300, 4)
    val docs = data.toDF("doc_id", "embedding")
    val q = data(7)._2
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").as[Long].collect().toSeq
    val rq = RqIndex.train(docs, nlevels = 2, k = 8)
    val enc = RqIndex.encode(docs, rq).select($"doc_id", $"codes")
    assert(ids(IndexFactory.build(spark, docs, "RQ2x3").search(q, 10)) ==
      ids(RqIndex.search(enc, rq, q, 10)))
    // IVF over RQ and refined RQ are not FAISS-parity paths here — loud
    intercept[IllegalArgumentException](IndexFactory.parse("IVF4,RQ2x3"))
    intercept[IllegalArgumentException](IndexFactory.parse("RQ2x3,RFlat"))
    intercept[IllegalArgumentException](IndexFactory.parse("OPQ4,RQ2x3"))
  }

  test("OPQ,IVF,PQ: rotation front + rotated-space IVFADC ≡ direct chain") {
    import graft.operators.{OpqTransform, PqIndex}
    val data = clustered(300, 4)
    val docs = data.toDF("doc_id", "embedding")
    val q = data(7)._2

    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").as[Long].collect().toSeq

    // Direct chain: train rotation, rotate corpus, IVF + residual PQ in
    // rotated space, rotated query — all training seeded, so the factory
    // (which trains its own artifacts on identical input) agrees.
    val rot = OpqTransform.train(docs, m = 4)
    val rotated = OpqTransform.rotate(docs, rot)
      .select($"doc_id", $"rot".as("embedding"))
    val (withCells, ivf) = IvfIndex.build(rotated, 4)
    val (enc, pq) = PqIndex.buildIvfAdc(withCells, ivf, m = 4)
    val direct = ids(PqIndex.searchIvfAdc(
      enc.select($"doc_id", $"cell_id", $"codes"), ivf, pq,
      OpqTransform.rotateOne(rot, q), k = 10, nprobe = 2))
    val viaFactory = ids(IndexFactory.build(spark, docs, "OPQ4,IVF4,PQ4",
      nprobe = 2).search(q, 10))
    assert(viaFactory == direct)
  }

  test("IVF,PQ and the RFlat refinement produce k results from the probed cells") {
    val data = clustered(400, 4)
    val docs = data.toDF("doc_id", "embedding")
    val q = data(3)._2
    val ivfpq = IndexFactory.build(spark, docs, "IVF4,PQ4").search(q, 5)
    assert(ivfpq.count() == 5)
    val refined = IndexFactory.build(spark, docs, "IVF4,PQ4,RFlat").search(q, 5)
    assert(refined.count() == 5)
    // refinement re-ranks with exact scores: its top-1 must be at least
    // as good (by exact dot) as the unrefined top-1
    def exactDot(id: Long): Double = {
      val v = data(id.toInt)._2
      v.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum
    }
    val top1Refined = refined.select("doc_id").as[Long].collect().head
    val top1Raw = ivfpq.select("doc_id").as[Long].collect().head
    assert(exactDot(top1Refined) >= exactDot(top1Raw) - 1e-9)
  }

  test("IVF,PQ4+4: factory ≡ direct IVFPQR chain") {
    val data = clustered(400, 4)
    val docs = data.toDF("doc_id", "embedding")
    val q = data(3)._2
    val got = IndexFactory.build(spark, docs, "IVF4,PQ4+4").search(q, 5)
      .select("doc_id", "rdist").as[(Long, Double)].collect().toSeq
    val (withCells, ivf) = IvfIndex.build(docs, 4)
    val (enc, pq1, pq2) = PqIndex.buildIvfPqr(withCells, ivf, m = 4, mRefine = 4)
    val exp = PqIndex.searchIvfPqr(enc, ivf, pq1, pq2, q, k = 5,
        rerank = 50, nprobe = 4)
      .select("doc_id", "rdist").as[(Long, Double)].collect().toSeq
    assert(got == exp)
  }

  test("IVF,SQ8,RFlat: exact re-rank over SQ8 candidates (the ADVICE'd branch)") {
    val data = clustered(400, 4)
    val docs = data.toDF("doc_id", "embedding")
    val q = data(3)._2
    def exactDot(id: Long): Double = {
      val v = data(id.toInt)._2
      v.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum
    }
    val raw = IndexFactory.build(spark, docs, "IVF4,SQ8").search(q, 5)
    val refined = IndexFactory.build(spark, docs, "IVF4,SQ8,RFlat").search(q, 5)
    assert(refined.count() == 5)
    // refined output is ranked by the EXACT inner product (knnScores
    // column shape), so its ids must be in exact-score order
    val ids = refined.select("doc_id").as[Long].collect().toSeq
    assert(ids == ids.sortBy(id => (-exactDot(id), id)),
      s"refined SQ8 output not exact-ordered: $ids")
    val top1Raw = raw.select("doc_id").as[Long].collect().head
    assert(exactDot(ids.head) >= exactDot(top1Raw) - 1e-9)
  }
}
