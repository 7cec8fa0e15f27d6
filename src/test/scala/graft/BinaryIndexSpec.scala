package graft

import graft.operators.{BinaryIndex, VectorSearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BinaryIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def randVecs(n: Int, dim: Int = 64): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(777)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(r.nextGaussian().toFloat)))
  }

  /** Sign-disagreement count over the FULL width — the semantic truth
    * the packed kernel must reproduce at any dimension. */
  private def bruteHamming(a: Array[Float], b: Array[Float]): Long =
    a.zip(b).count { case (x, y) => (x > 0f) != (y > 0f) }.toLong

  test("encode packs sign bits exactly, including bit 63 (negative long word)") {
    val v = Array.fill(64)(-1f)
    v(0) = 1f; v(63) = 1f; v(5) = 0f // exact zero must NOT set its bit
    val got = BinaryIndex.encode(Seq((1L, v)).toDF("doc_id", "embedding"))
      .select("code").as[Array[Long]].head()
    assert(got.length == 1)
    assert(got(0) == ((1L << 0) | (1L << 63)))
    assert(got(0) < 0L, "bit 63 must land in the sign bit of the packed word")
  }

  test("multi-word packing covers ALL dims: bit i lands in word i/64, bit i%64") {
    val long72 = Array.fill(72)(1f)
    val short3 = Array[Float](1f, -1f, 1f)
    val v130 = Array.fill(130)(-1f)
    v130(0) = 1f; v130(64) = 1f; v130(129) = 1f // word0 bit0, word1 bit0, word2 bit1
    val got = BinaryIndex.encode(
      Seq((1L, long72), (2L, short3), (3L, v130)).toDF("doc_id", "embedding"))
      .orderBy("doc_id").select("code").as[Array[Long]].collect()
    assert(got(0).toSeq == Seq(-1L, 0xFFL)) // 72 ones = full word + 8 bits
    assert(got(1).toSeq == Seq((1L << 0) | (1L << 2)))
    assert(got(2).toSeq == Seq(1L, 1L, 2L))
  }

  test("driver packOne ≡ the codegen kernel, at 64 and 768 dims") {
    for (dim <- Seq(64, 100, 768)) {
      val data = randVecs(20, dim)
      val fromSpark = BinaryIndex.encode(data.toDF("doc_id", "embedding"))
        .orderBy("doc_id").select("code").as[Array[Long]].collect()
      data.zip(fromSpark).foreach { case ((_, v), code) =>
        assert(BinaryIndex.packOne(v).toSeq == code.toSeq, s"dim=$dim")
      }
    }
  }

  test("hamming top-k matches brute force over FULL-width sign disagreements (768-d)") {
    val data = randVecs(400, dim = 768)
    val docs = data.toDF("doc_id", "embedding")
    val qVec = data.head._2
    val got = BinaryIndex
      .searchHamming(BinaryIndex.encode(docs), BinaryIndex.packOne(qVec), k = 15)
      .as[(Long, Long)].collect().toSeq
    val brute = data
      .map { case (id, v) => (id, bruteHamming(v, qVec)) }
      .sortBy { case (id, d) => (d, id) }.take(15).toSeq
    assert(got == brute)
    // A 64-dim clamp would cap every distance at 64; prove the kernel
    // sees the full width.
    assert(brute.exists(_._2 > 64),
      "fixture must produce distances only a full-width kernel can see")
  }

  test("batch search ≡ per-query single search (multi-word codes)") {
    val data = randVecs(300, dim = 192)
    val codes = BinaryIndex.encode(data.toDF("doc_id", "embedding"))
    val queries = data.take(3)
      .map { case (id, v) => (id, BinaryIndex.packOne(v)) }.toDF("query_id", "q_code")
    val batch = BinaryIndex.searchHammingBatch(queries, codes, k = 7)
      .select("query_id", "doc_id", "hamming")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(p => (p._2, p._1)).toSeq).toMap
    data.take(3).foreach { case (qid, v) =>
      val single = BinaryIndex.searchHamming(codes, BinaryIndex.packOne(v), k = 7)
        .as[(Long, Long)].collect().toSeq
      assert(batch(qid) == single, s"batch/single diverged for query $qid")
    }
  }

  test("aggregated batch ≡ window batch, including rank order (multi-word)") {
    val data = randVecs(400, dim = 192)
    val codes = BinaryIndex.encode(data.toDF("doc_id", "embedding"))
    val queries = data.take(4)
      .map { case (id, v) => (id, BinaryIndex.packOne(v)) }.toDF("query_id", "q_code")
    val window = BinaryIndex.searchHammingBatch(queries, codes, k = 9)
      .select("query_id", "doc_id", "hamming", "doc_rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(t => (t._1, t._4)).toSeq
    val agg = BinaryIndex.searchHammingBatchAggregated(queries, codes, k = 9)
      .select("query_id", "doc_id", "hamming", "doc_rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(t => (t._1, t._4)).toSeq
    assert(agg == window, "aggregated batch diverged from the window form")
  }

  test("widenEmb (Spark) ≡ widenVec (driver): the two 768-d expansions agree") {
    // q84 packs the Spark-widened column; q89/q92 pack the driver-widened
    // query vector — independent implementations of the same rotation
    // blocks, pinned here so the oracles can't silently diverge.
    val data = randVecs(10, dim = 64)
    val fromSpark = data.toDF("vec_id", "embedding")
      .select(col("vec_id"), SparkEntry.widenEmb(col("embedding")).as("w"))
      .orderBy("vec_id").select("w").as[Array[Float]].collect()
    data.zip(fromSpark).foreach { case ((_, v), wide) =>
      assert(SparkEntry.widenVec(v).toSeq == wide.toSeq)
      assert(wide.length == 768)
    }
  }

  test("hamming_words zero-extends the shorter code (mixed-width corpus)") {
    val a = Array.fill(40)(1f)  // 1 word, 40 set bits
    val b = Array.fill(100)(1f) // 2 words, 100 set bits
    val codes = BinaryIndex.encode(
      Seq((1L, a), (2L, b)).toDF("doc_id", "embedding"))
    val got = BinaryIndex.searchHamming(codes, BinaryIndex.packOne(b), k = 2)
      .as[(Long, Long)].collect().toMap
    assert(got(2L) == 0L)
    assert(got(1L) == 60L, "dims the short code lacks count as disagreements")
  }

  test("rangeHamming returns exactly the within-radius set, ordered (768-d)") {
    val data = randVecs(300, dim = 768)
    val codes = BinaryIndex.encode(data.toDF("doc_id", "embedding"))
    val qVec = data(42)._2
    val got = BinaryIndex.rangeHamming(codes, BinaryIndex.packOne(qVec), maxDist = 330)
      .as[(Long, Long)].collect().toSeq
    val brute = data
      .map { case (id, v) => (id, bruteHamming(v, qVec)) }
      .filter(_._2 <= 330).sortBy { case (id, d) => (d, id) }.toSeq
    assert(got == brute)
    assert(got.exists(_._1 == 42L) && got.head == ((42L, 0L)),
      "the query's own vector must rank first at distance 0")
  }

  test("rangeIvfHamming: probe-all ≡ flat range; probed form only misses unprobed cells") {
    import graft.operators.IvfIndex
    val data = randVecs(300, dim = 16)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 4)
    val enc = BinaryIndex.encodeIvf(withCells)
    val qVec = data(5)._2
    val nlistTrained = ivf.centroids.get.length
    val radius = 6
    val flat = BinaryIndex
      .rangeHamming(BinaryIndex.encode(docs), BinaryIndex.packOne(qVec), radius)
      .as[(Long, Long)].collect().toSeq
    val probeAll = BinaryIndex
      .rangeIvfHamming(enc, ivf, qVec, maxDist = radius, nprobe = nlistTrained)
      .select("doc_id", "hamming").as[(Long, Long)].collect().toSeq
    assert(probeAll == flat, "probe-all binary IVF range diverged from flat")
    // nprobe=1: every emitted row is from the probed cell, within radius,
    // and is a subset of the flat result (missed matches live in other
    // cells — the FAISS recall trade, not a scoring divergence).
    val one = BinaryIndex.rangeIvfHamming(enc, ivf, qVec, maxDist = radius, nprobe = 1)
      .select("doc_id", "cell_id", "hamming").as[(Long, Int, Long)].collect()
    val probedCell = IvfIndex.probeCells(ivf, qVec, 1).head
    assert(one.forall(_._2 == probedCell))
    assert(one.forall(_._3 <= radius))
    val flatMap = flat.toMap
    assert(one.forall(r => flatMap.get(r._1).contains(r._3)))
  }

  test("binary IVF: probe-all ≡ flat Hamming; nprobe=1 stays in its cell") {
    import graft.operators.IvfIndex
    val data = randVecs(300, dim = 16)
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 4)
    val enc = BinaryIndex.encodeIvf(withCells)
    val qVec = data(5)._2
    val nlistTrained = ivf.centroids.get.length
    val probeAll = BinaryIndex
      .searchIvfHamming(enc, ivf, qVec, k = 12, nprobe = nlistTrained)
      .select("doc_id", "hamming").as[(Long, Long)].collect().toSeq
    val flat = BinaryIndex
      .searchHamming(BinaryIndex.encode(docs), BinaryIndex.packOne(qVec), k = 12)
      .as[(Long, Long)].collect().toSeq
    assert(probeAll == flat, "probe-all binary IVF diverged from the flat scan")
    val probedCell = IvfIndex.probeCells(ivf, qVec, 1).head
    val cells = BinaryIndex.searchIvfHamming(enc, ivf, qVec, k = 12, nprobe = 1)
      .select("cell_id").as[Int].collect().toSet
    assert(cells == Set(probedCell))
  }

  test("binary IVF with a separate full-width query code (reduced-front posture)") {
    import graft.operators.IvfIndex
    val wide = randVecs(200, dim = 256)
    val narrow = wide.map { case (id, v) => (id, v.take(16)) }
    val docs = narrow.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 4)
    // codes pack the FULL 256-d vectors; cells come from the 16-d front
    val wideDf = wide.toDF("doc_id", "wide_emb")
    val enc = BinaryIndex.encodeIvf(
      withCells.drop("embedding").join(wideDf, "doc_id"), embCol = "wide_emb")
    val qVec = narrow(5)._2
    val qWide = wide(5)._2
    val nlistTrained = ivf.centroids.get.length
    val got = BinaryIndex.searchIvfHamming(enc, ivf, qVec, k = 10,
        nprobe = nlistTrained, queryCode = BinaryIndex.packOne(qWide))
      .select("doc_id", "hamming").as[(Long, Long)].collect().toSeq
    val brute = wide.map { case (id, v) => (id, bruteHamming(v, qWide)) }
      .sortBy { case (id, d) => (d, id) }.take(10).toSeq
    assert(got == brute)
  }

  test("search plan: no exchange, codegen'd scan over the codes projection") {
    val docs = randVecs(300, dim = 768).toDF("doc_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("binplan").toString
    BinaryIndex.encode(docs).write.mode("overwrite").parquet(dir)
    val codes = spark.read.parquet(dir)
    val plan = BinaryIndex.searchHamming(codes, Array.fill(12)(0x5a5a5a5aL), k = 5)
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"binary top-k shuffled:\n$plan")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered top-k:\n$plan")
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    assert(plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty,
      s"binary scan fell out of codegen:\n$plan")
  }

  test("float range search: batch form ≡ brute-force filter, corpus unshuffled") {
    val data = randVecs(300, dim = 16)
    // normalize so scores land in [-1, 1] and thresholds are meaningful
    val norm = data.map { case (id, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (id, v.map(_ / n))
    }
    val docs = norm.toDF("doc_id", "embedding")
    val queries = norm.take(2)
      .map { case (id, v) => (id, v) }.toDF("query_id", "q_embedding")
    val got = VectorSearch.rangeSearchBatch(queries, docs, minScore = 0.5)
      .select("query_id", "doc_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    val brute = (for {
      (qid, qv) <- norm.take(2)
      (id, v) <- norm
      s = v.zip(qv).map { case (a, b) => a.toDouble * b.toDouble }.sum
      if s >= 0.5
    } yield (qid, id, s)).toSet
    assert(got.map(t => (t._1, t._2)) == brute.map(t => (t._1, t._2)))
    got.foreach { case (qid, id, s) =>
      val b = brute.find(t => t._1 == qid && t._2 == id).get._3
      assert(math.abs(s - b) < 1e-6)
    }
    val plan = VectorSearch.rangeSearchBatch(queries, docs, minScore = 0.5)
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"range search shuffled the corpus:\n$plan")
  }

  // ---- IndexBinaryHash / IndexBinaryMultiHash ----

  test("hash keys: flip enumeration sizes and slice extraction") {
    // key of table t = bits [t*b, (t+1)*b) of word 0
    val code = Array(0x0000000000ABCDEFL)
    assert(BinaryIndex.hashKeyOne(code, b = 8, table = 0) == 0xEFL)
    assert(BinaryIndex.hashKeyOne(code, b = 8, table = 1) == 0xCDL)
    assert(BinaryIndex.hashKeyOne(code, b = 8, table = 2) == 0xABL)
    assert(BinaryIndex.probeKeys(0L, b = 8, nflip = 0) == Seq(0L))
    assert(BinaryIndex.probeKeys(0L, b = 8, nflip = 1).size == 9) // 1 + C(8,1)
    assert(BinaryIndex.probeKeys(0L, b = 8, nflip = 2).size == 37) // + C(8,2)
    // every probed key is within nflip bit flips of the query key
    BinaryIndex.probeKeys(0x5AL, b = 8, nflip = 2).foreach { k =>
      assert(java.lang.Long.bitCount(k ^ 0x5AL) <= 2)
    }
  }

  test("hash search ≡ brute force: prefix-distance admit + full-Hamming rank") {
    val data = randVecs(400, dim = 128)
    val codes = BinaryIndex.encode(data.toDF("doc_id", "embedding"))
    val qVec = data.head._2
    val qCode = BinaryIndex.packOne(qVec)
    val hashed = BinaryIndex.hashEncode(codes, b = 8)
    val got = BinaryIndex.searchHash(hashed, qCode, b = 8, nflip = 1, k = 10)
      .as[(Long, Long)].collect().toSeq
    def prefixDist(v: Array[Float]) =
      (0 until 8).count(i => (v(i) > 0f) != (qVec(i) > 0f))
    val brute = data
      .filter { case (_, v) => prefixDist(v) <= 1 }
      .map { case (id, v) => (id, bruteHamming(v, qVec)) }
      .sortBy { case (id, d) => (d, id) }.take(10).toSeq
    assert(got == brute)
    assert(brute.nonEmpty)
  }

  test("multi-hash search ≡ brute force OR of per-table windows; wider than one table") {
    val data = randVecs(400, dim = 128)
    val codes = BinaryIndex.encode(data.toDF("doc_id", "embedding"))
    val qVec = data(7)._2
    val qCode = BinaryIndex.packOne(qVec)
    val hashed = BinaryIndex.hashEncode(codes, b = 8, nhash = 3)
    val got = BinaryIndex.searchMultiHash(hashed, qCode, b = 8, nhash = 3,
        nflip = 1, k = 50)
      .as[(Long, Long)].collect().toSeq
    def windowDist(v: Array[Float], t: Int) =
      (0 until 8).count(i => (v(t * 8 + i) > 0f) != (qVec(t * 8 + i) > 0f))
    val admitted = data.filter { case (_, v) =>
      (0 until 3).exists(t => windowDist(v, t) <= 1)
    }
    val brute = admitted
      .map { case (id, v) => (id, bruteHamming(v, qVec)) }
      .sortBy { case (id, d) => (d, id) }.take(50).toSeq
    assert(got == brute)
    // more tables must admit at least as many candidates as one
    val single = data.count { case (_, v) => windowDist(v, 0) <= 1 }
    assert(admitted.size >= single)
  }

  test("nflip = b covers every bucket: hash search ≡ flat Hamming search") {
    val data = randVecs(200, dim = 64)
    val codes = BinaryIndex.encode(data.toDF("doc_id", "embedding"))
    val qCode = BinaryIndex.packOne(data(3)._2)
    val hashed = BinaryIndex.hashEncode(codes, b = 6)
    val full = BinaryIndex.searchHash(hashed, qCode, b = 6, nflip = 6, k = 12)
      .as[(Long, Long)].collect().toSeq
    val flat = BinaryIndex.searchHamming(codes, qCode, k = 12)
      .as[(Long, Long)].collect().toSeq
    assert(full == flat)
  }

  test("hash probe prunes partitions on a bucket-partitioned corpus") {
    val data = randVecs(300, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft-bhash-").toString
    BinaryIndex.hashEncode(BinaryIndex.encode(data.toDF("doc_id", "embedding")), b = 4)
      .write.mode("overwrite").partitionBy("bucket_0").parquet(dir)
    val hashed = spark.read.parquet(dir)
    val qCode = BinaryIndex.packOne(data(11)._2)
    val df = BinaryIndex.searchHash(hashed, qCode, b = 4, nflip = 1, k = 5)
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    // the static isin must land in a NON-EMPTY PartitionFilters list on
    // the scan (an empty list also prints "PartitionFilters: []")
    assert("PartitionFilters: \\[[^\\]]*bucket_0".r.findFirstIn(scan).isDefined,
      s"probe keys not in PartitionFilters:\n$scan")
  }
}
