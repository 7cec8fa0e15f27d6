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

  private def signCode(v: Array[Float]): Long = {
    var code = 0L
    v.take(64).zipWithIndex.foreach { case (x, i) => if (x > 0f) code |= (1L << i) }
    code
  }

  test("encode packs sign bits exactly, including bit 63 (negative long)") {
    val v = Array.fill(64)(-1f)
    v(0) = 1f; v(63) = 1f; v(5) = 0f // exact zero must NOT set its bit
    val got = BinaryIndex.encode(Seq((1L, v)).toDF("doc_id", "embedding"))
      .select("code").as[Long].head()
    assert(got == ((1L << 0) | (1L << 63)))
    assert(got < 0L, "bit 63 must land in the sign bit of the packed long")
  }

  test("dims past 64 are ignored; short vectors pack their own length") {
    val long72 = Array.fill(72)(1f)
    val short3 = Array[Float](1f, -1f, 1f)
    val got = BinaryIndex.encode(
      Seq((1L, long72), (2L, short3)).toDF("doc_id", "embedding"))
      .orderBy("doc_id").select("code").as[Long].collect()
    assert(got(0) == -1L) // 64 ones = all bits set
    assert(got(1) == ((1L << 0) | (1L << 2)))
  }

  test("hamming top-k matches a driver brute force over sign disagreements") {
    val data = randVecs(400)
    val docs = data.toDF("doc_id", "embedding")
    val qVec = data.head._2
    val got = BinaryIndex
      .searchHamming(BinaryIndex.encode(docs), signCode(qVec), k = 15)
      .as[(Long, Long)].collect().toSeq
    val brute = data
      .map { case (id, v) =>
        (id, v.take(64).zip(qVec.take(64))
          .count { case (a, b) => (a > 0f) != (b > 0f) }.toLong)
      }
      .sortBy { case (id, d) => (d, id) }.take(15).toSeq
    assert(got == brute)
  }

  test("batch search ≡ per-query single search") {
    val data = randVecs(300)
    val codes = BinaryIndex.encode(data.toDF("doc_id", "embedding"))
    val queries = data.take(3)
      .map { case (id, v) => (id, signCode(v)) }.toDF("query_id", "q_code")
    val batch = BinaryIndex.searchHammingBatch(queries, codes, k = 7)
      .select("query_id", "doc_id", "hamming")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(p => (p._2, p._1)).toSeq).toMap
    data.take(3).foreach { case (qid, v) =>
      val single = BinaryIndex.searchHamming(codes, signCode(v), k = 7)
        .as[(Long, Long)].collect().toSeq
      assert(batch(qid) == single, s"batch/single diverged for query $qid")
    }
  }

  test("rangeHamming returns exactly the within-radius set, ordered") {
    val data = randVecs(300)
    val codes = BinaryIndex.encode(data.toDF("doc_id", "embedding"))
    val qVec = data(42)._2
    val got = BinaryIndex.rangeHamming(codes, signCode(qVec), maxDist = 24)
      .as[(Long, Long)].collect().toSeq
    val brute = data
      .map { case (id, v) =>
        (id, v.zip(qVec).count { case (a, b) => (a > 0f) != (b > 0f) }.toLong)
      }
      .filter(_._2 <= 24).sortBy { case (id, d) => (d, id) }.toSeq
    assert(got == brute)
    assert(got.exists(_._1 == 42L) && got.head == ((42L, 0L)),
      "the query's own vector must rank first at distance 0")
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

  test("search plan: no exchange, codegen'd scan over the codes projection") {
    val docs = randVecs(300).toDF("doc_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("binplan").toString
    BinaryIndex.encode(docs).write.mode("overwrite").parquet(dir)
    val codes = spark.read.parquet(dir)
    val plan = BinaryIndex.searchHamming(codes, 0x5a5a5a5aL, k = 5)
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
}
