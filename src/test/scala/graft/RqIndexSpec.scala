package graft

import graft.operators.{RqIndex, VectorSearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RqIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clustered(n: Int, nClusters: Int, dim: Int = 16): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(909)
    val anchors = Array.fill(nClusters)(Array.fill(dim)(r.nextGaussian().toFloat * 5f))
    (0 until n).map { i =>
      val a = anchors(i % nClusters)
      (i.toLong, a.map(x => x + r.nextGaussian().toFloat * 0.3f))
    }
  }

  test("below TrainMin stays untrained; encode degrades to zero codes") {
    val small = clustered(40, 4).toDF("doc_id", "embedding")
    val rq = RqIndex.train(small, nlevels = 2, k = 8)
    assert(!rq.isTrained)
    val codes = RqIndex.encode(small, rq).select("codes").as[Seq[Int]].collect()
    assert(codes.forall(_ == Seq(0, 0)))
  }

  /** Two-scale corpus: coarse anchors (spread 5) + fine sub-anchors
    * (spread 1) + tiny jitter — structure at BOTH levels, so the
    * additive decomposition has something real to capture per level. */
  private def twoScale(n: Int, dim: Int = 16): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(909)
    val anchors = Array.fill(8)(Array.fill(dim)(r.nextGaussian().toFloat * 5f))
    val subs = Array.fill(4)(Array.fill(dim)(r.nextGaussian().toFloat * 1f))
    (0 until n).map { i =>
      val a = anchors(i % 8)
      val sVec = subs((i / 8) % 4)
      (i.toLong, Array.tabulate(dim)(j =>
        a(j) + sVec(j) + r.nextGaussian().toFloat * 0.05f))
    }
  }

  test("two residual levels: recon-dot search finds the cluster; level 2 refines level 1") {
    val data = twoScale(400)
    val docs = data.toDF("doc_id", "embedding")
    val rq = RqIndex.train(docs, nlevels = 2, k = 8)
    assert(rq.isTrained)
    val encoded = RqIndex.encode(docs, rq)
    val qId = 5L
    val qVec = data.find(_._1 == qId).get._2
    val top = RqIndex.search(encoded, rq, qVec, k = 10)
      .select("doc_id").as[Long].collect().toSeq
    val mates = data.filter(_._1 % 8 == qId % 8).map(_._1).toSet
    assert(top.forall(mates.contains), s"non-cluster-mate in RQ top-10: $top")
    // Additive refinement: mean ‖x − decode₂(x)‖² < mean ‖x − decode₁(x)‖².
    val lvls = rq.levels.get
    def meanErr(useLevels: Int): Double = {
      val codesById = encoded.select("doc_id", "codes")
        .as[(Long, Seq[Int])].collect().toMap
      data.map { case (id, v) =>
        val cs = codesById(id)
        val rec = new Array[Double](v.length)
        (0 until useLevels).foreach { l =>
          val c = lvls(l)(cs(l))
          var j = 0
          while (j < v.length) { rec(j) += c(j); j += 1 }
        }
        v.zip(rec).map { case (x, r) => (x - r) * (x - r) }.sum
      }.sum / data.size
    }
    assert(meanErr(2) < meanErr(1) * 0.8,
      s"level 2 did not refine: ${meanErr(1)} -> ${meanErr(2)}")
    // Recall vs exact on this well-separated corpus.
    val exact = VectorSearch.knnScores(docs, qVec, 10)
      .select("doc_id").as[Long].collect().toSet
    assert(top.toSet.intersect(exact).size >= 7,
      s"RQ recall@10 too low: ${top.toSet.intersect(exact).size}")
  }

  test("decode is the additive sum; reconstructionError matches driver replay") {
    val data = twoScale(300)
    val docs = data.toDF("doc_id", "embedding")
    val rq = RqIndex.train(docs, nlevels = 2, k = 8)
    val lvls = rq.levels.get
    val codes = RqIndex.encode(docs, rq).select("doc_id", "codes")
      .as[(Long, Seq[Int])].collect().toMap
    val decoded = RqIndex.decode(RqIndex.encode(docs, rq), rq)
      .select("doc_id", "recon").as[(Long, Seq[Float])].collect().toMap
    val errs = RqIndex.reconstructionError(docs, rq)
      .select("doc_id", "err").as[(Long, Double)].collect().toMap
    data.foreach { case (id, v) =>
      val cs = codes(id)
      val expect = Array.tabulate(v.length) { j =>
        cs.zipWithIndex.foldLeft(0.0) { case (acc, (c, l)) =>
          acc + lvls(l)(c)(j)
        }.toFloat
      }
      assert(decoded(id) == expect.toSeq, s"decode mismatch for doc $id")
      val expErr = math.sqrt(v.zip(expect)
        .map { case (x, r) => (x.toDouble - r.toDouble) * (x.toDouble - r.toDouble) }.sum)
      assert(math.abs(errs(id) - expErr) < 1e-9, s"err mismatch for doc $id")
    }
  }

  test("save/load round-trips the level codebooks (identical encodes)") {
    val docs = clustered(300, 8).toDF("doc_id", "embedding")
    val rq = RqIndex.train(docs, nlevels = 2, k = 8)
    val path = java.nio.file.Files.createTempDirectory("rq").toString + "/cb.txt"
    RqIndex.save(spark, rq, path)
    val re = RqIndex.load(spark, path)
    assert(re.nlevels == rq.nlevels && re.k == rq.k)
    val a = RqIndex.encode(docs, rq).select("doc_id", "codes")
      .as[(Long, Seq[Int])].collect().toMap
    val b = RqIndex.encode(docs, re).select("doc_id", "codes")
      .as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
  }

  test("search plan: no exchange, codes-only TakeOrdered") {
    val data = clustered(300, 8)
    val docs = data.toDF("doc_id", "embedding")
    val rq = RqIndex.train(docs, nlevels = 2, k = 8)
    val dir = java.nio.file.Files.createTempDirectory("rqp").toString
    RqIndex.encode(docs, rq).select("doc_id", "codes").write.parquet(s"$dir/codes")
    val encoded = spark.read.parquet(s"$dir/codes")
    val plan = RqIndex.search(encoded, rq, data(3)._2, k = 5)
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"RQ top-k shuffled:\n$plan")
    assert(plan.toString.contains("TakeOrderedAndProject"))
  }
}
