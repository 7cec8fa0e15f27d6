package graft

import graft.functions.{Embedders, HashEmbedder}
import graft.operators.Cancellation
import org.scalatest.funsuite.AnyFunSuite

class EmbeddersSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("embedPartitioned matches the scalar embedder, any partitioning") {
    val docs = (0 until 50).map(i => (i.toLong, s"text number $i about topic ${i % 5}"))
      .toDF("doc_id", "text").repartition(7)
    val got = Embedders.embedPartitioned(docs, "text", "doc_id", dim = 32, batchSize = 8)
      .as[(Long, Array[Float])].collect().toMap
    assert(got.size == 50)
    (0 until 50).foreach { i =>
      assert(got(i.toLong).toSeq == HashEmbedder.embed(s"text number $i about topic ${i % 5}", 32).toSeq)
    }
  }

  test("dimension mismatch from a bad encoder fails loudly") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val bad = () => new Embedders.Encoder {
      def encodeBatch(texts: Seq[String]): Seq[Array[Float]] =
        texts.map(_ => new Array[Float](3))
    }
    val ex = intercept[Exception] {
      Embedders.embedPartitioned(docs, "text", "doc_id", dim = 8,
        makeEncoder = Some(bad)).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") ||
      ex.getCause != null)
  }

  test("checked-in q62 weight fixture is exactly saveLinearWeights(8, 32)") {
    // The q62 oracle regenerates the weights from the same md5 formula;
    // this pins the CHECKED-IN artifact to that formula so fixture drift
    // cannot hide between the jar resource and the SQL replay.
    val tmp = java.nio.file.Files.createTempDirectory("graft-lwfix").toString + "/w.txt"
    Embedders.saveLinearWeights(outDim = 8, inDim = 32, tmp)
    val regenerated = java.nio.file.Files.readString(java.nio.file.Paths.get(tmp))
    val checkedIn = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/linear_w8x32.txt"), "UTF-8").mkString
    assert(checkedIn == regenerated)
    // And the resource: scheme loads it (the executor-side path q62 uses).
    val enc = Embedders.linearEncoder("resource:/graft/linear_w8x32.txt")()
    val v = enc.encodeBatch(Seq("alpha beta alpha")).head
    assert(v.length == 8)
    assert(math.abs(v.map(x => x * x.toDouble).sum - 1.0) < 1e-6)
  }

  test("weight-file-backed linear encoder: artifact round-trip, determinism, unit norm") {
    val path = java.nio.file.Files.createTempDirectory("graft-lw").toString + "/weights.txt"
    Embedders.saveLinearWeights(outDim = 16, inDim = 64, path)
    val docs = (0 until 40).map(i => (i.toLong, s"doc $i about topic ${i % 4} and spark"))
      .toDF("doc_id", "text").repartition(5)
    val enc = Embedders.linearEncoder(path)
    val got = Embedders.embedPartitioned(docs, "text", "doc_id", dim = 16,
      batchSize = 8, makeEncoder = Some(enc)).as[(Long, Array[Float])].collect().toMap
    assert(got.size == 40)
    // per-partition loads produce identical vectors to a fresh local encoder
    val local = enc()
    (0 until 40).foreach { i =>
      val expect = local.encodeBatch(Seq(s"doc $i about topic ${i % 4} and spark")).head
      assert(got(i.toLong).toSeq == expect.toSeq)
    }
    // unit-norm like the model-backed reference (embedding_service parity)
    got.values.foreach { v =>
      val n = math.sqrt(v.map(x => x * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // same words, different counts -> different direction (it IS a bag model)
    val a = local.encodeBatch(Seq("alpha beta")).head.toSeq
    val b = local.encodeBatch(Seq("alpha beta beta")).head.toSeq
    assert(a != b)
    // the dim validation guards weight/model mismatch exactly like ONNX would
    intercept[Exception] {
      Embedders.embedPartitioned(docs, "text", "doc_id", dim = 32,
        makeEncoder = Some(enc)).collect()
    }
  }

  test("cancellation: job group cancel aborts a running job") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    CancelProbe.started = false
    val fut = Future {
      Cancellation.runCancellable(spark, "cancel-test", "slow job") {
        spark.range(1000000000L).mapPartitions { it =>
          CancelProbe.started = true
          it.map { i => if (i % 1000 == 0) Thread.sleep(1); i }
        }.count()
      }
    }
    val deadline = System.currentTimeMillis() + 30000
    while (!CancelProbe.started && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(CancelProbe.started)
    Cancellation.cancel(spark, "cancel-test")
    val ex = intercept[Exception](Await.result(fut, 60.seconds))
    assert(ex.getMessage.toLowerCase.contains("cancel"))
    // checkpoint helper
    intercept[InterruptedException](Cancellation.checkpoint(() => true))
    Cancellation.checkpoint(() => false) // no-op
  }
}

/** Static probe — object access compiles to a static call, so the task
  * closure captures nothing unserializable (local mode = same JVM). */
object CancelProbe { @volatile var started = false }
