package graft

import graft.functions.GraftFunctions
import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Separable synthetic corpus: positives share a content vocabulary,
    * negatives another; both carry shared filler so the task is not
    * trivial hash lookup of one token. */
  private def corpus(n: Int): Seq[(Long, String, Boolean)] = {
    val r = new scala.util.Random(808)
    val pos = Seq("insight", "theorem", "analysis", "evidence", "method")
    val neg = Seq("click", "buy", "winner", "prize", "offer")
    val fill = Seq("the", "report", "covers", "topics", "daily")
    (0 until n).map { i =>
      val label = i % 2 == 0
      val vocab = if (label) pos else neg
      val words = (0 until 30).map { _ =>
        if (r.nextDouble() < 0.5) vocab(r.nextInt(vocab.length))
        else fill(r.nextInt(fill.length))
      }
      (i.toLong, words.mkString(" "), label)
    }
  }

  test("learns a separable weak label well above chance") {
    val data = corpus(400)
    val docs = data.toDF("doc_id", "text", "label")
    val m = QualityClassifier.train(docs, col("label"))
    val preds = QualityClassifier.score(docs, m)
      .select("doc_id", "pred").as[(Long, Boolean)].collect().toMap
    val acc = data.count { case (id, _, l) => preds(id) == l }.toDouble / data.size
    assert(acc > 0.9, s"classifier barely learned: accuracy $acc")
  }

  test("distributed score == driver fold replay; empty doc scores the intercept") {
    val data = corpus(200)
    val docs = data.toDF("doc_id", "text", "label")
    val m = QualityClassifier.train(docs, col("label"))
    val withEmpty = (data.map(d => (d._1, d._2)) :+ (999L, ""))
      .toDF("doc_id", "text")
    val got = QualityClassifier.score(withEmpty, m)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(got(999L) == m.intercept, "empty doc must score exactly b")
    // driver replay of the fold over the kernel's own histograms
    GraftFunctions.register(spark)
    val hists = withEmpty.select(col("doc_id"),
        GraftFunctions.dsirBuckets(col("text"), lit(m.buckets)).as("h"))
      .as[(Long, Seq[Long])].collect()
    hists.foreach { case (id, h) =>
      var acc = 0.0
      var i = 0
      while (i < m.buckets) { acc += h(i).toDouble * m.weights(i); i += 1 }
      assert(got(id) == acc + m.intercept, s"fold drift for doc $id")
    }
  }

  test("artifact round-trips exactly; buildOrLoad hits the artifact") {
    val docs = corpus(150).toDF("doc_id", "text", "label")
    val m = QualityClassifier.train(docs, col("label"))
    val path = java.nio.file.Files.createTempDirectory("qc").toString + "/model.txt"
    QualityClassifier.save(spark, m, path)
    val back = QualityClassifier.load(spark, path)
    assert(back.weights.toSeq == m.weights.toSeq &&
      back.intercept == m.intercept)
    val again = QualityClassifier.buildOrLoad(spark,
      docs.limit(0), lit(true), path)
    assert(again.weights.toSeq == m.weights.toSeq)
  }
}
