package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val target = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the rain in spain stays mainly in the plain"),
    (2L, "all the king's horses and all the king's men"))
  private val offDomain = Seq(
    (10L, "zzz qqq xxx vvv kkk jjj www yyy"),
    (11L, "aaa bbb ccc ddd eee fff ggg hhh"))

  test("hashedLm: every bucket present, smoothed probabilities sum to 1") {
    val lm = Dsir.hashedLm(target.toDF("doc_id", "text"), buckets = 64)
    val rows = lm.select("bucket", "cnt", "logp")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 64)
    assert(rows.map(_._1).toSet == (0L until 64L).toSet)
    val psum = rows.map(r => math.exp(r._3)).sum
    assert(math.abs(psum - 1.0) < 1e-9, s"smoothed mass sums to $psum")
  }

  test("logRatio of a corpus against itself is identically zero") {
    val docs = target.toDF("doc_id", "text")
    val lm = Dsir.hashedLm(docs, buckets = 64)
    val lr = Dsir.logRatio(lm, lm).select("lr").as[Double].collect()
    assert(lr.forall(_ == 0.0))
  }

  test("target-like docs outweigh off-domain docs; empty doc weighs zero") {
    val raw = (target ++ offDomain :+ (20L -> "")).toDF("doc_id", "text")
    val ratio = Dsir.logRatio(
      Dsir.hashedLm(target.toDF("doc_id", "text"), buckets = 64),
      Dsir.hashedLm(raw, buckets = 64))
    val w = Dsir.importanceWeights(raw, ratio, buckets = 64)
      .select("doc_id", "dsir_logw", "n_features")
      .as[(Long, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val tMin = target.map(t => w(t._1)._1).min
    val oMax = offDomain.map(t => w(t._1)._1).max
    assert(tMin > oMax,
      s"target docs must outweigh off-domain: min(target)=$tMin max(off)=$oMax")
    assert(w(20L) == ((0.0, 0L)), "empty doc must weigh 0.0 with 0 features")
    // n_features = tokens + bigrams = 2·tokens − 1 for non-empty docs.
    assert(w(0L)._2 == 17L)
  }

  test("dsir_logw expression matches the composed HOF-fold definition") {
    // Mixed scripts, repeated tokens, single-token and empty docs — the
    // shapes where tokenize/hash/fold parity could drift.
    val docs = Seq(
      (0L, "The quick brown fox   the quick"),
      (1L, "Straße über straße ÜBER"),
      (2L, "这是 一个 测试 文档 这是"),
      (3L, "one"),
      (4L, ""),
      (5L, "  padded\ttabs\nnewlines  ")).toDF("doc_id", "text")
    val ratio = Dsir.logRatio(
      Dsir.hashedLm(docs.filter(col("doc_id") < 3), buckets = 64),
      Dsir.hashedLm(docs, buckets = 64))
    val fast = Dsir.importanceWeights(docs, ratio, buckets = 64)
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    // The original composed definition, inlined verbatim.
    val rmap = broadcast(ratio.agg(
      map_from_entries(collect_list(struct(col("bucket"), col("lr"))))
        .as("__rmap")))
    val slow = docs.crossJoin(rmap)
      .withColumn("__f", Dsir.features(col("text")))
      .select(col("doc_id"),
        round(aggregate(col("__f"), lit(0.0),
          (acc, f) => acc + element_at(col("__rmap"), Dsir.bucketOf(f, 64))), 4)
          .as("dsir_logw"),
        size(col("__f")).cast("long").as("n_features"))
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(fast == slow, "single-pass kernel deviates from the fold definition")
  }

  test("dsir_buckets fit kernel matches the composed explode definition") {
    val docs = Seq(
      (0L, "The quick brown fox   the quick"),
      (1L, "Straße über straße ÜBER"),
      (2L, "这是 一个 测试 文档 这是"),
      (3L, "one"),
      (4L, ""),
      (5L, "  padded\ttabs\nnewlines  ")).toDF("doc_id", "text")
    val fast = Dsir.hashedLm(docs, buckets = 64)
      .select("bucket", "cnt").as[(Long, Long)].collect().sortBy(_._1).toSeq
    // The original composed definition, inlined verbatim: explode every
    // feature as a row, bucket it with the Catalyst md5/conv stack.
    val counts = docs
      .select(explode(Dsir.features(col("text"))).as("f"))
      .select(Dsir.bucketOf(col("f"), 64).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().map(t => t._1 -> t._2).toMap
    val slow = (0L until 64L).map(b => b -> counts.getOrElse(b, 0L)).toSeq
    assert(fast == slow, "fit kernel deviates from the explode definition")
  }

  test("gumbelTopK is deterministic, salt-sensitive, and k-bounded") {
    val raw = (target ++ offDomain).toDF("doc_id", "text")
    val ratio = Dsir.logRatio(
      Dsir.hashedLm(target.toDF("doc_id", "text"), buckets = 64),
      Dsir.hashedLm(raw, buckets = 64))
    val w = Dsir.importanceWeights(raw, ratio, buckets = 64)
    def pick(salt: String) =
      Dsir.gumbelTopK(w, k = 3, salt).select("doc_id").as[Long].collect().toSeq
    assert(pick("s1") == pick("s1"), "same salt must reproduce the draw")
    assert(pick("s1").length == 3)
    // Different salts shift the noise; across a few salts at least one
    // draw must differ (all-equal would mean the noise is inert).
    val draws = Seq("s1", "s2", "s3", "s4", "s5").map(pick).distinct
    assert(draws.length > 1, "Gumbel noise never changed the selection")
  }
}
