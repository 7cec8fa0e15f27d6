package graft

import graft.functions.{GraftFunctions, UnigramEncodeExpression}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def vm(pairs: (String, Double)*) = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    pairs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  private def seg(w: String, m: java.util.HashMap[String, java.lang.Double],
                  unk: Double, maxLen: Int): Seq[String] =
    UnigramEncodeExpression.viterbi(
      UnigramEncodeExpression.codepoints(w), m, unk, maxLen).toSeq

  test("viterbi picks the max-likelihood segmentation; ties go to the smallest split point") {
    val m = vm("a" -> -2.0, "b" -> -2.5, "c" -> -3.0,
      "ab" -> -1.5, "bc" -> -2.2, "abc" -> -4.9)
    // cross-checked against the DuckDB recursive-CTE prototype
    assert(seg("abcab", m, -9.9, 3) == Seq("a", "bc", "ab"))
    assert(seg("a", m, -9.9, 3) == Seq("a"))
    // exact tie: "ab"+"c" = -1.5-3.0 = -4.5 vs "a"+"bc" = -2.0-2.2 = -4.2
    // (no tie there) — force one: x,y,xy with xy = x+y exactly
    val t = vm("x" -> -1.0, "y" -> -2.0, "xy" -> -3.0)
    // dp(2) candidates: j=0 "xy" = -3.0, j=1 x+y = -3.0 → smallest j wins
    assert(seg("xy", t, -9.9, 2) == Seq("xy"))
  }

  test("unknown single codepoints take the UNK floor; multi-cp absences never win") {
    val m = vm("a" -> -1.0, "aa" -> -1.5)
    assert(seg("aqa", m, -7.0, 2) == Seq("a", "q", "a"))
    // "qq" absent and len-2 → -inf; must fall back to two UNK chars
    assert(seg("qq", m, -7.0, 2) == Seq("q", "q"))
    // segmentation always reconstructs the word exactly
    for (w <- Seq("aqa", "qq", "aaa", "aaaa"))
      assert(seg(w, m, -7.0, 2).mkString == w)
  }

  test("unigram_encode kernel matches the driver viterbi on a real corpus") {
    val docs = (0 until 40).map { i =>
      (i.toLong, s"the quick brown fox jumps over lazy dog number $i " * 3)
    }.toDF("doc_id", "text")
    val model = TextAnalysis.trainUnigram(docs, vocabSize = 40,
      maxWords = 100, emRounds = 2)
    GraftFunctions.register(spark)
    val words = docs
      .select(explode(GraftFunctions.tokenTf(col("text"))).as("e"))
      .select(col("e.token").as("token")).distinct()
    val got = words
      .select(col("token"), GraftFunctions.unigramEncode(col("token"),
        model.pieces.map(p => (p.piece, p.logp)), model.unkLogp).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    val m = vm(model.pieces.map(p => p.piece -> p.logp): _*)
    for ((w, ps) <- got) {
      assert(ps == seg(w, m, model.unkLogp, model.maxLen), s"word $w")
      assert(ps.mkString == w)
      assert(ps.forall(p => m.containsKey(p) ||
        p.codePointCount(0, p.length) == 1))
    }
  }

  test("unigramTokenCountPerDoc matches a word-by-word driver recount; tokenless docs are 0/0") {
    val docs = Seq(
      (0L, "aa ab aa ba"),
      (1L, "zz zz q"),
      (2L, "   "), // tokenless -> 0/0
      (3L, "ab")
    ).toDF("doc_id", "text")
    val model = TextAnalysis.trainUnigram(
      (0 until 30).map(i => (i.toLong, "aa ab ba zz q aab " * 2)).toDF("doc_id", "text"),
      vocabSize = 12, maxWords = 50, emRounds = 2)
    val got = TextAnalysis.unigramTokenCountPerDoc(docs, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m = vm(model.pieces.map(p => p.piece -> p.logp): _*)
    def enc(w: String) = seg(w, m, model.unkLogp, model.maxLen)
    val expected = Map(
      0L -> (4L, Seq("aa", "ab", "aa", "ba").map(enc(_).size.toLong).sum),
      1L -> (3L, (enc("zz").size * 2 + enc("q").size).toLong),
      2L -> (0L, 0L),
      3L -> (1L, enc("ab").size.toLong))
    assert(got == expected)
    // the packing composition: bins never split a doc, per-shard cumsum
    val withSrc = TextAnalysis.unigramTokenCountPerDoc(
      docs.withColumn("source", lit("s")), model, keepCols = Seq("source"))
    val bins = graft.operators.Packing.assignBinsByCost(withSrc, budget = 4,
        costCol = "n_uni_tokens")
      .select("doc_id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cumulative-before: doc0 starts at 0 -> bin 0; later docs at
    // floor(cum/4) — recompute directly
    var cum = 0L
    for (id <- 0L to 3L) {
      assert(bins(id) == cum / 4, s"doc $id")
      cum += expected(id)._2
    }
  }

  test("tokenizerCompare coverage: all-fallback corpus rates 1.0, vocab-covered words lower it") {
    // corpus A: every word segments to single chars under a model whose
    // multi-cp pieces never appear in it
    val train = (0 until 30).map(i => (i.toLong, "aa ab ba q zz " * 3)).toDF("doc_id", "text")
    val model = TextAnalysis.trainUnigram(train, vocabSize = 12,
      maxWords = 50, emRounds = 2)
    val merges = TextAnalysis.trainBpe(train, nMerges = 4, maxWords = 50)
    val rows = TextAnalysis.tokenizerCompare(train, merges, model)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5))).toMap
    for ((_, (nWords, nTok, nChar, rate)) <- rows) {
      assert(nWords > 0 && nTok > 0)
      assert(nChar >= 0 && nChar <= nTok)
      assert(rate >= 0.0 && rate <= 1.0)
      // exact: rate is the rounded ratio of the two integer columns
      assert(rate == BigDecimal(nChar.toDouble / nTok)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // a trained vocab on its own corpus must NOT be pure fallback
    assert(rows("unigram")._4 < 1.0)
  }

  test("training is deterministic and partitioning-invariant") {
    val docs = (0 until 60).map { i =>
      (i.toLong, s"alpha beta gamma delta epsilon word$i data " * 2)
    }.toDF("doc_id", "text")
    val m1 = TextAnalysis.trainUnigram(docs, vocabSize = 40, maxWords = 100)
    val m2 = TextAnalysis.trainUnigram(docs.repartition(7), vocabSize = 40,
      maxWords = 100)
    assert(m1.unkLogp == m2.unkLogp)
    assert(m1.pieces == m2.pieces) // exact doubles, piece for piece
  }

  test("driver seed rule equals the gated unigramSeedCounts operator") {
    val docs = (0 until 30).map { i =>
      (i.toLong, s"sharing sharding shipping shaping item$i " * 2)
    }.toDF("doc_id", "text")
    // DF operator's view
    val df = TextAnalysis.unigramSeedCounts(docs, maxWords = 100, minLen = 2,
      maxLen = 4, topK = 15).collect().map(r => (r.getString(0), r.getLong(1)))
    // the trainer's driver-side recomputation of the same rule
    GraftFunctions.register(spark)
    val words = docs
      .select(explode(GraftFunctions.tokenTf(col("text"))).as("e"))
      .select(col("e.token").as("token"), col("e.tf").as("tf"))
      .groupBy("token").agg(sum("tf").cast("long").as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- words) {
      val cps = UnigramEncodeExpression.codepoints(w)
      for (st <- cps.indices; l <- 2 to 4 if st + l <= cps.length)
        sub.updateWith(cps.slice(st, st + l).mkString)(v =>
          Some(v.getOrElse(0L) + c))
    }
    val exp = sub.toSeq.sortBy { case (p, n) => (-n, p) }.take(15)
    assert(df.toSeq == exp)
  }
}
