package graft

import graft.operators.LexicalSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LexicalSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("bm25 ranks by tf/df/length; identical docs tie and break by id") {
    val docs = Seq(
      (1L, "spark vector vector vector"),
      (2L, "spark vector"),
      (3L, "spark spark spark spark spark spark spark spark"),
      (4L, "other words entirely here"),
      (5L, "spark vector")
    ).toDF("doc_id", "text")
    val got = LexicalSearch.bm25Search(docs, Seq("vector", "spark"), k = 4)
      .as[(Long, Double, Long)].collect()
    // rare term with high tf dominates; identical docs 2/5 tie and
    // order by id; common-term-only doc ranks last; doc 4 never matches.
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 5L, 3L))
    assert(got(1)._2 == got(2)._2)
    assert(got.forall(_._2 > 0))
    assert(got(0)._3 == 2 && got(3)._3 == 1)
  }

  test("bm25 validates inputs and normalizes query terms") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](LexicalSearch.bm25Search(docs, Nil, 5))
    intercept[IllegalArgumentException](LexicalSearch.bm25Search(docs, Seq("a"), 0))
    // case/duplicate-insensitive query terms
    val r = LexicalSearch.bm25Search(docs, Seq("ALPHA", "alpha "), k = 5)
      .as[(Long, Double, Long)].collect()
    assert(r.length == 1 && r(0)._3 == 1)
  }

  private def corpus = (1L to 60L).map { i =>
    val extra = if (i % 3 == 0) " merge merge" else ""
    val pad = (1L to (i % 7)).map(j => s"w$j").mkString(" ")
    (i, s"doc $i stream vector$extra $pad")
  }.toDF("doc_id", "text")

  test("indexed bm25 ≡ scan-time bm25, including under posting-list sharding") {
    val terms = Seq("vector", "merge", "stream")
    val direct = LexicalSearch.bm25Search(corpus, terms, k = 15)
      .as[(Long, Double, Long)].collect().toSeq
    val stats = LexicalSearch.corpusStats(corpus)
    for (shard <- Seq(LexicalSearch.DefaultPostingShard, 8L)) {
      val idx = LexicalSearch.invertedIndex(corpus, shardSize = shard)
      val viaIdx = LexicalSearch.bm25SearchIndexed(idx, stats, terms, k = 15)
        .as[(Long, Double, Long)].collect().toSeq
      assert(viaIdx == direct, s"shardSize=$shard diverged")
    }
    // sharding actually split something at 8
    val sharded = LexicalSearch.invertedIndex(corpus, shardSize = 8L)
    assert(sharded.filter(col("shard") > 0).count() > 0)
    // df is GLOBAL across shards: same per term at any shard size
    val df1 = LexicalSearch.invertedIndex(corpus)
      .select("term", "df").distinct().as[(String, Long)].collect().toMap
    val df8 = sharded.select("term", "df").distinct()
      .as[(String, Long)].collect().toMap
    assert(df1 == df8)
  }

  test("inverted index postings carry id-sorted (id, tf, dl)") {
    val docs = Seq(
      (10L, "a b a"),
      (2L, "a c"),
      (5L, "b b b")
    ).toDF("doc_id", "text")
    val idx = LexicalSearch.invertedIndex(docs)
      .as[(String, Long, Long, Seq[(Long, Long, Long)])].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(idx("a") == ((2L, Seq((2L, 1L, 2L), (10L, 2L, 3L)))))
    assert(idx("b") == ((2L, Seq((5L, 3L, 3L), (10L, 1L, 3L)))))
    assert(idx("c") == ((1L, Seq((2L, 1L, 2L)))))
    val stats = LexicalSearch.corpusStats(docs)
      .as[(Long, Long)].collect()(0)
    assert(stats == ((3L, 8L)))
  }

  test("saved index: search ≡ direct; term filter prunes buckets, no index-side exchange") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-lexidx").toString
    val terms = Seq("vector", "merge")
    val idx = LexicalSearch.invertedIndex(corpus)
    val stats = LexicalSearch.corpusStats(corpus)
    // Plant a stale partial build: saveIndex must clobber it (retry-safe),
    // not fail CTAS on the non-empty location.
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "postings"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "postings", "part-stale.parquet"),
      Array[Byte](1, 2, 3))
    val tbl = LexicalSearch.saveIndex(idx, stats, root, buckets = 16)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      val (idxT, statsT) = LexicalSearch.openIndex(spark, root, buckets = 16)
      val viaSaved = LexicalSearch.bm25SearchIndexed(idxT, statsT, terms, k = 10)
      val direct = LexicalSearch.bm25Search(corpus, terms, k = 10)
      assert(viaSaved.as[(Long, Double, Long)].collect().toSeq ==
        direct.as[(Long, Double, Long)].collect().toSeq)
      // The index scan prunes to the query terms' buckets — the whole
      // point of bucketing on term: a 2-term lookup must not scan 16
      // buckets' files. AQE off for the assertion only: completed
      // QueryStageExec nodes hide their subplans from collect (the
      // bucket pruning itself is planned by FileSourceStrategy before
      // AQE ever wraps the stage).
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val viaSaved2 = LexicalSearch.bm25SearchIndexed(idxT, statsT, terms, k = 10)
      viaSaved2.collect()
      val scans = viaSaved2.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec if s.bucketedScan => s
      }
      assert(scans.nonEmpty, "no bucketed scan in the saved-index plan")
      val pruned = scans.head.metadata("SelectedBucketsCount")
      val m = "(\\d+) out of (\\d+)".r.findFirstMatchIn(pruned)
      assert(m.exists(g => g.group(1).toInt <= terms.size &&
        g.group(2).toInt == 16), s"no bucket pruning: $pruned")
      // Fresh-catalog reopen path: drop the table, openIndex re-issues DDL.
      spark.sql(s"DROP TABLE $tbl")
      val (idxT2, statsT2) = LexicalSearch.openIndex(spark, root, buckets = 16)
      assert(LexicalSearch.bm25SearchIndexed(idxT2, statsT2, terms, k = 10)
        .as[(Long, Double, Long)].collect().toSeq ==
        direct.as[(Long, Double, Long)].collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("rrfFuse sums reciprocal ranks in list order; absent docs contribute 0") {
    val lex = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val vec = Seq((2L, 1L), (4L, 2L), (1L, 3L)).toDF("doc_id", "rank")
    val got = LexicalSearch.rrfFuse(Seq("lex" -> lex, "vec" -> vec), k = 10)
      .collect()
    def r(i: Long) = 1.0 / (60 + i)
    val expect = Map(
      1L -> BigDecimal(r(1) + r(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      2L -> BigDecimal(r(2) + r(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      3L -> BigDecimal(r(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      4L -> BigDecimal(r(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 1L, 4L, 3L))
    got.foreach { row =>
      assert(math.abs(row.getDouble(1) - expect(row.getLong(0))) < 1e-9)
    }
    // rank columns survive with nulls where absent
    val doc4 = got.find(_.getLong(0) == 4L).get
    assert(doc4.isNullAt(2) && doc4.getLong(3) == 2L)
    intercept[IllegalArgumentException](
      LexicalSearch.rrfFuse(Seq("a" -> lex, "a" -> vec), 5))
    intercept[IllegalArgumentException](LexicalSearch.rrfFuse(Nil, 5))
  }
}
