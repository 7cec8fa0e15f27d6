package graft

import graft.sources.{CorpusStore, SessionSink}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StoresSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-test").toString

  test("corpus save / loadOrCreate / append round-trip") {
    val path = tmp() + "/corpus"
    val corpus = Seq((1L, "alpha", Array(1.0f)), (2L, "beta", Array(0.5f)))
      .toDF("doc_id", "content", "embedding")
    // missing path -> empty frame with same schema
    val empty = CorpusStore.loadOrCreate(spark, path, corpus)
    assert(empty.count() == 0 && empty.schema == corpus.schema)
    CorpusStore.save(corpus, path)
    val loaded = CorpusStore.loadOrCreate(spark, path, corpus)
    assert(loaded.count() == 2)
    // append dedups on doc_id
    val more = Seq((2L, "beta-dup", Array(0.5f)), (3L, "gamma", Array(0.1f)))
      .toDF("doc_id", "content", "embedding")
    val appended = CorpusStore.append(loaded, more)
    assert(appended.count() == 3)
    assert(appended.filter(col("doc_id") === 2 && col("content") === "beta-dup").count() == 0)
    // rebuild overwrites
    val rebuilt = CorpusStore.rebuild(spark, path, more)
    assert(rebuilt.count() == 2)
  }

  test("processed-files manifest derives from the corpus and round-trips as JSON") {
    val path = tmp() + "/manifest"
    val corpus = Seq(
      ("a.txt", 0, 900), ("a.txt", 1, 450), ("b.txt", 0, 120)
    ).toDF("filename", "chunk_index", "size")
    val manifest = CorpusStore.writeProcessedManifest(corpus, path)
    assert(manifest.count() == 2)
    val back = spark.read.json(path)
    val a = back.filter(col("filename") === "a.txt").head()
    assert(a.getAs[Long]("n_chunks") == 2L)
    assert(a.getAs[Long]("total_chars") == 1350L)
    assert(a.getAs[Long]("first_chunk") == 0L && a.getAs[Long]("last_chunk") == 1L)
  }

  test("session sink: record, summarize, find stale sessions") {
    val path = tmp() + "/sessions"
    SessionSink.record(spark, path, "s1", "prompt", "prompt_1", "what is spark?")
    SessionSink.record(spark, path, "s1", "result", "result_1", "a framework",
      Map("mode" -> "faiss"))
    SessionSink.record(spark, path, "s2", "prompt", "prompt_1", "hello")
    val sum = SessionSink.summary(SessionSink.load(spark, path)).collect()
    assert(sum.length == 2)
    val s1 = sum.find(_.getString(0) == "s1").get
    assert(s1.getLong(1) == 1 && s1.getLong(2) == 1)
    assert(s1.getSeq[String](3).sorted == Seq("prompt_1", "result_1"))
    val stale = SessionSink.staleSessions(SessionSink.load(spark, path), maxSessions = 1)
    assert(stale.length == 1)
  }

  test("removeIds drops exactly the selected ids (driver-list and frame forms)") {
    val corpus = (0L until 20L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val small = CorpusStore.removeIds(corpus, Seq(3L, 7L, 19L))
    assert(small.select("doc_id").as[Long].collect().sorted.toSeq ==
      (0L until 20L).filterNot(Set(3L, 7L, 19L)).toSeq)
    val big = CorpusStore.removeIdsFrame(corpus,
      Seq(0L, 1L, 2L).toDF("doc_id"))
    assert(big.count() == 17 &&
      big.filter(col("doc_id") < 3).count() == 0)
    // removing an absent id is a no-op, FAISS remove_ids parity
    assert(CorpusStore.removeIds(corpus, Seq(999L)).count() == 20)
  }

  test("merge is an id-disjoint union; left store wins duplicate ids") {
    val left = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val right = Seq((2L, "B"), (3L, "c")).toDF("doc_id", "text")
    val merged = CorpusStore.merge(left, right)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(merged == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("diff classifies added/removed/changed/unchanged by content fp") {
    val old = Seq((1L, "a"), (2L, "b"), (4L, "gone")).toDF("doc_id", "text")
    val neu = Seq((1L, "a"), (2L, "B2"), (3L, "new")).toDF("doc_id", "text")
    val got = CorpusStore.diff(old, neu)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "added", 4L -> "removed"))
  }

  test("diff: NULL text means changed/unchanged, never a fake add/remove") {
    val old = Seq((1L, null: String), (2L, null: String), (3L, "x"))
      .toDF("doc_id", "text")
    val neu = Seq((1L, null: String), (2L, "now set"), (3L, null: String))
      .toDF("doc_id", "text")
    val got = CorpusStore.diff(old, neu)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed"))
  }
}
