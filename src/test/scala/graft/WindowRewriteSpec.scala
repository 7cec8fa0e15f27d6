package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-17 single-partition-window rewrites (q248, q193) to
  * their original full-corpus global-window forms: the rewrites must be
  * bit-identical on data with heavy ties (q248) and out-of-order
  * arrivals (q193), including the N < 10 NTILE remainder edge. */
class WindowRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def withTempDir(f: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("graft-winrw").toString
    try f(d) finally SparkEntry.rmTree(d)
  }

  private def ntileDeciles(docs: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars"), col("doc_id"))
    docs.select(col("doc_id"), col("n_chars"))
      .withColumn("tile", ntile(10).over(w).cast("long"))
      .groupBy("tile")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min("n_chars").cast("long").as("min_chars"),
        max("n_chars").cast("long").as("max_chars"),
        sum("n_chars").cast("long").as("sum_chars"))
      .orderBy("tile")
  }

  test("q248 rank-arithmetic deciles ≡ single-partition NTILE (heavy ties)") {
    withTempDir { dir =>
      val r = new scala.util.Random(7)
      // n_chars from a small value set: ties straddle tile boundaries,
      // the case a value-cutoff (percentile) form cannot reproduce
      val docs = (0L until 987L).map(i => (i, (r.nextInt(37) + 3).toLong))
        .toDF("doc_id", "n_chars")
      docs.write.parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q248_length_deciles")(spark, dir).collect()
      val exp = ntileDeciles(docs).collect()
      assert(got.toSeq == exp.toSeq)
    }
  }

  test("q248 rewrite: N < 10 (remainder-only tiles) is safe and identical") {
    withTempDir { dir =>
      val docs = Seq((5L, 40L), (1L, 10L), (2L, 10L), (9L, 10L),
        (3L, 99L), (4L, 7L), (8L, 7L)).toDF("doc_id", "n_chars")
      docs.write.parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q248_length_deciles")(spark, dir).collect()
      val exp = ntileDeciles(docs).collect()
      assert(got.toSeq == exp.toSeq)
    }
  }

  test("q193 bucketed running max ≡ single global arrival-order window") {
    withTempDir { dir =>
      val delayNs = 30L * 1000000000L
      val winNs = 600L * 1000000000L
      val base = 1700000000000000000L
      // out-of-order event times over ~9 buckets of 4096 event ids, with
      // late stragglers (large backward jumps) crossing bucket edges
      val ev = (0L until 37000L).map { i =>
        val jitter = ((i * 1103515245L + 12345L) % 2000L) - 1000L
        (i, base + i * 100000000L + jitter * 1000000000L)
      }.toDF("event_id", "ts")
      ev.write.parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q193_watermark_audit")(spark, dir).collect()
      val w = org.apache.spark.sql.expressions.Window.orderBy("event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val exp = ev
        .withColumn("__wm", max("ts").over(w) - delayNs)
        .withColumn("__late", col("__wm").isNotNull && col("ts") < col("__wm"))
        .groupBy(expr(s"ts div $winNs").as("win"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(when(col("__late"), 1L).otherwise(0L)).cast("long").as("n_late"),
          coalesce(max(when(col("__late"), col("__wm") - col("ts"))), lit(0L))
            .cast("long").as("max_lateness_ns"))
        .orderBy("win").collect()
      assert(got.toSeq == exp.toSeq)
    }
  }
}
