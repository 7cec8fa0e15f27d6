package graft

import graft.functions.GraftFunctions
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity pin for the `rep_stats` kernel: its integer fields must equal
  * the composed HOF forms (`topBigramFraction`'s sort+run-length fold,
  * `dupLineStats`'s split→distinct→char sums) field-for-field — the
  * `screen_flags` precedent. q55/q60 compute their oracle-checked
  * ratios from these integers, so kernel ≡ HOF ⇒ oracle parity holds. */
class RepStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  GraftFunctions.register(SparkTestBase.spark)

  private def fixture(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private val edgeTexts = Seq(
    "",                                   // no tokens, no lines
    "solo",                               // one token → 0 bigrams
    "a b a b a",                          // top bigram "a b" ×2 of 4
    "x x x x",                            // all-equal bigrams
    "A b a B",                            // lowering folds bigrams together
    "  padded   tokens  here  ",          // trim + multi-space runs
    "line one\nline one\nline two",       // repeated line
    "dup\n  dup  \ndup\n\n\nother",       // line trim + empties
    "\ttab lead\nx y\ttab inner",         // \t is a token split but NOT line-trimmed
    "café café café",      // non-ASCII + code-point lengths
    "a\nb\nc\na\nb\na")

  private def randomTexts(n: Int): Seq[String] = {
    val r = new scala.util.Random(991)
    val words = Seq("the", "cat", "sat", "on", "a", "mat", "Dog", "RAN")
    (0 until n).map { _ =>
      val nLines = r.nextInt(6)
      (0 until nLines).map { _ =>
        val nw = r.nextInt(8)
        (0 until nw).map(_ => words(r.nextInt(words.length))).mkString(" ")
      }.mkString("\n")
    }
  }

  test("kernel ≡ HOF forms on edge cases and 200 random docs") {
    val df = fixture(edgeTexts ++ randomTexts(200))
    val both = df.select(
      col("doc_id"),
      GraftFunctions.repStats(col("text")).as("k"),
      TextAnalysis.bigramCount(col("text")).as("h_nbg"),
      TextAnalysis.topBigramFraction(col("text")).as("h_frac"),
      TextAnalysis.dupLineStats(col("text")).as("h_d"))
    both.collect().foreach { row =>
      val id = row.getLong(0)
      val k = row.getStruct(1)
      assert(k.getLong(0) == row.getLong(2), s"n_bigrams diverged on doc $id")
      val kernelFrac =
        if (k.getLong(0) == 0) 0.0
        else BigDecimal(k.getLong(1).toDouble / k.getLong(0))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(kernelFrac - row.getDouble(3)) < 1e-12,
        s"top_frac diverged on doc $id: kernel=$kernelFrac hof=${row.getDouble(3)}")
      val d = row.getStruct(4)
      assert(k.getLong(2) == d.getLong(0), s"n_lines diverged on doc $id")
      assert(k.getLong(3) == d.getLong(1), s"n_unique diverged on doc $id")
    }
  }

  test("char-mass fields reproduce dupLineStats fractions exactly") {
    val df = fixture(edgeTexts ++ randomTexts(100))
    val rows = df.select(
      GraftFunctions.repStats(col("text")).as("k"),
      TextAnalysis.dupLineStats(col("text")).as("h")).collect()
    rows.foreach { row =>
      val k = row.getStruct(0); val h = row.getStruct(1)
      val nl = k.getLong(2); val nu = k.getLong(3)
      val total = k.getLong(4); val uniq = k.getLong(5)
      val lineFrac = if (nl <= 0) 0.0
        else BigDecimal((nl - nu).toDouble / nl)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val charFrac = if (total <= 0) 0.0
        else BigDecimal((total - uniq).toDouble / total)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(lineFrac - h.getDouble(2)) < 1e-12)
      assert(math.abs(charFrac - h.getDouble(3)) < 1e-12)
    }
  }

  test("engine trim semantics: only 0x20 stripped from lines, \\t preserved") {
    val got = Seq((1L, "\tx\n\tx\n x ")).toDF("doc_id", "text")
      .select(GraftFunctions.repStats(col("text")).as("k"))
      .select("k.n_lines", "k.n_unique_lines").as[(Long, Long)].head()
    // "\tx" twice (identical) and "x" — Java String.trim would merge all 3
    assert(got == ((3L, 2L)))
  }
}
