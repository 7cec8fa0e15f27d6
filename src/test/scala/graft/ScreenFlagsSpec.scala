package graft

import graft.functions.GraftFunctions
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity of the fused `screen_flags` kernel against the composed
  * HOF forms it replaces — field-for-field, exact doubles (identical
  * arithmetic), over real corpus text, crafted edges, and random
  * strings drawn from a screen-relevant alphabet. */
class ScreenFlagsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def compare(texts: Seq[String]): Unit = {
    GraftFunctions.register(spark)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df.select(col("id"),
        GraftFunctions.screenFlags(col("text"), lit(50), lit(100000),
          lit(3), lit(2)).as("k"),
        TextAnalysis.gopherFlags(col("text")).as("g"),
        TextAnalysis.c4Signals(col("text"), minLineWords = 3,
          minSentences = 2).as("c"))
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val k = r.getStruct(1)
      val g = r.getStruct(2)
      val c = r.getStruct(3)
      def ctx(f: String) = s"doc $id field $f: text=${texts(id.toInt).take(80)}"
      assert(k.getLong(0) == g.getLong(0), ctx("n_words"))
      assert(k.getDouble(1) == g.getDouble(1), ctx("mean_word_len"))
      assert(k.getDouble(2) == g.getDouble(2), ctx("symbol_ratio"))
      assert(k.getDouble(3) == g.getDouble(3), ctx("bullet_frac"))
      assert(k.getDouble(4) == g.getDouble(4), ctx("ellipsis_frac"))
      assert(k.getDouble(5) == g.getDouble(5), ctx("alpha_frac"))
      assert(k.getLong(6) == g.getLong(6), ctx("n_stop_hits"))
      assert(k.getBoolean(7) == g.getBoolean(7), ctx("gopher_keep"))
      assert(k.getString(8) == c.getString(0), ctx("text_c4"))
      assert(k.getLong(9) == c.getLong(1), ctx("n_kept_lines"))
      assert(k.getLong(10) == c.getLong(2), ctx("n_sentences"))
      assert(k.getBoolean(11) == c.getBoolean(3), ctx("has_lorem"))
      assert(k.getBoolean(12) == c.getBoolean(4), ctx("has_brace"))
      assert(k.getBoolean(13) == c.getBoolean(5), ctx("c4_keep"))
    }
  }

  test("kernel ≡ composed forms on the real corpus (seeded like q93)") {
    val tail = ".\nThat sentence will have to be part of the document, " +
      "and it ends with a period." +
      "\nAnother proper sentence finishes the document."
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => if (r.getLong(0) % 4 == 0) r.getString(1)
                else r.getString(1) + tail)
      .toSeq
    compare(texts)
  }

  test("kernel ≡ composed forms on crafted edges") {
    compare(Seq(
      "",
      " ",
      "\t\t",
      "\n\n\n",
      "word",
      "one two three.",
      "- bullet line.\n* another bullet!\n• unicode bullet?",
      "trailing dots...\nmore dots....\n.....",
      "ends with quote.\"\nquote without punct\"\nbang!\" done",
      "# # # ### hash heavy . . . ... .. .",
      "Lorem IPSUM mixed case\nand a { brace } here.",
      "\tTab-led line counts an extra split word here.\nplain line here.",
      "enable JavaScript now please.\njavascript-free sentence stays here.",
      "the be to of and that have with",
      "THE BE TO OF AND THAT HAVE WITH all caps stopwords.",
      "line ending in whitespace then punct . \nnext line.",
      "a.b!c?d\"e...f",
      "multi  spaces   between\twordsvertical\ffeed\rreturn.",
      (1 to 60).map(i => s"w$i").mkString(" ") + ".",
      "Sentences. Multiple! Here? Yes.\n" * 3))
  }

  test("kernel ≡ composed forms on random screen-alphabet strings") {
    val r = new scala.util.Random(606)
    val atoms = Seq("the", "be", "to", "of", "and", "word", "Prose", "x9",
      "...", ".", "!", "?", "\"", "#", "-", "*", "•", "{", "}", "\n", "\t",
      " ", "  ", "lorem", "ipsum", "lorem ipsum", "javascript", "Enable",
      "sentence.", "ends here.", "", "\f", "\r")
    val texts = (0 until 300).map { _ =>
      (0 until r.nextInt(60)).map(_ => atoms(r.nextInt(atoms.length)))
        .mkString(r.nextInt(3) match {
          case 0 => ""
          case 1 => " "
          case _ => "\n"
        })
    }
    compare(texts)
  }
}
