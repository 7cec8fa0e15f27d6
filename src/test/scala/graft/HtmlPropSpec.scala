package graft

import graft.sources.HtmlIngest
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the HTML extraction chain over generated
  * WELL-FORMED markup: for any sequence of text/inline/block/script/
  * entity fragments, extraction must (a) keep every text word, in
  * order, (b) drop every script/style/comment payload, (c) leave no
  * markup behind, and (d) decode each named entity exactly once. The
  * fixed-fixture spec pins exact outputs; the generator covers the
  * orderings and adjacencies those fixtures can't. */
class HtmlPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)

  /** One fragment: (html, visibleWords, mustNotAppear). */
  private val fragment: Gen[(String, Seq[String], Seq[String])] =
    word.flatMap { w =>
      Gen.oneOf(
        (s" $w ", Seq(w), Nil),
        (s"<p>$w</p>", Seq(w), Nil),
        (s"<b>$w</b>", Seq(w), Nil),
        (s"<div class='x'>$w</div>", Seq(w), Nil),
        (s"<script>var ${w}hidden = 1;</script>", Nil, Seq(s"${w}hidden")),
        (s"<style>.${w}cls{color:red}</style>", Nil, Seq(s"${w}cls")),
        (s"<!-- ${w}gone -->", Nil, Seq(s"${w}gone")),
        (s" $w&amp;$w ", Seq(s"$w&$w"), Nil))
    }

  test("well-formed markup: words survive in order; payloads and tags vanish") {
    val docGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, fragment))
    checkProp(Prop.forAll(docGen) { frags =>
      val html = "<html><body>" + frags.map(_._1).mkString + "</body></html>"
      val text = Seq(html).toDF("h")
        .select(HtmlIngest.htmlToText(col("h")).as("t")).as[String].head()
      val visible = frags.flatMap(_._2)
      val hidden = frags.flatMap(_._3)
      val noTags = !text.contains("<") || visible.exists(_.contains("<"))
      // order: visible words appear left-to-right (indexOf strictly grows
      // from a moving cursor; generated words may repeat, so scan forward)
      var cursor = 0
      val inOrder = visible.forall { w =>
        val i = text.indexOf(w, cursor)
        if (i < 0) false else { cursor = i; true }
      }
      val allHiddenGone = hidden.forall(h => !text.contains(h))
      Prop(inOrder && allHiddenGone && noTags) :| s"text=<$text> visible=$visible hidden=$hidden"
    })
  }
}
