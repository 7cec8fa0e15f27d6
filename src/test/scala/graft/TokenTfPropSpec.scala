package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the `token_tf` kernel: on ARBITRARY text its
  * per-document counts must equal the composed `regexTokens` explode +
  * groupBy — the q106/q111 oracles run the composed form's regex, so
  * this is the parity the one-exchange plan rests on. The generator
  * mixes the tokenizer's interesting edges: contractions, digit runs,
  * punctuation runs, bare apostrophes, mixed case, whitespace variants
  * (including the chars where Java's `\s` and RE2's disagree), and
  * non-ASCII letters that fall into the catchall class. */
class TokenTfPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  graft.functions.GraftFunctions.register(SparkTestBase.spark)

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private val piece: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf("it's", "don't", "we're", "I'll", "they'd", "you've"),
    4 -> Gen.alphaStr.map(_.take(8)),
    3 -> Gen.numStr.map(_.take(5)),
    2 -> Gen.oneOf("...", "!?", "--", "#$%", "'", "''", "a'b"),
    2 -> Gen.oneOf(" ", "\t", "\n", "\r", "", "", "  "),
    1 -> Gen.oneOf("é", "ß", "Ωmega", "naïve"))
  private val text: Gen[String] =
    Gen.listOf(piece).map(_.mkString)

  test("token_tf ≡ composed regexTokens counts on arbitrary text") {
    checkProp(Prop.forAll(text) { t =>
      val df = Seq((1L, t)).toDF("doc_id", "text")
      val kern = df
        .select(explode(graft.functions.GraftFunctions.tokenTf(col("text"))).as("e"))
        .select(col("e.token"), col("e.tf"))
        .as[(String, Long)].collect().toMap
      val composed = df
        .select(explode(TextAnalysis.regexTokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("tf"))
        .as[(String, Long)].collect().toMap
      kern == composed
    })
  }
}
