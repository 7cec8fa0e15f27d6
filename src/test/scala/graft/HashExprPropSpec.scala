package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning the equivalence claims of the hash-expression
  * rewrites: the byte-loop fingerprint strip must match the regex form it
  * replaced (including non-ASCII input), and `minhash_sigs` must equal
  * the explicit min-over-md5-slices formula the DuckDB oracle computes.
  * These are the claims the q13/q14/q15 oracles rely on — a property
  * failure here means a silent cross-engine hash mismatch later. */
class HashExprPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  graft.functions.GraftFunctions.register(SparkTestBase.spark)

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), p)
    assert(res.passed, res.status.toString)
  }

  // Mixed ASCII / punctuation / whitespace / non-ASCII (Latin-1 + BMP) text.
  private val mixedChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '\t', '\n', '.', ',', '!', '-', '_', '\"'),
    1 -> Gen.oneOf('é', 'ü', 'ß', 'Д', '漢', 'K'), // incl. Kelvin sign U+212A
    1 -> Gen.choose(' ', '~'))
  private val text: Gen[String] =
    Gen.choose(0, 200).flatMap(n => Gen.listOfN(n, mixedChar).map(_.mkString))

  test("strip_non_alnum(lower(s)) ≡ regexp_replace(lower(s), '[^a-z0-9]', '')") {
    checkProp(Prop.forAll(Gen.listOfN(24, text)) { texts =>
      val df = texts.toDF("t")
      val both = df.select(
        graft.functions.GraftFunctions.stripNonAlnum(lower($"t")).as("fast"),
        regexp_replace(lower($"t"), "[^a-z0-9]", "").as("ref"))
        .as[(String, String)].collect()
      both.forall { case (fast, ref) => fast == ref }
    })
  }

  test("minhash_sigs ≡ min over md5 hex slices of word shingles") {
    val words = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 6).flatMap(k =>
        Gen.listOfN(k, Gen.alphaLowerChar).map(_.mkString))))
    checkProp(Prop.forAll(words) { ws =>
      val doc = ws.mkString(" ")
      val n = 3
      val bands = 4
      val fromExpr = Seq(doc).toDF("t")
        .select(graft.functions.GraftFunctions.minhashSigs($"t", lit(n), lit(bands)))
        .as[Seq[String]].head()
      // reference formula: distinct shingles -> md5 hex -> 8-char slices
      val toks = doc.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val shingles =
        if (toks.length < n) Seq.empty
        else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).distinct
      val expected =
        if (shingles.isEmpty) Seq.empty
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val hexes = shingles.map { sh =>
            md.reset()
            graft.functions.MinhashSigs.hex(md.digest(sh.getBytes("UTF-8")))
          }
          (0 until bands).map(b => hexes.map(_.substring(b * 8, b * 8 + 8)).min)
        }
      fromExpr == expected
    })
  }

  test("minhash_sigs_multi ≡ concatenated single-width minhash_sigs slices") {
    val words = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 6).flatMap(k =>
        Gen.listOfN(k, Gen.alphaLowerChar).map(_.mkString))))
    val bandCounts = Seq(2, 4, 8)
    checkProp(Prop.forAll(words) { ws =>
      val doc = ws.mkString(" ")
      val n = 3
      val multi = Seq(doc).toDF("t")
        .select(graft.functions.GraftFunctions.minhashSigsMulti($"t", lit(n),
          array(bandCounts.map(lit): _*)))
        .as[Seq[String]].head()
      val singles = bandCounts.flatMap { b =>
        Seq(doc).toDF("t")
          .select(graft.functions.GraftFunctions.minhashSigs($"t", lit(n), lit(b)))
          .as[Seq[String]].head()
      }
      multi == singles
    })
  }
}
