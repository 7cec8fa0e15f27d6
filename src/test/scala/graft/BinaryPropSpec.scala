package graft

import graft.operators.BinaryIndex
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the multi-word binary kernels: `sign_pack` must
  * place bit i of vector position i in word i/64 for ANY dimension (not
  * just multiples of 64), and `hamming_words` must equal the
  * sign-disagreement count with zero-extension across mixed widths —
  * the claims the 768-d q84/q89/q92 oracles rely on. Random dims cover
  * the word-boundary edges (63/64/65…) the fixed-dim specs can't. */
class BinaryPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  graft.functions.GraftFunctions.register(SparkTestBase.spark)

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(80), p)
    assert(res.passed, res.status.toString)
  }

  // Values cluster around 0 so sign bits flip often; exact zeros are
  // generated deliberately (a zero must NOT set its bit).
  private val element: Gen[Float] = Gen.frequency(
    5 -> Gen.choose(-2.0, 2.0).map(_.toFloat),
    1 -> Gen.const(0f),
    1 -> Gen.choose(-1e-30, 1e-30).map(_.toFloat))
  private def vecOf(dim: Int): Gen[Array[Float]] =
    Gen.listOfN(dim, element).map(_.toArray)
  private val dim: Gen[Int] = Gen.frequency(
    3 -> Gen.choose(1, 200),
    2 -> Gen.oneOf(63, 64, 65, 127, 128, 129, 191, 192, 768))

  test("sign_pack: word/bit layout holds at any dimension (codegen ≡ packOne ≡ spec)") {
    checkProp(Prop.forAll(dim.flatMap(d => vecOf(d))) { v =>
      val fromSpark = Seq(Tuple1(v)).toDF("embedding")
        .select(graft.functions.GraftFunctions.signPack(col("embedding")).as("c"))
        .as[Array[Long]].head()
      val fromDriver = BinaryIndex.packOne(v)
      val words = (v.length + 63) / 64
      val layoutOk = v.indices.forall { i =>
        (((fromSpark(i >>> 6) >>> (i & 63)) & 1L) == 1L) == (v(i) > 0f)
      }
      fromSpark.toSeq == fromDriver.toSeq &&
        fromSpark.length == words && layoutOk
    })
  }

  test("hamming_words: ≡ sign-disagreement count with zero-extension, any widths") {
    val pair = for {
      da <- dim; db <- dim
      a <- vecOf(da); b <- vecOf(db)
    } yield (a, b)
    checkProp(Prop.forAll(pair) { case (a, b) =>
      val got = Seq((BinaryIndex.packOne(a), BinaryIndex.packOne(b)))
        .toDF("ca", "cb")
        .select(graft.functions.GraftFunctions
          .hammingWords(col("ca"), col("cb")).as("h"))
        .as[Long].head()
      // semantic truth: disagreements over the shared width, plus set
      // bits (positive dims) of whichever vector extends further
      val shared = math.min(a.length, b.length)
      val expect =
        (0 until shared).count(i => (a(i) > 0f) != (b(i) > 0f)).toLong +
          a.drop(shared).count(_ > 0f) + b.drop(shared).count(_ > 0f)
      got == expect
    })
  }

  test("hamming_words literal path ≡ column path (the two codegen branches)") {
    checkProp(Prop.forAll(dim.flatMap(d => Gen.zip(vecOf(d), vecOf(d)))) {
      case (a, b) =>
        val codes = Seq((1L, BinaryIndex.packOne(a))).toDF("doc_id", "code")
        val viaLiteral = BinaryIndex
          .searchHamming(codes, BinaryIndex.packOne(b), k = 1)
          .select("hamming").as[Long].head()
        val viaColumn = codes
          .withColumn("qc", typedlit(BinaryIndex.packOne(b)))
          // defeat constant folding: route the query code through a
          // non-foldable projection so the column branch generates
          .withColumn("qc", when(col("doc_id") >= 0, col("qc")))
          .select(graft.functions.GraftFunctions
            .hammingWords(col("code"), col("qc")).as("h"))
          .as[Long].head()
        viaLiteral == viaColumn
    })
  }
}
