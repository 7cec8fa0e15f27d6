package graft

import graft.operators.LexicalSearch
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
}
