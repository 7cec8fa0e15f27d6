package graft

import graft.operators.PromptAssembly
import org.scalatest.funsuite.AnyFunSuite

class PromptAssemblySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("context block: numbered, source+relevance annotated, rank-ordered") {
    val hits = Seq(
      (1L, 2, "b.txt", 0.78, "second doc"),
      (1L, 1, "a.txt", 0.851, "first doc"),
      (2L, 1, "c.txt", 0.5, "other query")
    ).toDF("query_id", "doc_rank", "source", "score", "text")
    val blocks = PromptAssembly.contextBlocks(hits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(blocks(1L) ==
      "[Document 1] (Source: a.txt, Relevance: 0.85)\nfirst doc\n\n" +
      "[Document 2] (Source: b.txt, Relevance: 0.78)\nsecond doc")
    assert(blocks(2L).startsWith("[Document 1] (Source: c.txt"))
  }

  test("template substitution and caching") {
    assert(PromptAssembly.applyTemplate(
      "Answer {q} using {ctx}", Map("q" -> "X", "ctx" -> "Y")) == "Answer X using Y")
    PromptAssembly.clearTemplateCache()
    var loads = 0
    def load(n: String): String = { loads += 1; s"tpl:$n" }
    assert(PromptAssembly.cachedTemplate("rag", load) == "tpl:rag")
    assert(PromptAssembly.cachedTemplate("rag", load) == "tpl:rag")
    assert(loads == 1)
  }
}
