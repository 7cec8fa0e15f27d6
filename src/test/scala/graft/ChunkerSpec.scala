package graft

import graft.operators.Chunker
import org.scalatest.funsuite.AnyFunSuite

class ChunkerSpec extends AnyFunSuite {

  private def para(word: String, n: Int): String = Seq.fill(n)(word).mkString(" ")

  test("empty and whitespace-only input produce no chunks") {
    assert(Chunker.chunk("").isEmpty)
    assert(Chunker.chunk("   \n\n  \n").isEmpty)
    assert(Chunker.chunk(null).isEmpty)
  }

  test("short document yields one chunk with full text") {
    val text = "hello world.\nsecond line."
    val cs = Chunker.chunk(text)
    assert(cs.length == 1)
    assert(cs.head.text == text.trim)
    assert(cs.head.startLine == 1 && cs.head.endLine == 2)
  }

  test("paragraphs pack into 500-2000 char chunks") {
    val paras = (1 to 20).map(i => para(s"w$i", 60)) // ~240 chars each
    val text = paras.mkString("\n\n")
    val cs = Chunker.chunk(text)
    assert(cs.length > 1)
    // bound: max + overlap prefix + a merged undersized tail (tail merge may
    // stretch the final chunk past the max by design)
    cs.foreach(c => assert(
      c.text.length <= Chunker.MaxChunkChars + Chunker.OverlapChars + Chunker.MinChunkChars + 2,
      s"chunk too long: ${c.text.length}"))
    cs.init.foreach(c => assert(c.text.length >= Chunker.MinChunkChars,
      s"non-tail chunk too short: ${c.text.length}"))
  }

  test("undersized tail merges into predecessor") {
    val text = para("alpha", 150) + "\n\n" + para("beta", 150) + "\n\n" + "tiny tail"
    val cs = Chunker.chunk(text)
    assert(cs.last.text.contains("tiny tail"))
    assert(cs.last.text.length >= Chunker.MinChunkChars ||
      cs.length == 1) // merged, not emitted alone
  }

  test("oversized paragraph is sentence-split") {
    val sentences = (1 to 60).map(i => s"This is sentence number $i with some padding words")
    val text = sentences.mkString(". ") + "."
    assert(text.length > Chunker.MaxChunkChars)
    val cs = Chunker.chunk(text)
    assert(cs.length > 1)
    cs.foreach(c => assert(c.text.length <= Chunker.MaxChunkChars + Chunker.OverlapChars + 1))
  }

  test("consecutive chunks carry a 100-char overlap prefix") {
    val paras = (1 to 20).map(i => para(s"word$i", 80))
    val cs = Chunker.chunkRegular(paras.mkString("\n\n"))
    assert(cs.length > 1)
    val prev = cs.head.text
    val expectOv = prev.substring(math.max(0, prev.length - Chunker.OverlapChars))
    assert(cs(1).text.startsWith(expectOv))
  }

  test("line provenance is 1-based and ordered") {
    val text = "first para line one\nline two\n\nsecond para\n\nthird para"
    val cs = Chunker.chunk(text)
    assert(cs.head.startLine == 1)
    cs.foreach(c => assert(c.startLine <= c.endLine))
  }

  test("conversational dialect detected and packed by turns") {
    val turns = (1 to 40).map(i =>
      (if (i % 2 == 0) "K: " else "V: ") + para(s"turn$i", 20))
    val text = turns.mkString("\n")
    assert(Chunker.isConversational(text))
    val cs = Chunker.chunk(text)
    assert(cs.length > 1)
    // overlap: each later chunk starts with a speaker marker from prev turn
    cs.tail.foreach(c => assert(c.text.startsWith("K:") || c.text.startsWith("V:")))
  }

  test("sentence splitter drops empties and trims") {
    assert(Chunker.splitSentences("One. Two!  Three?   ") == Seq("One", "Two", "Three"))
    assert(Chunker.splitSentences("No terminal") == Seq("No terminal"))
  }

  test("regular text is not flagged conversational") {
    assert(!Chunker.isConversational("just some plain text\nwith lines"))
    assert(Chunker.isConversational("intro\nK: hello there"))
  }
}
