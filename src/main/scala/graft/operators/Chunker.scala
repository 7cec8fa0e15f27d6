package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Text chunking (SURVEY §2.2 P1–P4).
  *
  * Follows the reference chunker's structure
  * (`preprocessing/chunk_text_files.py:191-273` regular path, `:85-164`
  * conversational path, `:44-50` sentence splitter): paragraph-first split
  * on blank lines, greedy packing into 500–2000 char chunks, sentence-level
  * splitting of oversized paragraphs, merge of an undersized tail chunk,
  * 100-char overlap between consecutive chunks (1-turn overlap in the
  * conversational dialect, detected by `K:`/`V:` speaker markers). Each
  * chunk carries 1-based start/end line provenance.
  *
  * Deliberate deviations from the reference (not parity bugs):
  *  - the 100-char overlap is a post-pass prefix joined with `"\n"`; the
  *    reference folds `current_chunk[-100:] + "\n\n"` into the NEXT chunk
  *    mid-packing (`:223`), making the overlap count against its capacity;
  *  - oversized blocks sentence-split BEFORE packing with a `". "` joiner;
  *    the reference post-splits packed chunks joining with `" "`
  *    (`:247-271`);
  *  - line provenance tracks block positions directly; the reference
  *    re-FINDS the chunk text in the original (`find_line_positions`),
  *    which silently mis-attributes repeated text and overlap prefixes.
  * Boundaries are deterministic either way; ours are additionally
  * order-robust at scale, and hash-verified by the q22/q40 SQL oracles.
  *
  * Pure Scala — used from `Dataset.flatMap` so Catalyst sees a typed
  * generator (1 document row → N chunk rows).
  */
object Chunker {
  val MinChunkChars = 500
  val MaxChunkChars = 2000
  val OverlapChars = 100

  case class Chunk(text: String, startLine: Int, endLine: Int)

  private val speakerMarker = "(?m)(?:^|\\s)[KV]:".r

  /** Conversational-dialect detection (`chunk_text_files.py:53-55`). */
  def isConversational(text: String): Boolean =
    speakerMarker.findFirstIn(text).isDefined

  /** Sentence split on terminal punctuation (`chunk_text_files.py:44-50`). */
  def splitSentences(text: String): Seq[String] =
    text.split("[.!?]+\\s+").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  def chunk(text: String): Seq[Chunk] =
    if (text == null || text.trim.isEmpty) Seq.empty
    else if (isConversational(text)) chunkConversational(text)
    else chunkRegular(text)

  /** A text block with its 1-based line span in the source document. */
  private case class Block(text: String, startLine: Int, endLine: Int)

  /** Paragraphs = maximal runs of non-blank lines. */
  private def paragraphs(text: String): Seq[Block] = {
    val lines = text.split("\n", -1)
    val out = ArrayBuffer.empty[Block]
    var i = 0
    while (i < lines.length) {
      if (lines(i).trim.nonEmpty) {
        val start = i
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        out += Block(lines.slice(start, i).mkString("\n").trim, start + 1, i)
      } else i += 1
    }
    out.toSeq
  }

  /** Sentence-split an oversized paragraph into ≤ MaxChunkChars pieces,
    * each inheriting the paragraph's line span. */
  private def splitOversized(b: Block): Seq[Block] = {
    if (b.text.length <= MaxChunkChars) return Seq(b)
    val pieces = ArrayBuffer.empty[Block]
    val sb = new StringBuilder
    def flush(): Unit = if (sb.nonEmpty) {
      pieces += Block(sb.toString.trim, b.startLine, b.endLine); sb.clear()
    }
    splitSentences(b.text).foreach { s =>
      if (sb.nonEmpty && sb.length + s.length + 2 > MaxChunkChars) flush()
      if (sb.nonEmpty) sb.append(". ")
      sb.append(s)
      // A single sentence longer than the cap is hard-wrapped.
      while (sb.length > MaxChunkChars) {
        val head = sb.substring(0, MaxChunkChars)
        val rest = sb.substring(MaxChunkChars)
        sb.setLength(0); sb.append(head); flush(); sb.append(rest)
      }
    }
    flush()
    pieces.toSeq
  }

  private def packBlocks(blocks: Seq[Block], sep: String): Seq[Chunk] = {
    val packed = ArrayBuffer.empty[Chunk]
    var curText = new StringBuilder
    var curStart = 0
    var curEnd = 0
    def flush(): Unit = if (curText.nonEmpty) {
      packed += Chunk(curText.toString, curStart, curEnd); curText = new StringBuilder
    }
    blocks.foreach { b =>
      val wouldBe = if (curText.isEmpty) b.text.length
                    else curText.length + sep.length + b.text.length
      if (curText.nonEmpty && wouldBe > MaxChunkChars && curText.length >= MinChunkChars)
        flush()
      if (curText.isEmpty) { curStart = b.startLine; curEnd = b.endLine }
      else curText.append(sep)
      curText.append(b.text); curEnd = b.endLine
    }
    flush()
    // Tail merge: an undersized final chunk folds into its predecessor
    // (reference tail-merge, `chunk_text_files.py:234-240`).
    if (packed.length > 1 && packed.last.text.length < MinChunkChars) {
      val tail = packed.remove(packed.length - 1)
      val prev = packed.remove(packed.length - 1)
      packed += Chunk(prev.text + sep + tail.text, prev.startLine, tail.endLine)
    }
    packed.toSeq
  }

  /** Prefix each chunk (after the first) with the previous chunk's last
    * `OverlapChars` characters. */
  private def withCharOverlap(chunks: Seq[Chunk]): Seq[Chunk] =
    chunks.zipWithIndex.map { case (c, i) =>
      if (i == 0) c
      else {
        val prev = chunks(i - 1).text
        val ov = prev.substring(math.max(0, prev.length - OverlapChars))
        c.copy(text = ov + "\n" + c.text)
      }
    }

  def chunkRegular(text: String): Seq[Chunk] = {
    val blocks = paragraphs(text).flatMap(splitOversized)
    withCharOverlap(packBlocks(blocks, "\n\n"))
  }

  /** Conversational turns: a turn starts at a line beginning with a
    * speaker marker; packing is turn-granular with 1-turn overlap. */
  def chunkConversational(text: String): Seq[Chunk] = {
    val lines = text.split("\n", -1)
    val turnStarts = lines.indices.filter(i => lines(i).trim.matches("^[KV]:.*"))
    if (turnStarts.isEmpty) return chunkRegular(text)
    val turns = ArrayBuffer.empty[Block]
    // Preamble before the first marker is its own block.
    if (turnStarts.head > 0) {
      val pre = lines.slice(0, turnStarts.head).mkString("\n").trim
      if (pre.nonEmpty) turns += Block(pre, 1, turnStarts.head)
    }
    turnStarts.zipWithIndex.foreach { case (s, ti) =>
      val end = if (ti + 1 < turnStarts.length) turnStarts(ti + 1) else lines.length
      val t = lines.slice(s, end).mkString("\n").trim
      if (t.nonEmpty) turns += Block(t, s + 1, end)
    }
    val split = turns.toSeq.flatMap(splitOversized)
    val packed = packBlocks(split, "\n")
    // 1-turn overlap: prepend the previous chunk's final turn.
    packed.zipWithIndex.map { case (c, i) =>
      if (i == 0) c
      else {
        val prevLines = packed(i - 1).text.split("\n")
        val lastMarker = prevLines.lastIndexWhere(_.trim.matches("^[KV]:.*"))
        if (lastMarker < 0) c
        else c.copy(text = prevLines.drop(lastMarker).mkString("\n") + "\n" + c.text)
      }
    }
  }

  /** Chunk-header projection (P4, `chunk_text_files.py:337-344`). */
  def withHeader(filename: String, chunkIndex: Int, c: Chunk): String =
    s"Lähdetiedosto: $filename | Lohko: ${chunkIndex + 1} | Rivit: ${c.startLine}-${c.endLine}\n${c.text}"
}
