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

  // ======================================================================
  // Reference byte-parity mode
  // ======================================================================

  /** Byte-parity twin of the reference chunker (`preprocessing/
    * chunk_text_files.py:162-275` regular, `:85-160` conversational,
    * `:44-50` sentences, `:59-84` line attribution): the SAME fold, the
    * SAME boundary placement, the SAME overlap-counts-against-capacity
    * semantics, and the same substring-scan line attribution — including
    * its contractual quirks (the unstripped tail merge at `:236`, the
    * first-matching-line scan that mis-attributes repeated prefixes).
    *
    * [[chunk]] stays the default (graft's order-robust fold; deviation
    * rationale at the top of this file). Migrating pipelines that must
    * reproduce the reference's chunk boundaries byte-for-byte select this
    * mode. Verified chunk-for-chunk (md5 + line spans) against the
    * reference IMPLEMENTATION itself over 580 corpus-derived cases —
    * ChunkerParitySpec + `scripts/gen_chunk_parity_fixture.py` (which
    * imports the reference module, never a reimplementation). The corpus
    * is ASCII; Python/JVM whitespace semantics agree on ASCII, so
    * `Character.isWhitespace`-based strip is exact here. */
  def chunkParity(text: String): Seq[Chunk] =
    if (text == null || pyStrip(text).isEmpty) Seq.empty
    else if (isConversational(text)) parityConversational(text)
    else parityRegular(text)

  /** Python `str.strip()` (exact for ASCII; see [[chunkParity]] note). */
  private def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && Character.isWhitespace(s.charAt(a))) a += 1
    while (b > a && Character.isWhitespace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** `find_line_positions` (`chunk_text_files.py:59-84`): scan for the
    * first nonempty line CONTAINING the chunk's first stripped line; end =
    * start + chunk line count − 1. Reproduced as-is, quirks included. */
  private def parityLinePositions(text: String, chunkText: String): (Int, Int) = {
    val lines = text.split("\n", -1)
    val chunkLines = chunkText.split("\n", -1)
    val first = pyStrip(chunkLines.head)
    var startLine = 1
    var i = 0
    var found = false
    while (i < lines.length && !found) {
      val lt = pyStrip(lines(i))
      if (lt.contains(first) && lt.nonEmpty) { startLine = i + 1; found = true }
      i += 1
    }
    (startLine, startLine + chunkLines.length - 1)
  }

  /** `create_regular_chunks` (`:191-275`). */
  private def parityRegular(text: String): Seq[Chunk] = {
    val chunks = ArrayBuffer.empty[Chunk]
    var current = ""
    text.split("\n\n", -1).foreach { p0 =>
      val p = pyStrip(p0)
      if (p.nonEmpty) {
        if (current.nonEmpty && (current + "\n\n" + p).length > MaxChunkChars) {
          if (current.length >= MinChunkChars) {
            val st = pyStrip(current)
            val (s, e) = parityLinePositions(text, st)
            chunks += Chunk(st, s, e)
            // Overlap folds INTO the next chunk and counts against its
            // capacity (`:223`) — the deliberate deviation in [[chunk]].
            current = current.takeRight(OverlapChars) + "\n\n" + p
          } else current = current + "\n\n" + p
        } else current = if (current.nonEmpty) current + "\n\n" + p else p
      }
    }
    if (pyStrip(current).nonEmpty) {
      if (current.length < MinChunkChars && chunks.nonEmpty) {
        // Tail merge keeps `current` UNSTRIPPED (`:236-239`).
        val last = chunks.last
        val merged = last.text + "\n\n" + current
        val (_, endLine) = parityLinePositions(text, merged)
        chunks(chunks.length - 1) = Chunk(merged, last.startLine, endLine)
      } else {
        val st = pyStrip(current)
        val (s, e) = parityLinePositions(text, st)
        chunks += Chunk(st, s, e)
      }
    }
    // Oversized chunks sentence-split AFTER packing, joined with " "
    // (`:247-271`); positions re-resolved against the ORIGINAL text.
    chunks.toSeq.flatMap { c =>
      if (c.text.length <= MaxChunkChars) Seq(c)
      else {
        val out = ArrayBuffer.empty[Chunk]
        var sub = ""
        splitSentences(c.text).foreach { sen =>
          if (sub.nonEmpty && (sub + " " + sen).length > MaxChunkChars) {
            if (sub.length >= MinChunkChars) {
              val st = pyStrip(sub)
              val (s, e) = parityLinePositions(text, st)
              out += Chunk(st, s, e)
              sub = sen
            } else sub = sub + " " + sen
          } else sub = if (sub.nonEmpty) sub + " " + sen else sen
        }
        if (pyStrip(sub).nonEmpty) {
          val st = pyStrip(sub)
          val (s, e) = parityLinePositions(text, st)
          out += Chunk(st, s, e)
        }
        out.toSeq
      }
    }
  }

  /** `create_conversational_chunks` (`:85-160`), overlap_turns = 1. */
  private def parityConversational(text: String): Seq[Chunk] = {
    val turns = java.util.regex.Pattern.compile("(?m)(?=(?:^|\\s)[KV]:)")
      .split(text, -1).iterator.map(pyStrip).filter(_.nonEmpty).toArray
    if (turns.isEmpty) {
      val (s, e) = parityLinePositions(text, text)
      return Seq(Chunk(text, s, e)) // unstripped fallback (`:110`)
    }
    val chunks = ArrayBuffer.empty[Chunk]
    var current = ""
    var currentSize = 0
    var i = 0
    while (i < turns.length) {
      val turn = turns(i)
      // Size check ignores the joiner (`:118`) — reference semantics.
      if (currentSize + turn.length > MaxChunkChars && current.nonEmpty) {
        if (currentSize >= MinChunkChars) {
          val st = pyStrip(current)
          val (s, e) = parityLinePositions(text, st)
          chunks += Chunk(st, s, e)
          if (i > 0) {
            current = turns(i - 1) + "\n\n" + turn
            currentSize = current.length
          } else { current = turn; currentSize = turn.length }
        } else {
          current = if (current.nonEmpty) current + "\n\n" + turn else turn
          currentSize = current.length
        }
      } else {
        current = if (current.nonEmpty) current + "\n\n" + turn else turn
        currentSize = current.length
      }
      i += 1
    }
    if (pyStrip(current).nonEmpty) {
      if (current.length < MinChunkChars && chunks.nonEmpty) {
        val last = chunks.last
        val merged = last.text + "\n\n" + current
        val (_, endLine) = parityLinePositions(text, merged)
        chunks(chunks.length - 1) = Chunk(merged, last.startLine, endLine)
      } else {
        val st = pyStrip(current)
        val (s, e) = parityLinePositions(text, st)
        chunks += Chunk(st, s, e)
      }
    }
    chunks.toSeq
  }
}
