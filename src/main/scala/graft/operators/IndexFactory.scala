package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FAISS `index_factory` descriptor strings mapped onto the engine's
  * index family (faiss/index_factory.cpp; the reference exposes index
  * choice as these descriptors too). A migrating user keeps the string
  * they already have and gets the corresponding graft build + search
  * pipeline:
  *
  * {{{
  *   "Flat"            exact scan                 VectorSearch
  *   "IVF64,Flat"      coarse-pruned exact        IvfIndex
  *   "PQ8"             ADC over codes             PqIndex
  *   "IVF64,PQ8"       residual PQ, probed        PqIndex (IVFADC)
  *   "IVF64,PQ8,RFlat" + exact re-rank            PqIndex.searchRefined
  *   "IVF64,PQ8+8"     + refine-PQ re-rank        PqIndex.searchIvfPqr
  *   "SQ8"             scalar quantizer           SqIndex
  *   "SQ4"             packed 4-bit scalar        SqIndex (search4)
  *   "IVF64,SQ4[,RFlat]" residual SQ4, probed     SqIndex.searchIvf4
  *   "IVF64,SQ8,RFlat" + exact re-rank            SqIndex.searchRefined
  *   "LSH"             binary sign codes          BinaryIndex
  *   "BHash8"          hash-bucketed binary       BinaryIndex.searchHash
  *   "BMultiHash3x8"   multi-table binary hash    BinaryIndex.searchMultiHash
  *   "ITQ32,LSH"       trained-rotation binary    ItqTransform + BinaryIndex
  *   "PCA16,Flat"      PCA front + any of these   PcaTransform + rest
  * }}}
  *
  * `PCA<k>,<rest>` composes by projection: train the transform, project
  * the corpus once, delegate the rest of the descriptor against the
  * projected corpus and the projected query — the `IndexPreTransform`
  * chain. Unsupported descriptors (HNSW graphs, OPQ rotations, nested
  * refinements) throw with the factory string in the message rather
  * than building something that silently isn't what was asked for.
  *
  * This is an API façade: every build/search below delegates to an
  * operator already under the DuckDB oracle gate; the spec pins
  * factory-built results ≡ direct operator calls.
  */
object IndexFactory {

  sealed trait Code
  case object Flat extends Code
  final case class PQ(m: Int) extends Code
  /** `PQ<m>+<m2>` — FAISS's IVFPQR spelling: level-1 PQ of m codes plus
    * a refine PQ of m2 codes on the reconstruction error. */
  final case class PQR(m: Int, mRefine: Int) extends Code
  case object SQ8Code extends Code
  case object SQ4Code extends Code
  case object LshCode extends Code
  /** `RQ<L>x<b>` — FAISS's residual-quantizer spelling: L levels of
    * 2^b-entry full-dim codebooks ([[RqIndex]], greedy encode). */
  final case class RQ(levels: Int, bits: Int) extends Code
  /** `BHash<b>` / `BMultiHash<n>x<b>` — FAISS's `IndexBinaryHash` /
    * `IndexBinaryMultiHash` over the sign codes ([[BinaryIndex]] hash
    * tier). Probe radius is the search-time `nflip`; the factory search
    * closure fixes it at 1 flip (call `BinaryIndex.searchHash` directly
    * for other radii). */
  final case class BHashCode(b: Int, nhash: Int) extends Code

  /** Pre-transform front: PCA dimensionality reduction or the OPQ
    * rotation (both apply through the same projection kernel). */
  sealed trait Pre
  final case class PcaPre(k: Int) extends Pre
  final case class OpqPre(m: Int) extends Pre
  /** `ITQ[<k>]` — PCA+ITQ rotation front for the binary code layer
    * (k = 0 means "input dimension", FAISS's bare `ITQ`). */
  final case class ItqPre(k: Int) extends Pre

  /** Parsed descriptor: optional pre-transform front, optional IVF
    * coarse layer, the code layer, optional exact refinement. */
  final case class Descriptor(pre: Option[Pre], nlist: Option[Int],
                              code: Code, refine: Boolean) {
    require(!(refine && nlist.isEmpty),
      "RFlat refinement needs an IVF candidate stage (e.g. IVF64,PQ8,RFlat)")
  }

  // PCAR (PCA + random rotation, faiss/index_factory.cpp) is REJECTED,
  // not silently mapped to plain PCA: the rotation changes which
  // components survive truncation, so a migrated PCAR string must fail
  // loudly instead of building different semantics.
  private val PcaRe = "^PCA([0-9]+)$".r
  private val OpqRe = "^OPQ([0-9]+)$".r
  private val ItqRe = "^ITQ([0-9]*)$".r
  private val IvfRe = "^IVF([0-9]+)$".r
  private val BivfRe = "^BIVF([0-9]+)$".r
  private val BHashRe = "^BHash([0-9]+)$".r
  private val BMultiHashRe = "^BMultiHash([0-9]+)x([0-9]+)$".r
  private val PqRe = "^PQ([0-9]+)$".r
  private val PqrRe = "^PQ([0-9]+)\\+([0-9]+)$".r
  private val RqRe = "^RQ([0-9]+)x([0-9]+)$".r

  def parse(desc: String): Descriptor = {
    val parts = desc.split(",").map(_.trim).filter(_.nonEmpty).toList
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"index_factory '$desc': $msg")
    val (pre, rest1) = parts match {
      case PcaRe(k) :: tail => (Some(PcaPre(k.toInt)): Option[Pre], tail)
      case OpqRe(m) :: tail => (Some(OpqPre(m.toInt)): Option[Pre], tail)
      case ItqRe(k) :: tail =>
        (Some(ItqPre(if (k.isEmpty) 0 else k.toInt)): Option[Pre], tail)
      case other => (None: Option[Pre], other)
    }
    // "BIVF<n>" — FAISS's binary-IVF factory spelling: a complete
    // descriptor (probed Hamming over sign codes), no code layer follows
    rest1 match {
      case BivfRe(n) :: Nil =>
        if (pre.isDefined) fail("BIVF takes no PCA/OPQ front (binary domain)")
        return Descriptor(None, Some(n.toInt), LshCode, refine = false)
      case BivfRe(_) :: more =>
        fail(s"BIVF is a complete descriptor; unexpected '${more.mkString(",")}'")
      // "BHash<b>" / "BMultiHash<n>x<b>" — complete binary descriptors
      // like BIVF: hash-bucketed sign codes, no code layer follows
      case BHashRe(b) :: Nil =>
        if (pre.isDefined) fail("BHash takes no PCA/OPQ front (binary domain)")
        return Descriptor(None, None, BHashCode(b.toInt, 1), refine = false)
      case BHashRe(_) :: more =>
        fail(s"BHash is a complete descriptor; unexpected '${more.mkString(",")}'")
      case BMultiHashRe(n, b) :: Nil =>
        if (pre.isDefined) fail("BMultiHash takes no PCA/OPQ front (binary domain)")
        return Descriptor(None, None, BHashCode(b.toInt, n.toInt), refine = false)
      case BMultiHashRe(_, _) :: more =>
        fail(s"BMultiHash is a complete descriptor; unexpected '${more.mkString(",")}'")
      case _ =>
    }
    val (nlist, rest2) = rest1 match {
      case IvfRe(n) :: tail => (Some(n.toInt), tail)
      case other => (None, other)
    }
    val (code, rest3) = rest2 match {
      case h :: _ if h.startsWith("HNSW") || h.startsWith("NSG") =>
        // Decision record in MIGRATION.md: HNSW/NSG's hierarchical
        // in-RAM pointer chase doesn't translate to a scan engine; the
        // graph VALUE does — as the cell-blocked k-NN graph + beam walk.
        fail(s"'$h' is not built here — use GraphSearch.searchBeam over " +
          "the KnnGraph.cellBlocked graph (the q97 path), or an IVF descriptor")
      case "Flat" :: tail => (Flat, tail)
      case PqRe(m) :: tail => (PQ(m.toInt), tail)
      case PqrRe(m, m2) :: tail => (PQR(m.toInt, m2.toInt), tail)
      case RqRe(l, b) :: tail => (RQ(l.toInt, b.toInt), tail)
      case "SQ8" :: tail => (SQ8Code, tail)
      case "SQ4" :: tail => (SQ4Code, tail)
      case "LSH" :: tail => (LshCode, tail)
      case Nil if nlist.isDefined => (Flat, Nil) // "IVF64" alone = IVF,Flat
      case other => fail(s"unsupported code layer '${other.mkString(",")}'")
    }
    val refine = rest3 match {
      case Nil => false
      case "RFlat" :: Nil => true
      case other => fail(s"unsupported suffix '${other.mkString(",")}'")
    }
    if (nlist.isDefined && code == LshCode)
      fail("IVF+LSH is not a FAISS combination the engine implements")
    code match {
      // IVF is itself the first level of a residual decomposition; an
      // IVF front over RQ would double-count it. Use RQ<L+1>x<b>.
      case RQ(_, _) if nlist.isDefined =>
        fail("IVF over RQ is not implemented (IVF IS a residual level — " +
          "raise the RQ level count instead)")
      case _ =>
    }
    // Refinement is implemented for the coded candidate generators
    // (IVF+PQ, IVF+SQ8, IVF+SQ4); 'IVF<n>,Flat,RFlat' would re-rank
    // already-exact scores — reject rather than silently no-op.
    code match {
      case PQ(_) | SQ8Code | SQ4Code =>
      case other if refine =>
        fail(s"RFlat refinement is implemented over PQ/SQ candidates, not $other")
      case _ =>
    }
    code match {
      // FAISS IndexIVFPQR only exists under an IVF; and its refine PQ IS
      // the refinement — stacking RFlat on top would be ambiguous.
      case PQR(_, _) if nlist.isEmpty => fail("PQ<m>+<m2> (IVFPQR) needs an IVF front")
      case PQR(_, _) if refine => fail("PQ<m>+<m2> already refines; drop RFlat")
      case _ =>
    }
    pre match {
      case Some(OpqPre(m)) => code match {
        case PQ(pm) if pm == m => // the FAISS pairing: OPQm,...,PQm
        case other => fail(s"OPQ$m must front PQ$m, not $other")
      }
      case Some(ItqPre(_)) =>
        // the FAISS pairing: ITQ fronts the binary (LSH) layer only
        if (code != LshCode || nlist.isDefined || refine)
          fail("ITQ fronts the LSH code layer (e.g. ITQ32,LSH)")
      case _ =>
    }
    Descriptor(pre, nlist, code, refine)
  }

  /** A built index: the prepared (encoded/assigned/projected) corpus plus
    * a single-query top-k search closure. Column shape follows the
    * underlying operator (`doc_id` + its native score/distance column). */
  final case class Built(descriptor: Descriptor, prepared: DataFrame,
                         searchFn: (Array[Float], Int) => DataFrame) {
    def search(queryVec: Array[Float], k: Int): DataFrame = searchFn(queryVec, k)
  }

  /** Train + prepare a corpus for the descriptor. Training state lives in
    * memory here; persist through the individual operators' save/load
    * when the index outlives the session (the q77–q88 lifecycle). */
  def build(spark: SparkSession, corpus: DataFrame, desc: String,
            idCol: String = "doc_id", embCol: String = "embedding",
            nprobe: Int = 4, rerank: Int = 50): Built = {
    val d = parse(desc)
    buildParsed(spark, corpus, d, idCol, embCol, nprobe, rerank)
  }

  private def buildParsed(spark: SparkSession, corpus: DataFrame, d: Descriptor,
                          idCol: String, embCol: String,
                          nprobe: Int, rerank: Int): Built = d.pre match {
    case Some(front) =>
      // Pre-transform front: project once, delegate the rest against the
      // projected corpus with projected queries (IndexPreTransform).
      // PCA reduces dims; OPQ is a learned full-dim rotation — both are
      // Pca projections (OPQ with zero mean).
      val pca = front match {
        case PcaPre(k) => PcaTransform.train(corpus, k, embCol)
        case OpqPre(m) => OpqTransform.train(corpus, m, embCol = embCol,
          idCol = idCol)
        case ItqPre(k0) =>
          val k = if (k0 > 0) k0
            else corpus.select(embCol).head.getSeq[Float](0).length
          ItqTransform.train(corpus, k, embCol = embCol, idCol = idCol)
      }
      val projected = PcaTransform.project(corpus, pca, embCol, "__pca")
        .drop(embCol)
      val inner = buildParsed(spark, projected, d.copy(pre = None),
        idCol, "__pca", nprobe, rerank)
      Built(d, inner.prepared,
        (q, kk) => inner.searchFn(PcaTransform.projectOne(pca, q), kk))
    case None => (d.nlist, d.code) match {
      case (None, Flat) =>
        Built(d, corpus,
          (q, k) => VectorSearch.knnScores(corpus, q, k, embCol, idCol))
      case (Some(n), Flat) =>
        val (withCells, ivf) = IvfIndex.build(corpus, n, embCol)
        Built(d, withCells,
          (q, k) => IvfIndex.searchScores(withCells, ivf, q, k, nprobe,
            embCol, idCol))
      case (None, PQ(m)) =>
        val pq = PqIndex.train(corpus, m, embCol = embCol)
        val encoded = PqIndex.encode(corpus, pq, embCol)
          .select(col(idCol), col("codes"))
        Built(d, encoded,
          (q, k) => PqIndex.search(encoded, pq, q, k, idCol))
      case (Some(n), PQR(m, m2)) =>
        val (withCells, ivf) = IvfIndex.build(corpus, n, embCol)
        val (encoded, pq1, pq2) = PqIndex.buildIvfPqr(withCells, ivf, m, m2,
          embCol = embCol)
        val enc = encoded.select(col(idCol), col("cell_id"),
          col("codes"), col("codes2"))
        Built(d, enc, (q, k) => PqIndex.searchIvfPqr(enc, ivf, pq1, pq2,
          q, k, rerank, nprobe, idCol))
      case (Some(n), PQ(m)) =>
        val (withCells, ivf) = IvfIndex.build(corpus, n, embCol)
        val (encoded, rpq) = PqIndex.buildIvfAdc(withCells, ivf, m,
          embCol = embCol)
        val enc = encoded.select(col(idCol), col("cell_id"), col("codes"))
        if (d.refine)
          Built(d, enc, (q, k) => PqIndex.searchRefined(enc, corpus, ivf,
            rpq, q, k, rerank, nprobe, idCol))
        else
          Built(d, enc,
            (q, k) => PqIndex.searchIvfAdc(enc, ivf, rpq, q, k, nprobe, idCol))
      case (None, SQ8Code) =>
        val sq = SqIndex.train(corpus, embCol)
        val encoded = SqIndex.encode(corpus, sq, embCol)
          .select(col(idCol), col("codes"))
        Built(d, encoded, (q, k) => SqIndex.search(encoded, sq, q, k, idCol))
      case (None, SQ4Code) =>
        val sq = SqIndex.train4(corpus, embCol)
        val encoded = SqIndex.encode4(corpus, sq, embCol)
          .select(col(idCol), col("codes"))
        Built(d, encoded, (q, k) => SqIndex.search4(encoded, sq, q, k, idCol))
      case (Some(n), SQ4Code) =>
        val (withCells, ivf) = IvfIndex.build(corpus, n, embCol)
        val sq = SqIndex.trainResidual4(withCells, ivf, embCol)
        val enc = SqIndex.encodeIvf4(withCells, ivf, sq, embCol, idCol)
        if (d.refine)
          Built(d, enc, (q, k) => SqIndex.searchRefined4(enc, corpus, ivf,
            sq, q, k, rerank, nprobe, idCol))
        else
          Built(d, enc,
            (q, k) => SqIndex.searchIvf4(enc, ivf, sq, q, k, nprobe, idCol))
      case (Some(n), SQ8Code) =>
        val (withCells, ivf) = IvfIndex.build(corpus, n, embCol)
        val sq = SqIndex.trainResidual(withCells, ivf, embCol)
        val enc = SqIndex.encodeIvf(withCells, ivf, sq, embCol, idCol)
        if (d.refine)
          Built(d, enc, (q, k) => SqIndex.searchRefined(enc, corpus, ivf,
            sq, q, k, rerank, nprobe, idCol))
        else
          Built(d, enc,
            (q, k) => SqIndex.searchIvf(enc, ivf, sq, q, k, nprobe, idCol))
      case (None, RQ(l, b)) =>
        val rq = RqIndex.train(corpus, nlevels = l, k = 1 << b, embCol)
        val encoded = RqIndex.encode(corpus, rq, embCol, idCol)
          .select(col(idCol), col("codes"))
        Built(d, encoded, (q, k) => RqIndex.search(encoded, rq, q, k, idCol))
      case (None, LshCode) =>
        val codes = BinaryIndex.encode(corpus, embCol, idCol)
        Built(d, codes,
          (q, k) => BinaryIndex.searchHamming(codes, BinaryIndex.packOne(q),
            k, idCol))
      case (None, BHashCode(b, nh)) =>
        val hashed = BinaryIndex.hashEncode(
          BinaryIndex.encode(corpus, embCol, idCol), b, nh)
        Built(d, hashed, (q, k) => {
          val qc = BinaryIndex.packOne(q)
          if (nh == 1) BinaryIndex.searchHash(hashed, qc, b, nflip = 1, k, idCol)
          else BinaryIndex.searchMultiHash(hashed, qc, b, nh, nflip = 1, k, idCol)
        })
      case (Some(n), LshCode) => // reachable only via "BIVF<n>"
        val (withCells, ivf) = IvfIndex.build(corpus, n, embCol)
        val enc = BinaryIndex.encodeIvf(withCells, embCol, idCol)
        Built(d, enc,
          (q, k) => BinaryIndex.searchIvfHamming(enc, ivf, q, k, nprobe, idCol))
      case (Some(_), other) =>
        throw new IllegalArgumentException(
          s"index_factory: IVF over $other is not implemented")
    }
  }
}
