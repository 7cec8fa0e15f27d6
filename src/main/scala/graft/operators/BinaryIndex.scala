package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary (Hamming) vector index — FAISS's binary index family
  * (`IndexBinaryFlat`) fed by the `IndexLSH` sign binarizer with zero
  * thresholds and no rotation (faiss/IndexLSH.cpp, faiss/IndexBinaryFlat.cpp):
  * each vector becomes a packed code of ⌈d/64⌉ 64-bit words (bit
  * `i % 64` of word `i / 64` ⇔ component i > 0) — ALL d dims, matching
  * FAISS's d/8-byte codes — and search ranks by Hamming distance.
  *
  * This is the cheapest point of the engine's compression family
  * (float32 exact → SQ8 4× → PQ8 32× → binary 32× with 1-bit dims):
  * d/8 bytes per vector (a 768-d corpus packs to 96 B/row, so a 100 TB
  * float corpus's candidate scan touches ~3 TB of codes) — and the
  * per-row kernel is a per-word `XOR` + `POPCOUNT` loop
  * ([[graft.functions.HammingWords]], whole-stage codegen with the
  * query code baked in as a primitive `long[]`). No shuffle:
  *  - ENCODE is the codegen'd [[graft.functions.SignPackF32]] — a narrow
  *    per-row map producing `(id, code)`; the codes table is the
  *    persistable index artifact (d/8 B/row parquet, trivially
  *    re-derivable, no training state).
  *  - SEARCH is scan + `hamming_words` + zero-shuffle TakeOrdered
  *    top-k (ascending distance, id tiebreak — the engine-wide total
  *    order). Batch form broadcasts the query codes and ranks per query
  *    with one window over ≤ n_queries × n_corpus narrow (id, dist)
  *    rows.
  *  - As with FAISS, binary search is a candidate generator: feed the
  *    ids into [[PqIndex.searchRefined]]-style exact re-ranking when
  *    float precision matters ([[VectorSearch.knnScores]] over the
  *    pushed-id slice).
  */
object BinaryIndex {

  /** Sign-binarize a float-vector corpus into `(idCol, code)`. The code
    * column (`array<bigint>`, ⌈d/64⌉ words) is the binary index: persist
    * it as parquet (or keep it as a projection — encode is cheaper than
    * a parquet round-trip for single-shot queries). */
  def encode(corpus: DataFrame, embCol: String = "embedding",
             idCol: String = "doc_id"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus.select(col(idCol), GraftFunctions.signPack(col(embCol)).as("code"))
  }

  /** Driver-side single-vector sign pack (query path) — the exact bit
    * rule the codegen kernel applies per row. */
  def packOne(v: Array[Float]): Array[Long] = {
    val words = new Array[Long]((v.length + 63) >>> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0f) words(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    words
  }

  /** Single-query Hamming top-k over a codes table: `(idCol, hamming)`
    * ascending, id tiebreak. Zero shuffle (TakeOrderedAndProject); the
    * query code is a foldable literal, so the kernel runs against a
    * baked-in primitive `long[]`. */
  def searchHamming(codes: DataFrame, queryCode: Array[Long], k: Int,
                    idCol: String = "doc_id", codeCol: String = "code"): DataFrame = {
    GraftFunctions.register(codes.sparkSession)
    codes
      .select(col(idCol),
        GraftFunctions.hammingWords(col(codeCol),
          typedlit(queryCode)).as("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(k)
  }

  /** Batch Hamming top-k: broadcast the (small) query-code set, score in
    * one codegen stage, rank per query. Ascending-distance analog of
    * [[VectorSearch.knnBatch]] — the window shuffles n_queries × n_corpus
    * narrow rows; for large fan-outs use [[searchHammingBatchAggregated]]
    * (partial top-k before the shuffle) or per-query [[searchHamming]]. */
  def searchHammingBatch(queries: DataFrame, codes: DataFrame, k: Int,
                         idCol: String = "doc_id", codeCol: String = "code",
                         queryIdCol: String = "query_id",
                         queryCodeCol: String = "q_code"): DataFrame = {
    GraftFunctions.register(codes.sparkSession)
    val q = queries.select(col(queryIdCol), col(queryCodeCol))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("hamming").asc, col(idCol).asc)
    codes.crossJoin(broadcast(q))
      .withColumn("hamming",
        GraftFunctions.hammingWords(col(codeCol), col(queryCodeCol)))
      .withColumn("doc_rank", row_number().over(w))
      .filter(col("doc_rank") <= k)
      .drop(queryCodeCol)
  }

  /** [[searchHammingBatch]] through the bounded [[TopKByScore]]
    * aggregator ([[VectorSearch.knnBatchAggregated]]'s shape, measured
    * 3× the window form there): partial aggregation keeps ≤ ~2k
    * candidates per (partition, query) BEFORE the shuffle, so the
    * exchange carries O(k · partitions) rows per query instead of the
    * whole scored corpus. Hamming ascends, so the aggregator (score
    * DESC, id ASC) runs on the negated distance — the output restores
    * `hamming` and the engine total order (hamming ASC, id ASC) as
    * `doc_rank`. */
  def searchHammingBatchAggregated(queries: DataFrame, codes: DataFrame, k: Int,
                                   idCol: String = "doc_id",
                                   codeCol: String = "code",
                                   queryIdCol: String = "query_id",
                                   queryCodeCol: String = "q_code"): DataFrame = {
    GraftFunctions.register(codes.sparkSession)
    VectorSearch.requireIntegralId(codes, idCol)
    val topk = udaf(new TopKByScore(k))
    val q = queries.select(col(queryIdCol), col(queryCodeCol))
    codes.crossJoin(broadcast(q))
      .withColumn("hamming",
        GraftFunctions.hammingWords(col(codeCol), col(queryCodeCol)))
      .select(col(queryIdCol), col(idCol).cast("long").as("id"),
        negate(col("hamming").cast("double")).as("__negd"))
      .groupBy(col(queryIdCol))
      .agg(topk(col("id"), col("__negd")).as("hits"))
      .select(col(queryIdCol), posexplode(col("hits")).as(Seq("rank0", "hit")))
      .select(
        col(queryIdCol),
        col("hit.id").as(idCol),
        negate(col("hit.score")).cast("long").as("hamming"),
        (col("rank0") + 1).cast("int").as("doc_rank"))
  }

  // ---- Binary IVF (FAISS IndexBinaryIVF, the `BIVF<nlist>` factory) ----

  /** Cell-partition the binary codes under the SHARED float coarse
    * quantizer: `(idCol, cell_id, code)`. FAISS's `IndexBinaryIVF`
    * clusters binary codes directly; the engine keeps ONE quantizer for
    * the whole index family instead, so the same cells serve float, PQ,
    * SQ8 and binary scans — write partitioned by `cell_id` and the
    * probed Hamming scan prunes partitions like every other IVF path. */
  def encodeIvf(withCells: DataFrame, embCol: String = "embedding",
                idCol: String = "doc_id"): DataFrame = {
    GraftFunctions.register(withCells.sparkSession)
    withCells.select(col(idCol), col("cell_id"),
      GraftFunctions.signPack(col(embCol)).as("code"))
  }

  /** Probed Hamming top-k over a cell-partitioned codes corpus: the
    * query probes `nprobe` cells by centroid inner product (the shared
    * [[IvfIndex.probeCells]] rule), and only those partitions are
    * scanned — d/8 B/row over nprobe/nlist of the corpus. The probe
    * vector lives in the QUANTIZER's space and the packed code in the
    * CODES' space — they coincide for a plain BIVF index, but diverge
    * when a reduced front feeds the coarse quantizer while the codes
    * pack the full-width vectors (pass `queryCode` explicitly then). */
  def searchIvfHamming(encoded: DataFrame, ivf: IvfIndex.Ivf,
                       queryVec: Array[Float], k: Int, nprobe: Int,
                       idCol: String = "doc_id",
                       codeCol: String = "code",
                       queryCode: Array[Long] = null): DataFrame = {
    GraftFunctions.register(encoded.sparkSession)
    val probed = IvfIndex.probeCells(ivf, queryVec, nprobe)
    val qCode = if (queryCode == null) packOne(queryVec) else queryCode
    encoded
      .filter(col("cell_id").isin(probed: _*))
      .select(col(idCol), col("cell_id"),
        GraftFunctions.hammingWords(col(codeCol),
          typedlit(qCode)).as("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(k)
  }

  /** Probed Hamming range search (FAISS `IndexBinaryIVF::range_search`):
    * every id within `maxDist` bits among the `nprobe` probed cells —
    * the [[rangeHamming]] semantics at the [[searchIvfHamming]] scan
    * cost (partition-pruned codes only, d/8 B/row over nprobe/nlist of
    * the corpus). As with the top-k probed form, the probe vector lives
    * in the QUANTIZER's space and the packed code in the CODES' space
    * (pass `queryCode` when they diverge). */
  def rangeIvfHamming(encoded: DataFrame, ivf: IvfIndex.Ivf,
                      queryVec: Array[Float], maxDist: Int, nprobe: Int,
                      idCol: String = "doc_id", codeCol: String = "code",
                      queryCode: Array[Long] = null): DataFrame = {
    GraftFunctions.register(encoded.sparkSession)
    val probed = IvfIndex.probeCells(ivf, queryVec, nprobe)
    val qCode = if (queryCode == null) packOne(queryVec) else queryCode
    encoded
      .filter(col("cell_id").isin(probed: _*))
      .select(col(idCol), col("cell_id"),
        GraftFunctions.hammingWords(col(codeCol),
          typedlit(qCode)).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .orderBy(col("hamming").asc, col(idCol).asc)
  }

  /** Hamming range search (`IndexBinaryFlat.range_search`): every id
    * within `maxDist` bits of the query, unranked semantics but emitted
    * in the engine's total order. Pure scan + filter — the predicate is
    * codegen'd and the output is the matching slice only. */
  def rangeHamming(codes: DataFrame, queryCode: Array[Long], maxDist: Int,
                   idCol: String = "doc_id", codeCol: String = "code"): DataFrame = {
    GraftFunctions.register(codes.sparkSession)
    codes
      .select(col(idCol),
        GraftFunctions.hammingWords(col(codeCol),
          typedlit(queryCode)).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .orderBy(col("hamming").asc, col(idCol).asc)
  }
}
