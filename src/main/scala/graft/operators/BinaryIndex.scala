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

  // ---- Binary hash buckets (FAISS IndexBinaryHash / IndexBinaryMultiHash,
  //      faiss/IndexBinaryHash.cpp) ----
  //
  // FAISS hashes each binary code on a b-bit slice and, at query time,
  // probes every bucket whose key is within `nflip` bit flips of the
  // query's key (its FlipEnumerator), scanning only those buckets'
  // codes. The Spark-first translation: the bucket key is a COLUMN
  // (derived from the code by shift+mask — pure codegen), the corpus is
  // written `partitionBy(bucket)`, and the probe set — C(b,0)+…+C(b,nflip)
  // keys, enumerated at the driver exactly like FAISS's flip walk —
  // becomes a static `isin` filter, i.e. parquet PartitionFilters: at
  // 100 TB a probe reads (probed buckets / 2^b) of an already-32×-smaller
  // codes corpus and never touches the rest. MultiHash keeps ONE copy of
  // the codes with `nhash` bucket-key columns (FAISS duplicates the
  // codes per table; columnar storage makes the extra keys ~free) and the
  // probe is the OR of the per-table key sets — a row is a candidate if
  // ANY table admits it, deduplicated by construction because the
  // predicate is evaluated once per row rather than per table.

  /** Bucket key for hash table `table`: bits `[table*b, (table+1)*b)` of
    * the code, as a non-negative long. All slices must live in the first
    * code word (`(table+1)*b ≤ 64` — 64 bits of key space; FAISS's own
    * default `b` is ≤ 32). */
  def hashKeyCol(codeCol: org.apache.spark.sql.Column, b: Int, table: Int)
      : org.apache.spark.sql.Column = {
    require(b >= 1 && (table + 1) * b <= 64,
      s"hash slice [${table * b}, ${(table + 1) * b}) must live in code word 0")
    val mask = if (b == 64) -1L else (1L << b) - 1L
    shiftrightunsigned(element_at(codeCol, 1), table * b).bitwiseAND(lit(mask))
  }

  /** Driver-side [[hashKeyCol]] (query path). */
  def hashKeyOne(code: Array[Long], b: Int, table: Int): Long = {
    require(b >= 1 && (table + 1) * b <= 64,
      s"hash slice [${table * b}, ${(table + 1) * b}) must live in code word 0")
    val mask = if (b == 64) -1L else (1L << b) - 1L
    (code(0) >>> (table * b)) & mask
  }

  /** Add the `nhash` bucket-key columns (`bucket_0..bucket_{nhash-1}`) to
    * a codes table — the persistable hash-index layout. Partition the
    * single-table form by `bucket_0` for static partition pruning. */
  def hashEncode(codes: DataFrame, b: Int, nhash: Int = 1,
                 codeCol: String = "code"): DataFrame =
    (0 until nhash).foldLeft(codes) { (df, t) =>
      df.withColumn(s"bucket_$t", hashKeyCol(col(codeCol), b, t))
    }

  /** All bucket keys within Hamming distance ≤ `nflip` of the query's key
    * — FAISS's flip enumeration, driver-side (C(b,0)+…+C(b,nflip) keys;
    * tiny for the nflip ≤ 2 regime the structure is built for). Sorted
    * for deterministic plans. */
  def probeKeys(queryKey: Long, b: Int, nflip: Int): Seq[Long] = {
    require(nflip >= 0 && nflip <= b, s"nflip must be in [0, $b]")
    def flips(start: Int, left: Int, acc: Long): Seq[Long] =
      if (left == 0) Seq(acc)
      else (start until b).flatMap(i => flips(i + 1, left - 1, acc ^ (1L << i)))
    (0 to nflip).flatMap(f => flips(0, f, queryKey)).distinct.sorted
  }

  /** `IndexBinaryHash::search`: probe the buckets within `nflip` flips of
    * the query's key, rank the candidates by FULL Hamming distance,
    * top-k (ascending, id tiebreak). The probe set is a static `isin` —
    * PartitionFilters on a bucket-partitioned corpus, row-group pruning
    * otherwise; like FAISS, ids outside the probed buckets are not
    * reported (raise `nflip` — at `nflip = b` the probe covers every
    * bucket and the result equals [[searchHamming]]). */
  def searchHash(hashed: DataFrame, queryCode: Array[Long], b: Int,
                 nflip: Int, k: Int, idCol: String = "doc_id",
                 codeCol: String = "code"): DataFrame = {
    GraftFunctions.register(hashed.sparkSession)
    val probe = probeKeys(hashKeyOne(queryCode, b, 0), b, nflip)
    hashed
      .filter(col("bucket_0").isin(probe: _*))
      .select(col(idCol),
        GraftFunctions.hammingWords(col(codeCol),
          typedlit(queryCode)).as("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(k)
  }

  /** `IndexBinaryMultiHash::search`: `nhash` tables over disjoint b-bit
    * slices; a row is a candidate if ANY table's key is within `nflip`
    * flips of the query's key for that table. One scan with the
    * disjunctive key predicate (candidates are deduplicated by
    * construction — FAISS needs a per-query bloom filter for this),
    * ranked by full Hamming distance. */
  def searchMultiHash(hashed: DataFrame, queryCode: Array[Long], b: Int,
                      nhash: Int, nflip: Int, k: Int,
                      idCol: String = "doc_id",
                      codeCol: String = "code"): DataFrame = {
    GraftFunctions.register(hashed.sparkSession)
    val admit = (0 until nhash).map { t =>
      val probe = probeKeys(hashKeyOne(queryCode, b, t), b, nflip)
      col(s"bucket_$t").isin(probe: _*)
    }.reduce(_ || _)
    hashed
      .filter(admit)
      .select(col(idCol),
        GraftFunctions.hammingWords(col(codeCol),
          typedlit(queryCode)).as("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(k)
  }
}
