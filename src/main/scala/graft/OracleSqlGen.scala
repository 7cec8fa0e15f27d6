package graft

/** Generators for the DuckDB oracle SQL of queries whose results derive
  * from graft's deterministic kernels (md5 feature-hash embedding, md5
  * chunk ids). Everything here exists so the driver's hash-compare gate
  * can check those queries exactly instead of rows-only: the Scala kernels
  * were designed around md5 (cross-engine identical) and sequential double
  * arithmetic (IEEE-identical) precisely so these SQL replicas are
  * bit-for-bit equivalent.
  */
object OracleSqlGen {

  /** DuckDB expression for the value of one hex digit of `m` (a lowercase
    * md5 hex string) at 1-based position `pos`. */
  private def hexDigit(m: String, pos: Int): String =
    s"(strpos('0123456789abcdef', substr($m, $pos, 1)) - 1)"

  /** DuckDB expression parsing the first `nChars` hex chars of `m` into a
    * BIGINT (big-endian, matching Spark's `conv(substr(md5, 1, n), 16, 10)`). */
  def hexPrefixToBigint(m: String, nChars: Int): String =
    (1 to nChars).map(hexDigit(m, _))
      .reduce((acc, d) => s"($acc * 16 + $d)")

  /** The md5-derived chunk id assigned by `TextIngest.buildCorpus`:
    * first 15 hex chars (60 bits) of md5(filename:chunk_index). */
  def chunkDocId(filenameExpr: String, chunkIndexExpr: String): String =
    "CAST(" + hexPrefixToBigint(
      s"md5($filenameExpr || ':' || CAST($chunkIndexExpr AS VARCHAR))", 15) +
      " AS BIGINT)"

  /** CTE chain replicating `HashEmbedder.embed` over a relation
    * `__docs(id BIGINT, txt VARCHAR)` (which the caller must define as the
    * first CTE). Produces `__emb(id, embedding DOUBLE[])` whose values are
    * exactly the float32 embedding components widened to double:
    *
    *  - tokens: lowercase split on non-alphanumeric runs (RE2 `\p{L}\p{N}`
    *    == Java's on this ASCII corpus), empty tokens dropped;
    *  - features: unigrams + space-joined bigrams;
    *  - bucket/sign from the md5 hex prefix: first 16 bits mod dim, sign
    *    from the 5th hex digit's top bit — mirroring the byte arithmetic
    *    in `HashEmbedder.addFeature`;
    *  - signed counts accumulate exactly (integers in doubles), the norm
    *    is sqrt of an exact integer sum, and each component rounds to
    *    float32 once — the identical IEEE operation sequence as the Scala
    *    kernel, hence bit-for-bit equality.
    */
  def embedCtes(dim: Int): String = {
    val b01 = s"(${hexDigit("md5(f)", 1)} * 4096 + ${hexDigit("md5(f)", 2)} * 256 + " +
      s"${hexDigit("md5(f)", 3)} * 16 + ${hexDigit("md5(f)", 4)})"
    s"""__toks AS (
       |  SELECT id, list_filter(
       |    regexp_split_to_array(lower(txt), '[^\\p{L}\\p{N}]+'), x -> x <> '') AS ts
       |  FROM __docs),
       |__feats AS (
       |  SELECT id, unnest(ts) AS f FROM __toks
       |  UNION ALL
       |  SELECT id, unnest(list_transform(range(1, len(ts)),
       |                                   i -> ts[i] || ' ' || ts[i + 1])) AS f
       |  FROM __toks),
       |__acc AS (
       |  SELECT id, $b01 % $dim AS idx,
       |    sum(CASE WHEN ${hexDigit("md5(f)", 5)} < 8 THEN 1.0 ELSE -1.0 END) AS v
       |  FROM __feats GROUP BY 1, 2),
       |__dense AS (
       |  SELECT t.id, g.range AS j, coalesce(a.v, 0.0) AS v
       |  FROM __toks t CROSS JOIN range(0, $dim) g
       |  LEFT JOIN __acc a ON a.id = t.id AND a.idx = g.range),
       |__vec AS (
       |  SELECT id, list(v ORDER BY j) AS raw, sqrt(sum(v * v)) AS nrm
       |  FROM __dense GROUP BY id),
       |__emb AS (
       |  SELECT id, CASE WHEN nrm > 0
       |    THEN list_transform(raw, x -> CAST(CAST(x / nrm AS FLOAT) AS DOUBLE))
       |    ELSE list_transform(raw, x -> 0.0) END AS embedding
       |  FROM __vec)""".stripMargin
  }

  /** CTE chain replicating IVF cell assignment over the `embeddings` table
    * given the trained centroids (inlined as literals — the quantizer is
    * model state, not data, so the oracle receives it the same way a query
    * session does: from the persisted index). Assignment is argmin of the
    * naive sequential squared-L2 sum — the exact arithmetic of graft's
    * `nearest_centroid_f32`, so near-tie assignments cannot diverge.
    * Produces `__cents(cell_id, c)` and `__assigned(doc_id, embedding,
    * cell_id)`. */
  /** Strict double left fold of the element products of two FLOAT[]
    * lists — the engine's `dot_f32` accumulation (sequential double adds
    * in index order). DuckDB's `list_dot_product` on FLOAT[] accumulates
    * in float32, which can shift `round(·,4)`, flip near-tie rankings,
    * and move rows across a range-search threshold; every generated
    * oracle that filters/ranks on a dot product must use this form. */
  def dotFold(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0,
       |      list_transform(list_zip($a, $b),
       |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
       |      (acc, t) -> acc + t)""".stripMargin

  /** The shared >64-d widening of the 64-d testdata embeddings: `blocks`
    * rotated copies of each vector concatenated into one
    * `blocks × dim`-d FLOAT[] (block j element i = `embedding[(i+j) %
    * dim]`). Pure element re-indexing — no float arithmetic — so the
    * Spark-side widening replays bit-exactly and the binary/range
    * queries get gated at the reference's 768-d instead of the
    * testdata's 64 (the reference embeds at 768-d,
    * `components/core/embedding_service.py:46-55`). */
  def wideCte(blocks: Int = 12, dim: Int = 64): String =
    s"""__wide AS (
       |  SELECT vec_id, flatten(list_transform(range(0, $blocks), j ->
       |    list_transform(range(0, $dim), i ->
       |      embedding[((i + j) % $dim) + 1]))) AS embedding
       |  FROM embeddings)""".stripMargin

  def ivfAssignCtes(cents: Seq[Array[Double]],
                    source: String = "embeddings"): String = {
    val values = cents.zipWithIndex
      .map { case (c, i) => s"($i, [${c.mkString(", ")}])" }
      .mkString(",\n      ")
    s"""__cents(cell_id, c) AS (VALUES
       |      $values),
       |__assigned AS (
       |  SELECT doc_id, embedding, cell_id FROM (
       |    SELECT e.vec_id AS doc_id, e.embedding, c.cell_id,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        list_sum(list_transform(list_zip(e.embedding, c.c),
       |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |        c.cell_id ASC) AS rn
       |    FROM $source e CROSS JOIN __cents c)
       |  WHERE rn = 1)""".stripMargin
  }

  /** q21's oracle: assign cells, probe the `nprobe` centroids nearest the
    * query by inner product, exact top-k within probed cells. Ranks and
    * scores on the strict double fold ([[dotFold]] — the engine's `dot_f32`
    * accumulation), so float32-accumulation near-ties cannot flip the
    * top-k membership vs the engine. The centroid probe keeps
    * `list_dot_product`: `c.c` is DOUBLE[] literals, already
    * double-accumulated. */
  def ivfSearchSql(cents: Seq[Array[Double]], k: Int, nprobe: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |scored AS (
       |  SELECT a.doc_id, a.cell_id, ${dotFold("a.embedding", "q.qe")} AS s
       |  FROM __assigned a, q
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe))
       |SELECT doc_id, CAST(cell_id AS BIGINT) AS cell_id,
       |  round(s, 4) AS score
       |FROM scored
       |ORDER BY s DESC, doc_id
       |LIMIT $k""".stripMargin

  /** q209's oracle: IVF-pruned MaxSim — per-token IP probe (the q21
    * probe rule, PARTITIONed by query token), candidate docs = docs
    * with ≥1 token vector assigned to the probe-cell union, then the
    * exact q208 MaxSim replay restricted to candidates. Sum order is
    * the engine's fixed left-associated fold (`list(mx ORDER BY qid)`
    * prepended with 0.0). */
  def maxsimIvfSql(cents: Seq[Array[Double]], k: Int, nprobe: Int,
                   nq: Int, docSize: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |q AS (SELECT vec_id AS qid, embedding AS qe
       |      FROM embeddings WHERE vec_id < $nq),
       |probe AS (
       |  SELECT q.qid, c.cell_id, row_number() OVER (PARTITION BY q.qid
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c CROSS JOIN q),
       |cells AS (SELECT DISTINCT cell_id FROM probe WHERE pr <= $nprobe),
       |cand AS (
       |  SELECT DISTINCT a.doc_id // $docSize AS gdoc
       |  FROM __assigned a JOIN cells ON a.cell_id = cells.cell_id
       |  WHERE a.doc_id >= $docSize),
       |m AS (
       |  SELECT e.vec_id // $docSize AS gdoc, q.qid,
       |    max(${dotFold("e.embedding", "q.qe")}) AS mx
       |  FROM embeddings e
       |  JOIN cand ON e.vec_id // $docSize = cand.gdoc
       |  CROSS JOIN q
       |  WHERE e.vec_id >= $docSize
       |  GROUP BY 1, 2),
       |s AS (
       |  SELECT gdoc,
       |    list_reduce(list_prepend(0.0, list(mx ORDER BY qid)),
       |      (a, b) -> a + b) AS sc
       |  FROM m GROUP BY gdoc)
       |SELECT CAST(gdoc AS BIGINT) AS doc_id, round(sc, 4) AS maxsim
       |FROM s ORDER BY sc DESC, gdoc LIMIT $k""".stripMargin

  /** q190's oracle: quantizer-retrain churn — both quantizers' Voronoi
    * assignments replayed (the [[ivfAssignCtes]] body under distinct
    * CTE prefixes), then the pair-counting clustering-agreement
    * arithmetic on the contingency table: all counts are exact longs
    * (`n·(n−1)//2` co-resident pairs), one guarded division for the
    * retained-co-residency rate. */
  def quantizerChurnSql(centsA: Seq[Array[Double]],
                        centsB: Seq[Array[Double]]): String = {
    def assignCtes(cents: Seq[Array[Double]], p: String): String = {
      val values = cents.zipWithIndex
        .map { case (c, i) => s"($i, [${c.mkString(", ")}])" }
        .mkString(",\n      ")
      s"""${p}cents(cell_id, c) AS (VALUES
         |      $values),
         |${p}assigned AS (
         |  SELECT doc_id, cell_id FROM (
         |    SELECT e.vec_id AS doc_id, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_sum(list_transform(list_zip(e.embedding, c.c),
         |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
         |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
         |        c.cell_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN ${p}cents c)
         |  WHERE rn = 1)""".stripMargin
    }
    s"""WITH ${assignCtes(centsA, "pa_")},
       |${assignCtes(centsB, "pb_")},
       |ct AS (
       |  SELECT a.cell_id AS ca, b.cell_id AS cb, count(*) AS n
       |  FROM pa_assigned a JOIN pb_assigned b USING (doc_id)
       |  GROUP BY 1, 2),
       |ta AS (SELECT CAST(sum(n * (n - 1)) // 2 AS BIGINT) AS pa FROM
       |  (SELECT ca, sum(n) AS n FROM ct GROUP BY ca)),
       |tb AS (SELECT CAST(sum(n * (n - 1)) // 2 AS BIGINT) AS pb FROM
       |  (SELECT cb, sum(n) AS n FROM ct GROUP BY cb)),
       |tboth AS (SELECT CAST(sum(n * (n - 1)) // 2 AS BIGINT) AS pboth FROM ct),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nv FROM ct)
       |SELECT tot.nv AS n_vectors, ta.pa AS pairs_same_a,
       |  tb.pb AS pairs_same_b, tboth.pboth AS pairs_same_both,
       |  round(CASE WHEN ta.pa > 0
       |    THEN CAST(tboth.pboth AS DOUBLE) / ta.pa ELSE 0.0 END, 4)
       |    AS coresidency_retained
       |FROM tot, ta, tb, tboth""".stripMargin
  }

  /** q187's oracle: probed IVF search under METRIC_L2 (FAISS
    * `IndexIVFFlat`'s default) — centroid probe by squared L2 ASC (ties
    * to the lower cell), candidates ranked by the strict Euclidean fold
    * (`l2_distance_f32`'s exact accumulation). */
  def ivfL2SearchSql(cents: Seq[Array[Double]], k: Int, nprobe: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_sum(list_transform(list_zip(q.qe, c.c),
       |      p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |           (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |      c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |scored AS (
       |  SELECT a.doc_id, a.cell_id,
       |    sqrt(list_reduce(list_prepend(0.0,
       |      list_transform(list_zip(a.embedding, q.qe),
       |        p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) *
       |             (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
       |      (acc, t) -> acc + t)) AS dist
       |  FROM __assigned a, q
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe))
       |SELECT doc_id, CAST(cell_id AS BIGINT) AS cell_id,
       |  round(dist, 4) AS dist
       |FROM scored
       |ORDER BY dist ASC, doc_id
       |LIMIT $k""".stripMargin

  /** q166's oracle: the IVF probe COST curve — cumulative candidate rows
    * (and corpus fraction) per nprobe 1..maxProbe, the cost side of
    * q107's recall sweep. Exact longs + one division per row. */
  def ivfProbeCostSql(cents: Seq[Array[Double]], maxProbe: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |cnt AS (SELECT cell_id, count(*) AS n FROM __assigned GROUP BY cell_id),
       |tot AS (SELECT count(*) AS t FROM __assigned),
       |cumc AS (
       |  SELECT p.pr, sum(coalesce(c.n, 0)) OVER (ORDER BY p.pr) AS nc
       |  FROM probe p LEFT JOIN cnt c USING (cell_id))
       |SELECT CAST(pr AS BIGINT) AS nprobe, CAST(nc AS BIGINT) AS n_candidates,
       |  round(CAST(nc AS DOUBLE) / CAST(tot.t AS DOUBLE), 4) AS frac
       |FROM cumc, tot WHERE pr <= $maxProbe
       |ORDER BY nprobe""".stripMargin

  /** q153's oracle: per-cell top terms by lift — cells from the shared
    * quantizer ([[ivfAssignCtes]]), presence-based term frequencies
    * (distinct whitespace tokens per doc, the q56 tokenization), lift as
    * ONE division of exact long products (`df_cell·n / n_cell·df` —
    * associative integer arithmetic, then a single IEEE divide, so the
    * ranking key is bit-identical on both engines). */
  def cellTopTermsSql(cents: Seq[Array[Double]], minDf: Long, minDfCell: Long,
                      topK: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |j AS (
       |  SELECT a.cell_id, d.doc_id, d.text
       |  FROM __assigned a JOIN documents d ON d.doc_id = a.doc_id),
       |tot AS (SELECT count(*) AS n FROM j),
       |ncell AS (SELECT cell_id, count(*) AS n_cell FROM j GROUP BY cell_id),
       |terms AS (
       |  SELECT cell_id, doc_id, unnest(list_distinct(list_filter(
       |    regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
       |    x -> x <> ''))) AS term
       |  FROM j),
       |tdf AS (SELECT term, count(*) AS df FROM terms GROUP BY term),
       |dfc AS (SELECT cell_id, term, count(*) AS df_cell
       |        FROM terms GROUP BY cell_id, term),
       |ranked AS (
       |  SELECT c.cell_id, c.term, c.df_cell,
       |    CAST(c.df_cell * t.n AS DOUBLE) /
       |      CAST(nc.n_cell * f.df AS DOUBLE) AS lift,
       |    row_number() OVER (PARTITION BY c.cell_id ORDER BY
       |      CAST(c.df_cell * t.n AS DOUBLE) /
       |        CAST(nc.n_cell * f.df AS DOUBLE) DESC,
       |      c.term ASC) AS rnk
       |  FROM dfc c JOIN tdf f USING (term) JOIN ncell nc USING (cell_id), tot t
       |  WHERE f.df >= $minDf AND c.df_cell >= $minDfCell)
       |SELECT CAST(cell_id AS BIGINT) AS cell_id, term,
       |  CAST(df_cell AS BIGINT) AS df_cell,
       |  round(lift, 4) AS lift, CAST(rnk AS BIGINT) AS rnk
       |FROM ranked WHERE rnk <= $topK
       |ORDER BY cell_id, rnk""".stripMargin

  /** q152's oracle: probed IVF search AFTER `remove_ids(IDSelectorRange
    * (imin, imax))` — the [[ivfSearchSql]] replay with the removed id
    * range excluded from the scored set (assignment unchanged: removal
    * deletes rows from the store, it never re-assigns survivors). */
  def ivfRemoveSearchSql(cents: Seq[Array[Double]], k: Int, nprobe: Int,
                         imin: Long, imax: Long): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |scored AS (
       |  SELECT a.doc_id, a.cell_id, ${dotFold("a.embedding", "q.qe")} AS s
       |  FROM __assigned a, q
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe)
       |    AND NOT (a.doc_id >= $imin AND a.doc_id < $imax))
       |SELECT doc_id, CAST(cell_id AS BIGINT) AS cell_id,
       |  round(s, 4) AS score
       |FROM scored
       |ORDER BY s DESC, doc_id
       |LIMIT $k""".stripMargin

  /** q168's oracle: probed IVF search over the store built by
    * `merge_from(other, add_id)` — the [[ivfSearchSql]] replay with the
    * donor half's ids shifted by `addId` (dest = even ids as-is, donor =
    * odd ids + addId; assignment unchanged — the remap renames ids, it
    * never re-assigns). Ties order on the SHIFTED id, exactly what the
    * merged store carries. */
  def ivfMergeShiftSearchSql(cents: Seq[Array[Double]], k: Int, nprobe: Int,
                             addId: Long): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |scored AS (
       |  SELECT CASE WHEN a.doc_id % 2 = 1 THEN a.doc_id + $addId
       |              ELSE a.doc_id END AS doc_id,
       |    a.cell_id, ${dotFold("a.embedding", "q.qe")} AS s
       |  FROM __assigned a, q
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe))
       |SELECT doc_id, CAST(cell_id AS BIGINT) AS cell_id,
       |  round(s, 4) AS score
       |FROM scored
       |ORDER BY s DESC, doc_id
       |LIMIT $k""".stripMargin

  /** q110's oracle: FILTERED IVF search (FAISS `IDSelector` semantics) —
    * the [[ivfSearchSql]] replay with the metadata predicate applied
    * inside the probed scan (label read back from the source row). */
  def ivfFilteredSearchSql(cents: Seq[Array[Double]], k: Int, nprobe: Int,
                           label: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |scored AS (
       |  SELECT a.doc_id, a.cell_id, ${dotFold("a.embedding", "q.qe")} AS s
       |  FROM __assigned a JOIN embeddings e ON e.vec_id = a.doc_id, q
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe)
       |    AND e.label = $label)
       |SELECT doc_id, CAST(cell_id AS BIGINT) AS cell_id,
       |  round(s, 4) AS score
       |FROM scored
       |ORDER BY s DESC, doc_id
       |LIMIT $k""".stripMargin

  /** q98's oracle: probed IVF range search — cell assignment
    * ([[ivfAssignCtes]]), IP centroid probe, strict-fold dot
    * ([[dotFold]]), radius threshold on the UNROUNDED score (the q85
    * posture: ORDER and FILTER on the exact value, COMPARE rounded). */
  def ivfRangeSearchSql(cents: Seq[Array[Double]], minScore: Double,
                        nprobe: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |scored AS (
       |  SELECT a.doc_id, a.cell_id, ${dotFold("a.embedding", "q.qe")} AS s
       |  FROM __assigned a, q
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe))
       |SELECT doc_id, CAST(cell_id AS BIGINT) AS cell_id, round(s, 4) AS score
       |FROM scored WHERE s >= $minScore
       |ORDER BY s DESC, doc_id""".stripMargin

  /** q34's oracle: recall@k of IVF search vs the exact scan for the first
    * `nq` vectors as queries. */
  def ivfRecallSql(cents: Seq[Array[Double]], k: Int, nprobe: Int, nq: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |qs AS (SELECT vec_id AS query_id, embedding AS qe
       |       FROM embeddings WHERE vec_id < $nq),
       |probe AS (
       |  SELECT q.query_id, c.cell_id, row_number() OVER (PARTITION BY q.query_id
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c CROSS JOIN qs q),
       |exact AS (
       |  SELECT query_id, doc_id FROM (
       |    SELECT q.query_id, e.vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${dotFold("e.embedding", "q.qe")} DESC, e.vec_id ASC) AS rnk
       |    FROM embeddings e CROSS JOIN qs q)
       |  WHERE rnk <= $k),
       |approx AS (
       |  SELECT query_id, doc_id FROM (
       |    SELECT p.query_id, a.doc_id,
       |      row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY ${dotFold("a.embedding", "q.qe")} DESC, a.doc_id ASC) AS rnk
       |    FROM __assigned a
       |    JOIN probe p ON a.cell_id = p.cell_id AND p.pr <= $nprobe
       |    JOIN qs q ON q.query_id = p.query_id)
       |  WHERE rnk <= $k),
       |ov AS (
       |  SELECT e.query_id, count(*) AS n FROM exact e
       |  JOIN approx x ON e.query_id = x.query_id AND e.doc_id = x.doc_id
       |  GROUP BY 1)
       |SELECT q.query_id, CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
       |  round(coalesce(ov.n, 0) / $k.0, 2) AS recall_at_$k
       |FROM (SELECT DISTINCT query_id FROM qs) q LEFT JOIN ov USING (query_id)
       |ORDER BY query_id""".stripMargin

  /** q116's oracle: embedding-outlier report — cell assignment
    * ([[ivfAssignCtes]]), FLOAT-cast residual, the `norm_f32` strict
    * fold (double squares in dim order, then sqrt), per-cell
    * avg/stddev_samp, z > 2 on the unrounded value. */
  def embeddingOutliersSql(cents: Seq[Array[Double]]): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |d AS (
       |  SELECT a.doc_id, a.cell_id,
       |    sqrt(list_reduce(list_prepend(0.0,
       |      list_transform(list_zip(a.embedding, c.c),
       |        p -> CAST(CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT) AS DOUBLE) *
       |             CAST(CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT) AS DOUBLE))),
       |      (acc, t) -> acc + t)) AS dist
       |  FROM __assigned a JOIN __cents c USING (cell_id)),
       |st AS (
       |  SELECT cell_id, avg(dist) AS mu, stddev_samp(dist) AS sd
       |  FROM d GROUP BY cell_id)
       |SELECT d.doc_id, CAST(d.cell_id AS BIGINT) AS cell_id,
       |  round(d.dist, 4) AS dist, round((d.dist - st.mu) / st.sd, 4) AS z
       |FROM d JOIN st USING (cell_id)
       |WHERE st.sd > 0 AND (d.dist - st.mu) / st.sd > 2.0
       |ORDER BY d.doc_id""".stripMargin

  /** q137's oracle: embedding-drift report between two id-sliced
    * snapshots under the persisted quantizer — assignment replay per
    * slice, per-cell occupancy + decimal-summed mean residual distance
    * (the q116 float-cast residual fold), fractions and the absolute
    * occupancy shift over the `ncells`-row filled frame. */
  def embeddingDriftSql(cents: Seq[Array[Double]],
                        oldPred: String, newPred: String): String = {
    val k = cents.length
    val values = cents.zipWithIndex
      .map { case (c, i) => s"($i, [${c.mkString(", ")}])" }
      .mkString(",\n      ")
    def assignCte(name: String, pred: String) =
      s"""$name AS (
         |  SELECT doc_id, embedding, cell_id FROM (
         |    SELECT e.vec_id AS doc_id, e.embedding, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_sum(list_transform(list_zip(e.embedding, c.c),
         |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
         |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
         |        c.cell_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN __cents c
         |    WHERE $pred) WHERE rn = 1)""".stripMargin
    def statCte(name: String, src: String) =
      s"""$name AS (
         |  SELECT a.cell_id, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(round(sqrt(list_reduce(list_prepend(0.0,
         |      list_transform(list_zip(a.embedding, c.c),
         |        p -> CAST(CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT) AS DOUBLE) *
         |             CAST(CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT) AS DOUBLE))),
         |      (acc, t) -> acc + t)), 6) AS DECIMAL(22,6))) AS sd
         |  FROM $src a JOIN __cents c USING (cell_id) GROUP BY a.cell_id)""".stripMargin
    s"""WITH __cents(cell_id, c) AS (VALUES
       |      $values),
       |${assignCte("ao", oldPred)},
       |${assignCte("an", newPred)},
       |${statCte("so", "ao")},
       |${statCte("sn", "an")},
       |cells AS (SELECT unnest(range(0, $k)) AS cell_id),
       |filled AS (
       |  SELECT c.cell_id,
       |    coalesce(so.n, 0) AS n_old, coalesce(sn.n, 0) AS n_new,
       |    so.sd AS sd_old, sn.sd AS sd_new
       |  FROM cells c LEFT JOIN so USING (cell_id) LEFT JOIN sn USING (cell_id)),
       |tot AS (SELECT CAST(sum(n_old) AS DOUBLE) AS o,
       |               CAST(sum(n_new) AS DOUBLE) AS w FROM filled)
       |SELECT CAST(f.cell_id AS BIGINT) AS cell_id, f.n_old, f.n_new,
       |  round(CASE WHEN t.o > 0 THEN CAST(f.n_old AS DOUBLE) / t.o END, 4)
       |    AS frac_old,
       |  round(CASE WHEN t.w > 0 THEN CAST(f.n_new AS DOUBLE) / t.w END, 4)
       |    AS frac_new,
       |  round(CASE WHEN f.n_old > 0
       |    THEN CAST(f.sd_old AS DOUBLE) / CAST(f.n_old AS DOUBLE) END, 4)
       |    AS mean_resid_old,
       |  round(CASE WHEN f.n_new > 0
       |    THEN CAST(f.sd_new AS DOUBLE) / CAST(f.n_new AS DOUBLE) END, 4)
       |    AS mean_resid_new,
       |  round(abs(coalesce(CASE WHEN t.w > 0 THEN CAST(f.n_new AS DOUBLE) / t.w END, 0.0)
       |          - coalesce(CASE WHEN t.o > 0 THEN CAST(f.n_old AS DOUBLE) / t.o END, 0.0)),
       |    4) AS shift
       |FROM filled f, tot t
       |ORDER BY f.cell_id""".stripMargin
  }

  /** q107's oracle: the nprobe↦recall operating curve (FAISS
    * `ParameterSpace` autotune surface) — one approx/overlap block per
    * swept nprobe against the shared exact top-k, total overlap summed
    * over the `nq` queries, recall = n_overlap / (nq·k). */
  def ivfRecallSweepSql(cents: Seq[Array[Double]], k: Int,
                        nprobes: Seq[Int], nq: Int): String = {
    val blocks = nprobes.map { np =>
      s"""approx$np AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT p.query_id, a.doc_id,
         |      row_number() OVER (PARTITION BY p.query_id
         |        ORDER BY ${dotFold("a.embedding", "q.qe")} DESC, a.doc_id ASC) AS rnk
         |    FROM __assigned a
         |    JOIN probe p ON a.cell_id = p.cell_id AND p.pr <= $np
         |    JOIN qs q ON q.query_id = p.query_id)
         |  WHERE rnk <= $k),
         |ov$np AS (
         |  SELECT CAST($np AS BIGINT) AS nprobe,
         |    CAST(coalesce(sum(n), 0) AS BIGINT) AS n_overlap
         |  FROM (SELECT e.query_id, count(*) AS n FROM exact e
         |        JOIN approx$np x USING (query_id, doc_id) GROUP BY 1))""".stripMargin
    }.mkString(",\n")
    val union = nprobes.map(np => s"SELECT * FROM ov$np").mkString(" UNION ALL ")
    s"""WITH ${ivfAssignCtes(cents)},
       |qs AS (SELECT vec_id AS query_id, embedding AS qe
       |       FROM embeddings WHERE vec_id < $nq),
       |probe AS (
       |  SELECT q.query_id, c.cell_id, row_number() OVER (PARTITION BY q.query_id
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c CROSS JOIN qs q),
       |exact AS (
       |  SELECT query_id, doc_id FROM (
       |    SELECT q.query_id, e.vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${dotFold("e.embedding", "q.qe")} DESC, e.vec_id ASC) AS rnk
       |    FROM embeddings e CROSS JOIN qs q)
       |  WHERE rnk <= $k),
       |$blocks
       |SELECT nprobe, n_overlap,
       |  round(n_overlap / ${nq * k}.0, 4) AS recall
       |FROM ($union)
       |ORDER BY nprobe""".stripMargin
  }

  /** q123's oracle: nlist tuning sweep — one derived-table block per
    * sweep point (each with its OWN `WITH`, so the fixed
    * [[ivfAssignCtes]] names don't collide), unioned. Per block: the
    * [[ivfRecallSweepSql]] recall replay at fixed nprobe, the
    * [[ivfCellStatsSql]] imbalance formula, and the mean squared
    * residual — FLOAT-cast residual (`residual_f32` parity), strict
    * double self-dot fold, per-row round(6) → DECIMAL(22,6) sum so the
    * corpus-wide mean is addition-order independent on both engines. */
  def nlistSweepSql(points: Seq[(Int, Seq[Array[Double]])], k: Int,
                    nprobe: Int, nq: Int): String = {
    val blocks = points.map { case (nl, cents) =>
      s"""SELECT * FROM (
         |WITH ${ivfAssignCtes(cents)},
         |qs AS (SELECT vec_id AS query_id, embedding AS qe
         |       FROM embeddings WHERE vec_id < $nq),
         |probe AS (
         |  SELECT q.query_id, c.cell_id, row_number() OVER (PARTITION BY q.query_id
         |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
         |  FROM __cents c CROSS JOIN qs q),
         |exact AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT q.query_id, e.vec_id AS doc_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${dotFold("e.embedding", "q.qe")} DESC, e.vec_id ASC) AS rnk
         |    FROM embeddings e CROSS JOIN qs q)
         |  WHERE rnk <= $k),
         |approx AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT p.query_id, a.doc_id,
         |      row_number() OVER (PARTITION BY p.query_id
         |        ORDER BY ${dotFold("a.embedding", "q.qe")} DESC, a.doc_id ASC) AS rnk
         |    FROM __assigned a
         |    JOIN probe p ON a.cell_id = p.cell_id AND p.pr <= $nprobe
         |    JOIN qs q ON q.query_id = p.query_id)
         |  WHERE rnk <= $k),
         |ov AS (
         |  SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_overlap
         |  FROM (SELECT e.query_id, count(*) AS n FROM exact e
         |        JOIN approx x USING (query_id, doc_id) GROUP BY 1)),
         |counts AS (SELECT cell_id, CAST(count(*) AS BIGINT) AS n
         |           FROM __assigned GROUP BY 1),
         |imb AS (
         |  SELECT round(($nl.0 * CAST(sum(n*n) AS DOUBLE)) /
         |    (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)), 4)
         |    AS imbalance_factor
         |  FROM counts),
         |res AS (
         |  SELECT a.doc_id,
         |    list_transform(list_zip(a.embedding, c.c),
         |      p -> CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT)) AS r
         |  FROM __assigned a JOIN __cents c USING (cell_id)),
         |d2 AS (
         |  SELECT doc_id, list_reduce(list_prepend(0.0,
         |    list_transform(r, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         |    (acc, t) -> acc + t) AS d2
         |  FROM res),
         |mr AS (
         |  SELECT round(CAST(sum(CAST(round(d2, 6) AS DECIMAL(22,6))) AS DOUBLE)
         |    / count(*), 4) AS mean_resid
         |  FROM d2)
         |SELECT CAST($nl AS BIGINT) AS nlist, i.imbalance_factor, m.mean_resid,
         |  o.n_overlap, round(o.n_overlap / ${nq * k}.0, 4) AS recall
         |FROM imb i, mr m, ov o)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$blocks\nORDER BY nlist"
  }

  /** q79's oracle: SQ8 encode + reconstructed-inner-product top-k,
    * replayed from the persisted per-dim bounds. Encode is
    * `clamp(floor((x − vmin)/step + 0.5), 0, 255)` — `floor(t + 0.5)`
    * is the one rounding formulation Java and DuckDB evaluate
    * identically, so codes match bit-for-bit. Per-dim score terms
    * `q_i · (vmin_i + code · step_i)` fold in dim order
    * (`list_sum(list(term ORDER BY dim_i))`), matching the Spark
    * kernel's index-order accumulation; compare rounded(4) per the q77
    * precedent (DuckDB's list_sum is not a plain left fold). */
  def sqSearchSql(vmin: Array[Double], step: Array[Double], k: Int): String = {
    val values = vmin.indices
      .map(i => s"($i, ${vmin(i)}, ${step(i)})").mkString(",\n      ")
    s"""WITH __bounds(dim_i, vmin, vstep) AS (VALUES
       |      $values),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |terms AS (
       |  SELECT e.vec_id AS doc_id, b.dim_i,
       |    CAST(q.qe[b.dim_i+1] AS DOUBLE) * (b.vmin +
       |      (CASE WHEN b.vstep = 0 THEN 0
       |            ELSE least(greatest(CAST(floor(
       |              (CAST(e.embedding[b.dim_i+1] AS DOUBLE) - b.vmin)
       |              / b.vstep + 0.5) AS INT), 0), 255) END) * b.vstep) AS term
       |  FROM embeddings e CROSS JOIN __bounds b, q),
       |score AS (
       |  SELECT doc_id, list_sum(list(term ORDER BY dim_i)) AS score
       |  FROM terms GROUP BY doc_id)
       |SELECT doc_id, round(t.score, 4) AS score FROM (
       |  SELECT doc_id, score FROM score
       |  ORDER BY score DESC, doc_id ASC LIMIT $k) t
       |ORDER BY t.score DESC, t.doc_id ASC""".stripMargin
  }

  /** q100's oracle: SQ4 (packed-nibble) encode + reconstructed-inner-
    * product top-k, replayed from the persisted 4-bit bounds. Encode is
    * the [[sqSearchSql]] clamp with 15 as the ceiling; packing is
    * lossless, so the replay scores the re-derived per-dim codes
    * directly. Terms are PER PAIR of dims — `q_{2j}·recon + q_{2j+1}·
    * recon` computed left-to-right (= the driver's paired-LUT entry),
    * folded in pair order (= the AdcLut kernel's packed-byte
    * accumulation); the odd tail adds exact `0.0`. Compare rounded(4),
    * the q77/q79 precedent. */
  def sq4SearchSql(vmin: Array[Double], step: Array[Double], k: Int): String = {
    val n = vmin.length
    val values = (0 until (n + 1) / 2).map { j =>
      val d0 = 2 * j
      val d1 = 2 * j + 1
      if (d1 < n) s"($j, $d0, ${vmin(d0)}, ${step(d0)}, $d1, ${vmin(d1)}, ${step(d1)})"
      else s"($j, $d0, ${vmin(d0)}, ${step(d0)}, -1, 0.0, 0.0)"
    }.mkString(",\n      ")
    def codeOf(dim: String, vm: String, st: String) =
      s"""(CASE WHEN $st = 0 THEN 0
         |            ELSE least(greatest(CAST(floor(
         |              (CAST(e.embedding[$dim+1] AS DOUBLE) - $vm)
         |              / $st + 0.5) AS INT), 0), 15) END)""".stripMargin
    s"""WITH __pairs(pj, d0, vmin0, step0, d1, vmin1, step1) AS (VALUES
       |      $values),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |terms AS (
       |  SELECT e.vec_id AS doc_id, p.pj,
       |    CAST(q.qe[p.d0+1] AS DOUBLE) * (p.vmin0 +
       |      ${codeOf("p.d0", "p.vmin0", "p.step0")} * p.step0)
       |    + (CASE WHEN p.d1 < 0 THEN 0.0
       |            ELSE CAST(q.qe[p.d1+1] AS DOUBLE) * (p.vmin1 +
       |              ${codeOf("p.d1", "p.vmin1", "p.step1")} * p.step1) END) AS term
       |  FROM embeddings e CROSS JOIN __pairs p, q),
       |score AS (
       |  SELECT doc_id, list_sum(list(term ORDER BY pj)) AS score
       |  FROM terms GROUP BY doc_id)
       |SELECT doc_id, round(t.score, 4) AS score FROM (
       |  SELECT doc_id, score FROM score
       |  ORDER BY score DESC, doc_id ASC LIMIT $k) t
       |ORDER BY t.score DESC, t.doc_id ASC""".stripMargin
  }

  /** q95's oracle, GENERATED from the persisted quantizer: cell
    * assignment + the salted-md5 draw order per cell (`hashBucket`
    * replayed as `substr(md5('salt:' || id), 1, 8)`), capped at
    * `perCell`. */
  def clusterSampleSql(cents: Seq[Array[Double]], perCell: Int,
                       salt: String): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |ranked AS (
       |  SELECT doc_id, cell_id,
       |    row_number() OVER (PARTITION BY cell_id
       |      ORDER BY substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 1, 8) ASC,
       |        doc_id ASC) AS rnk
       |  FROM __assigned)
       |SELECT doc_id, CAST(cell_id AS BIGINT) AS cell_id,
       |  CAST(rnk AS BIGINT) AS rnk
       |FROM ranked WHERE rnk <= $perCell
       |ORDER BY doc_id""".stripMargin

  /** q94's oracle, GENERATED from the persisted classifier: replay the
    * hashed unigram+bigram histogram (the q81 feature CTEs verbatim),
    * densify per-doc bucket counts, and fold `w·h + b` as a strict left
    * fold in bucket order — the Spark `aggregate(zip_with(...))`
    * accumulation. Scores are logits (no `exp` — libm vs JVM last-ulp
    * divergence), `pred = z > 0`. */
  def qualityClassifierSql(weights: Array[Double], intercept: Double): String =
    s"""WITH ${qualityClassifierCtes(weights, intercept)}
       |SELECT doc_id, round(zv, 4) AS score, zv > 0 AS pred
       |FROM z ORDER BY doc_id""".stripMargin

  /** The classifier-scoring CTE chain (feats → … → `z(doc_id, zv)`) —
    * shared by [[qualityClassifierSql]] (q94) and the q130
    * screen-vs-classifier agreement audit, whose oracle composes it
    * with the screen CTEs (disjoint CTE names by construction). */
  def qualityClassifierCtes(weights: Array[Double], intercept: Double): String = {
    val nb = weights.length
    val wLit = s"[${weights.mkString(", ")}]"
    val b = hexPrefixToBigint("md5(p.f)", 8)
    s"""feats AS (
       |  SELECT doc_id, ts || CASE WHEN len(ts) >= 2 THEN
       |      list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])
       |    ELSE [] END AS fs
       |  FROM (
       |    SELECT doc_id, list_filter(
       |      regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
       |      x -> x <> '') AS ts
       |    FROM documents) t),
       |fx AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(fs) + 1),
       |    i -> struct_pack(rn := i, f := fs[i]))) AS p
       |  FROM feats),
       |fb AS (SELECT doc_id, ($b) % $nb AS bucket FROM fx),
       |bs AS (SELECT doc_id, list(bucket) AS blist FROM fb GROUP BY doc_id),
       |wt AS (SELECT $wLit AS w),
       |z AS (
       |  SELECT d.doc_id,
       |    list_reduce(list_prepend(0.0, list_transform(range($nb),
       |      i -> wt.w[i+1] * CAST(len(list_filter(coalesce(b.blist, []),
       |        x -> x = i)) AS DOUBLE))),
       |      (acc, t) -> acc + t) + $intercept AS zv
       |  FROM documents d LEFT JOIN bs b USING (doc_id), wt)""".stripMargin
  }

  /** q92's oracle: binary IVF replayed from the shared quantizer —
    * assignment, the inner-product centroid probe, and Hamming distance
    * as the count of sign-disagreeing dims (the q84 semantics) over the
    * probed cells only. */
  /** q92's oracle: cells assigned on the ORIGINAL 64-d embeddings (the
    * shared quantizer), Hamming replayed over the widened >64-d vectors
    * ([[wideCte]]) — the binary codes pack ALL d sign bits. */
  def bivfSearchSql(cents: Seq[Array[Double]], k: Int, nprobe: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |${wideCte()},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |qw AS (SELECT embedding AS qe FROM __wide WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c, q)
       |SELECT a.doc_id, CAST(a.cell_id AS BIGINT) AS cell_id,
       |  CAST(len(list_filter(range(len(w.embedding)),
       |    i -> (w.embedding[i+1] > 0) != (qw.qe[i+1] > 0))) AS BIGINT) AS hamming
       |FROM __assigned a JOIN __wide w ON a.doc_id = w.vec_id, qw
       |WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe)
       |ORDER BY hamming, a.doc_id
       |LIMIT $k""".stripMargin

  /** q108's oracle: binary IVF range search — the [[bivfSearchSql]]
    * replay (cells assigned on the ORIGINAL 64-d embeddings, Hamming as
    * sign-disagreeing dims over the widened vectors, probed cells only)
    * with the radius filter instead of the LIMIT. */
  def bivfRangeSql(cents: Seq[Array[Double]], maxDist: Int, nprobe: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |${wideCte()},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |qw AS (SELECT embedding AS qe FROM __wide WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |h AS (
       |  SELECT a.doc_id, CAST(a.cell_id AS BIGINT) AS cell_id,
       |    CAST(len(list_filter(range(len(w.embedding)),
       |      i -> (w.embedding[i+1] > 0) != (qw.qe[i+1] > 0))) AS BIGINT) AS hamming
       |  FROM __assigned a JOIN __wide w ON a.doc_id = w.vec_id, qw
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe))
       |SELECT doc_id, cell_id, hamming FROM h
       |WHERE hamming <= $maxDist
       |ORDER BY hamming, doc_id""".stripMargin

  /** q91's oracle: IVF-SQ8 replayed from BOTH artifacts — cell
    * assignment ([[ivfAssignCtes]]), FLOAT-cast residuals, the
    * `floor(t+0.5)` byte encode against residual-trained bounds, an
    * inner-product centroid probe, and per-dim score terms
    * `q_i · (cent_i + vmin_i + code · step_i)` folded in dim order
    * (the `adc_lut_cells` accumulation). */
  def ivfSqSearchSql(cents: Seq[Array[Double]], vmin: Array[Double],
                     step: Array[Double], k: Int, nprobe: Int): String = {
    val values = vmin.indices
      .map(i => s"($i, ${vmin(i)}, ${step(i)})").mkString(",\n      ")
    val res = "CAST(CAST(CAST(a.embedding[b.dim_i+1] AS DOUBLE) " +
      "- cc.c[b.dim_i+1] AS FLOAT) AS DOUBLE)"
    s"""WITH ${ivfAssignCtes(cents)},
       |__bounds(dim_i, vmin, vstep) AS (VALUES
       |      $values),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |terms AS (
       |  SELECT a.doc_id, a.cell_id, b.dim_i,
       |    CAST(q.qe[b.dim_i+1] AS DOUBLE) * (cc.c[b.dim_i+1] + b.vmin +
       |      (CASE WHEN b.vstep = 0 THEN 0
       |            ELSE least(greatest(CAST(floor(
       |              ($res - b.vmin) / b.vstep + 0.5) AS INT), 0), 255)
       |       END) * b.vstep) AS term
       |  FROM __assigned a
       |  JOIN __cents cc ON a.cell_id = cc.cell_id
       |  CROSS JOIN __bounds b, q
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe)),
       |score AS (
       |  SELECT doc_id, cell_id, list_sum(list(term ORDER BY dim_i)) AS score
       |  FROM terms GROUP BY doc_id, cell_id)
       |SELECT doc_id, CAST(cell_id AS BIGINT) AS cell_id,
       |  round(t.score, 4) AS score FROM (
       |  SELECT doc_id, cell_id, score FROM score
       |  ORDER BY score DESC, doc_id ASC LIMIT $k) t
       |ORDER BY t.score DESC, t.doc_id ASC""".stripMargin
  }

  /** q102's oracle: IVF-SQ4 (by-residual, packed nibbles) probed search,
    * replayed from quantizer + 4-bit residual bounds — the
    * [[ivfSqSearchSql]] replay with the [[sq4SearchSql]] pairing: codes
    * re-derived from float-cast residuals at the 15 ceiling, score terms
    * PER PAIR of dims (each `q·(cent + vmin + code·step)` left-to-right,
    * the driver's per-cell LUT entry), folded in pair order. */
  def ivfSq4SearchSql(cents: Seq[Array[Double]], vmin: Array[Double],
                      step: Array[Double], k: Int, nprobe: Int): String = {
    val n = vmin.length
    val values = (0 until (n + 1) / 2).map { j =>
      val d0 = 2 * j
      val d1 = 2 * j + 1
      if (d1 < n) s"($j, $d0, ${vmin(d0)}, ${step(d0)}, $d1, ${vmin(d1)}, ${step(d1)})"
      else s"($j, $d0, ${vmin(d0)}, ${step(d0)}, -1, 0.0, 0.0)"
    }.mkString(",\n      ")
    def res(dim: String) =
      s"CAST(CAST(CAST(a.embedding[$dim+1] AS DOUBLE) - cc.c[$dim+1] AS FLOAT) AS DOUBLE)"
    def codeOf(dim: String, vm: String, st: String) =
      s"""(CASE WHEN $st = 0 THEN 0
         |            ELSE least(greatest(CAST(floor(
         |              (${res(dim)} - $vm) / $st + 0.5) AS INT), 0), 15) END)""".stripMargin
    s"""WITH ${ivfAssignCtes(cents)},
       |__pairs(pj, d0, vmin0, step0, d1, vmin1, step1) AS (VALUES
       |      $values),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |terms AS (
       |  SELECT a.doc_id, a.cell_id, p.pj,
       |    CAST(q.qe[p.d0+1] AS DOUBLE) * (cc.c[p.d0+1] + p.vmin0 +
       |      ${codeOf("p.d0", "p.vmin0", "p.step0")} * p.step0)
       |    + (CASE WHEN p.d1 < 0 THEN 0.0
       |            ELSE CAST(q.qe[p.d1+1] AS DOUBLE) * (cc.c[p.d1+1] + p.vmin1 +
       |              ${codeOf("p.d1", "p.vmin1", "p.step1")} * p.step1) END) AS term
       |  FROM __assigned a
       |  JOIN __cents cc ON a.cell_id = cc.cell_id
       |  CROSS JOIN __pairs p, q
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe)),
       |score AS (
       |  SELECT doc_id, cell_id, list_sum(list(term ORDER BY pj)) AS score
       |  FROM terms GROUP BY doc_id, cell_id)
       |SELECT doc_id, CAST(cell_id AS BIGINT) AS cell_id,
       |  round(t.score, 4) AS score FROM (
       |  SELECT doc_id, cell_id, score FROM score
       |  ORDER BY score DESC, doc_id ASC LIMIT $k) t
       |ORDER BY t.score DESC, t.doc_id ASC""".stripMargin
  }

  /** q83's oracle: IVF occupancy stats + imbalance factor replayed from
    * the persisted quantizer — assignment, `ncells`-row histogram with
    * empty cells filled, `ncells · Σs² / (Σs)²`. */
  def ivfCellStatsSql(cents: Seq[Array[Double]]): String = {
    val k = cents.length
    s"""WITH ${ivfAssignCtes(cents)},
       |counts AS (
       |  SELECT cell_id, CAST(count(*) AS BIGINT) AS n_vectors
       |  FROM __assigned GROUP BY 1),
       |cells AS (SELECT unnest(range(0, $k)) AS cell_id),
       |filled AS (
       |  SELECT c.cell_id, coalesce(t.n_vectors, 0) AS n_vectors
       |  FROM cells c LEFT JOIN counts t USING (cell_id)),
       |tot AS (SELECT CAST(sum(n_vectors) AS DOUBLE) AS n,
       |               CAST(sum(n_vectors * n_vectors) AS DOUBLE) AS ss
       |        FROM filled)
       |SELECT CAST(f.cell_id AS BIGINT) AS cell_id, f.n_vectors,
       |  round(CAST(f.n_vectors AS DOUBLE) / t.n, 4) AS frac,
       |  round($k.0 * t.ss / (t.n * t.n), 4) AS imbalance_factor
       |FROM filled f, tot t ORDER BY f.cell_id""".stripMargin
  }

  /** q82's oracle: SemDeDup replayed from the persisted coarse
    * quantizer — cell assignment ([[ivfAssignCtes]]), per-cell capped
    * cosine pairs, RECURSIVE component closure (the q63 idiom), and the
    * keep-farthest-from-centroid resolution. The centroid distance
    * replays the FLOAT-cast residual (`residual_f32` parity: each
    * element `float(double(x) − c)`, squared in double) folded with the
    * strict left-fold idiom (`list_reduce(list_prepend(0.0, …))`) so
    * the ranking key matches the Spark kernel's sequential accumulation
    * bit-for-bit; `score` compares rounded(4), `kept` exact. */
  /** q87's oracle, GENERATED from the persisted quantizer: cell
    * assignment, the same `maxCellSize` lowest-id truncation, in-cell
    * self-join (src ≠ dst) and per-src rank — the cell-blocked k-NN
    * graph replayed relationally. */
  /** Shared k-NN-graph build CTEs (`__capped`, `__gscored`): the q87
    * cell-blocked construction — cells capped to their `cap` lowest ids,
    * all in-cell pairs scored with the strict double fold ([[dotFold]] —
    * `list_dot_product`'s float32 accumulation flips near-tie ranks). */
  private def graphBaseCtes(cap: Int): String =
    s"""__capped AS (
       |  SELECT doc_id, embedding, cell_id FROM (
       |    SELECT a.doc_id, a.embedding, a.cell_id,
       |      row_number() OVER (PARTITION BY a.cell_id
       |        ORDER BY a.doc_id) AS crn
       |    FROM __assigned a) WHERE crn <= $cap),
       |__gscored AS (
       |  SELECT x.doc_id AS src, y.doc_id AS dst,
       |    ${dotFold("x.embedding", "y.embedding")} AS s
       |  FROM __capped x JOIN __capped y
       |    ON x.cell_id = y.cell_id AND x.doc_id <> y.doc_id)""".stripMargin

  /** Shared RP-forest routing CTE chain (q219/q220): every embedding
    * routed through the INLINED split heap level by level — at heap
    * node i the side is `dot(emb, w_i) ≥ θ_i` on the strict double fold
    * ([[dotFold]], the `tree_route_f32` accumulation) — ending at
    * `__rleaves(doc_id, tree, leaf)`. The whole assignment, not just
    * the search output, sits under the gate. */
  private def rpfCtes(splits: Seq[(Int, Int, Array[Double], Double)],
                      depth: Int): String = {
    val values = splits.map { case (t, n, w, th) =>
      s"($t, $n, [${w.mkString(", ")}], $th)"
    }.mkString(",\n      ")
    val trees = splits.map(_._1).distinct.sorted
    val levels = (1 to depth).map { l =>
      val prev = if (l == 1) "__r0" else s"__r${l - 1}"
      s"""__r$l AS (
         |  SELECT d.doc_id, d.embedding, d.tree,
         |    d.node * 2 + CASE WHEN ${dotFold("d.embedding", "s.w")} >= s.theta
         |      THEN 1 ELSE 0 END AS node
         |  FROM $prev d JOIN __splits s ON s.tree = d.tree AND s.node = d.node)""".stripMargin
    }.mkString(",\n")
    s"""__splits(tree, node, w, theta) AS (VALUES
       |      $values),
       |__r0 AS (
       |  SELECT e.vec_id AS doc_id, e.embedding, t.tree, 1 AS node
       |  FROM embeddings e
       |  CROSS JOIN (SELECT unnest([${trees.mkString(", ")}]) AS tree) t),
       |$levels,
       |__rleaves AS (
       |  SELECT doc_id, tree, node - ${1 << depth} AS leaf FROM __r$depth)""".stripMargin
  }

  /** q219's oracle: RP-forest search — candidates = docs sharing a
    * (tree, leaf) with the query's driver-routed leaves, deduped across
    * trees, exact-IP reranked top-k. */
  def rpfSearchSql(splits: Seq[(Int, Int, Array[Double], Double)],
                   depth: Int, qLeaves: Seq[(Int, Int)], k: Int,
                   qVecId: Long): String = {
    val qlv = qLeaves.map { case (t, l) => s"($t, $l)" }.mkString(", ")
    s"""WITH ${rpfCtes(splits, depth)},
       |qleaf(tree, leaf) AS (VALUES $qlv),
       |cand AS (
       |  SELECT DISTINCT r.doc_id FROM __rleaves r
       |  JOIN qleaf ql ON ql.tree = r.tree AND ql.leaf = r.leaf
       |  WHERE r.doc_id <> $qVecId),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $qVecId),
       |scored AS (
       |  SELECT c.doc_id, ${dotFold("e.embedding", "q.qe")} AS s
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id, q)
       |SELECT doc_id, round(s, 4) AS score
       |FROM scored ORDER BY s DESC, doc_id LIMIT $k""".stripMargin
  }

  /** q220's oracle: RP-forest recall vs exact (the q47 idiom) — approx
    * = per-query leaf candidates reranked top-k, exact = full-scan
    * top-k, overlap per query. */
  def rpfRecallSql(splits: Seq[(Int, Int, Array[Double], Double)],
                   depth: Int, qLeaves: Seq[(Long, Int, Int)], k: Int,
                   nq: Int): String = {
    val qlv = qLeaves.map { case (q, t, l) => s"($q, $t, $l)" }.mkString(", ")
    s"""WITH ${rpfCtes(splits, depth)},
       |qleaf(query_id, tree, leaf) AS (VALUES $qlv),
       |qx AS (
       |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |  WHERE vec_id < $nq),
       |cand AS (
       |  SELECT DISTINCT ql.query_id, r.doc_id FROM __rleaves r
       |  JOIN qleaf ql ON ql.tree = r.tree AND ql.leaf = r.leaf),
       |approx AS (
       |  SELECT query_id, doc_id FROM (
       |    SELECT c.query_id, c.doc_id,
       |      row_number() OVER (PARTITION BY c.query_id
       |        ORDER BY ${dotFold("e.embedding", "qx.qe")} DESC, c.doc_id ASC) AS rnk
       |    FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id
       |    JOIN qx ON qx.query_id = c.query_id)
       |  WHERE rnk <= $k),
       |exact AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT qx.query_id, e.vec_id,
       |      row_number() OVER (PARTITION BY qx.query_id
       |        ORDER BY ${dotFold("e.embedding", "qx.qe")} DESC, e.vec_id ASC) AS rnk
       |    FROM embeddings e CROSS JOIN qx)
       |  WHERE rnk <= $k),
       |ov AS (
       |  SELECT e.query_id, count(*) AS n
       |  FROM exact e JOIN approx a
       |    ON e.query_id = a.query_id AND e.vec_id = a.doc_id
       |  GROUP BY 1)
       |SELECT q2.query_id, CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlap,
       |  round(coalesce(ov.n, 0) / $k.0, 2) AS recall_at_$k
       |FROM (SELECT DISTINCT query_id FROM qx) q2 LEFT JOIN ov USING (query_id)
       |ORDER BY query_id""".stripMargin
  }

  /** q252's oracle: per-tree leaf-occupancy stats over the full routed
    * assignment — `imbalance` is max·2^depth / n as ONE double division
    * of exact integers (both engines divide the same two values). */
  def rpfOccupancySql(splits: Seq[(Int, Int, Array[Double], Double)],
                      depth: Int): String =
    s"""WITH ${rpfCtes(splits, depth)},
       |occ AS (SELECT tree, leaf, count(*) AS n FROM __rleaves GROUP BY 1, 2)
       |SELECT CAST(tree AS BIGINT) AS tree, CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_leaves,
       |  CAST(max(n) AS BIGINT) AS max_leaf, CAST(min(n) AS BIGINT) AS min_leaf,
       |  round(max(n) * ${1 << depth}.0 / sum(n), 4) AS imbalance
       |FROM occ GROUP BY tree ORDER BY tree""".stripMargin

  /** Shared KMV-sketch CTE chain over the documents table (q217/q218):
    * per-doc distinct 3-gram shingles (the q15 idiom), per-source
    * distinct 60-bit hash points (`'0x'+md5-prefix` cast ≡ Spark's
    * `conv(substr(md5,1,15),16,10)`), bottom-k per source as the sketch
    * list. The estimate is the single IEEE division
    * `(k−1)·2^60 / h_k` — the numerator literal is emitted as the
    * EXACT double Scala computes, so both engines divide the same two
    * doubles. */
  private def kmvCtes(k: Int): String =
    s"""toks AS (
       |  SELECT doc_id, source,
       |    regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
       |  FROM documents),
       |shl AS (
       |  SELECT doc_id, source,
       |    CASE WHEN len(t) < 3 THEN []::VARCHAR[]
       |         ELSE list_distinct(list_transform(range(1, len(t) - 1),
       |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS sh
       |  FROM toks),
       |pts AS (
       |  SELECT DISTINCT source AS grp,
       |    CAST(('0x' || substr(md5(s.sh_el), 1, 15)) AS BIGINT) AS h
       |  FROM shl, unnest(shl.sh) AS s(sh_el)),
       |rk AS (
       |  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
       |  FROM pts),
       |sk AS (
       |  SELECT grp, list(h ORDER BY h) AS sketch,
       |    CAST(count(*) AS BIGINT) AS n_vals
       |  FROM rk WHERE rn <= $k GROUP BY grp)""".stripMargin

  /** The KMV estimate expression over a sketch list column. */
  private def kmvEst(sketch: String, k: Int): String = {
    val num = (k - 1).toDouble * graft.operators.Sketches.HashSpace
    s"""CASE WHEN len($sketch) < $k THEN CAST(len($sketch) AS DOUBLE)
       |     ELSE $num / CAST($sketch[$k] AS DOUBLE) END""".stripMargin
  }

  /** q217's oracle: per-source exact distinct-hash count beside the KMV
    * estimate, replayed from the same hash points. */
  def kmvDistinctSql(k: Int): String =
    s"""WITH ${kmvCtes(k)},
       |ex AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_exact
       |       FROM pts GROUP BY grp)
       |SELECT sk.grp AS source, ex.n_exact, sk.n_vals,
       |  round(${kmvEst("sk.sketch", k)}, 4) AS est
       |FROM sk JOIN ex USING (grp) ORDER BY source""".stripMargin

  /** q257's oracle: per-event-type distinct-USER KMV over the events
    * table — exactly the one-pass sketch the streaming gate's
    * per-batch partials must merge into bit-for-bit (merge
    * associativity is the claim under test; the batch replay IS the
    * spec of the merged result). */
  def kmvStreamSql(k: Int): String =
    s"""WITH pts AS (
       |  SELECT DISTINCT event_type AS grp,
       |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
       |      AS h
       |  FROM events),
       |sk AS (
       |  SELECT grp, list_sort(list(h ORDER BY h))[1:$k] AS sketch,
       |    CAST(least(count(*), $k) AS BIGINT) AS n_vals
       |  FROM pts GROUP BY grp),
       |ex AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_exact
       |       FROM pts GROUP BY grp)
       |SELECT sk.grp AS event_type, ex.n_exact, sk.n_vals,
       |  round(${kmvEst("sk.sketch", k)}, 4) AS est
       |FROM sk JOIN ex USING (grp) ORDER BY event_type""".stripMargin

  /** q218's oracle: pairwise union/intersection estimates from merged
    * sketches — merge = k smallest of the deduped concatenation,
    * inclusion–exclusion on the unrounded estimates. */
  def kmvSetopsSql(k: Int): String = {
    val merged = s"list_sort(list_distinct(list_concat(a.sketch, b.sketch)))[1:$k]"
    s"""WITH ${kmvCtes(k)},
       |pairs AS (
       |  SELECT a.grp AS src_a, b.grp AS src_b,
       |    ${kmvEst("a.sketch", k)} AS ea,
       |    ${kmvEst("b.sketch", k)} AS eb,
       |    ${kmvEst(merged, k)} AS eu
       |  FROM sk a JOIN sk b ON a.grp < b.grp)
       |SELECT src_a, src_b, round(ea, 4) AS est_a, round(eb, 4) AS est_b,
       |  round(eu, 4) AS est_union, round(ea + eb - eu, 4) AS est_inter
       |FROM pairs ORDER BY src_a, src_b""".stripMargin
  }

  /** q215's oracle: triangle count + local clustering coefficient over
    * the same capped cell-blocked k-NN graph — canonical low→high edge
    * orientation, two oriented wedge joins closed by a third edge (each
    * triangle counted exactly once), per-node participation by
    * exploding the three corners. Exact longs + one rounded division. */
  def graphTrianglesSql(cents: Seq[Array[Double]], k: Int, cap: Int,
                        topK: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |g AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |    FROM __gscored) WHERE rnk <= $k),
       |ue AS (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM g WHERE src <> dst),
       |tri AS (
       |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM ue e1
       |  JOIN ue e2 ON e2.a = e1.a AND e2.b > e1.b
       |  JOIN ue e3 ON e3.a = e1.b AND e3.b = e2.b),
       |pn AS (
       |  SELECT node, count(*) AS n_tri FROM (
       |    SELECT x AS node FROM tri
       |    UNION ALL SELECT y FROM tri
       |    UNION ALL SELECT z FROM tri) GROUP BY node),
       |deg AS (
       |  SELECT node, count(*) AS deg FROM (
       |    SELECT a AS node FROM ue UNION ALL SELECT b FROM ue)
       |  GROUP BY node)
       |SELECT CAST(pn.node AS BIGINT) AS node,
       |  CAST(pn.n_tri AS BIGINT) AS n_tri,
       |  CAST(deg.deg AS BIGINT) AS deg,
       |  round(CASE WHEN deg.deg > 1
       |    THEN pn.n_tri * 2.0 / (deg.deg * (deg.deg - 1))
       |    ELSE 0.0 END, 4) AS lcc
       |FROM pn JOIN deg ON deg.node = pn.node
       |ORDER BY n_tri DESC, node LIMIT $topK""".stripMargin

  /** q216's oracle: the 5-round min-label WCC census replayed as
    * unrolled CTE blocks — each round a node's label becomes the min of
    * its own and its (symmetrized) neighbors'; integer min is
    * associative so the fixed-round result is bit-exact on both
    * engines. */
  def graphWccSql(cents: Seq[Array[Double]], k: Int, cap: Int,
                  rounds: Int): String = {
    val roundBlocks = (1 to rounds).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""l$i AS (
         |  SELECT node, min(lbl) AS lbl FROM (
         |    SELECT node, lbl FROM $prev
         |    UNION ALL
         |    SELECT u.dst AS node, p.lbl
         |    FROM u JOIN $prev p ON p.node = u.src) GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |g AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |    FROM __gscored) WHERE rnk <= $k),
       |u AS (SELECT src, dst FROM g UNION SELECT dst AS src, src AS dst FROM g),
       |n AS (SELECT DISTINCT src AS node FROM u),
       |l0 AS (SELECT node, node AS lbl FROM n),
       |$roundBlocks
       |SELECT CAST(lbl AS BIGINT) AS component,
       |  CAST(count(*) AS BIGINT) AS n_nodes
       |FROM l$rounds GROUP BY lbl ORDER BY component""".stripMargin
  }

  /** q223's oracle: the bounded k-core peel replayed as unrolled CTE
    * blocks — per round, edges among the alive set → degrees → the
    * survivors with degree ≥ kCore; one (round, n_alive, n_edges) row
    * each. */
  def graphKcoreSql(cents: Seq[Array[Double]], k: Int, cap: Int,
                    kCore: Int, rounds: Int): String = {
    val blocks = (1 to rounds).map { r =>
      val prevA = if (r == 1) "a0" else s"a${r - 1}"
      s"""e$r AS (
         |  SELECT src, dst FROM u
         |  WHERE src IN (SELECT node FROM $prevA)
         |    AND dst IN (SELECT node FROM $prevA)),
         |a$r AS (
         |  SELECT src AS node FROM (
         |    SELECT src, count(*) AS deg FROM e$r GROUP BY src)
         |  WHERE deg >= $kCore),
         |s$r AS (
         |  SELECT CAST($r AS BIGINT) AS round,
         |    CAST((SELECT count(*) FROM a$r) AS BIGINT) AS n_alive,
         |    CAST((SELECT count(*) FROM e$r
         |          WHERE src IN (SELECT node FROM a$r)
         |            AND dst IN (SELECT node FROM a$r)) // 2 AS BIGINT)
         |      AS n_edges)""".stripMargin
    }.mkString(",\n")
    val union = (1 to rounds).map(r => s"SELECT * FROM s$r")
      .mkString("\nUNION ALL\n")
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |g AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |    FROM __gscored) WHERE rnk <= $k),
       |u AS (SELECT src, dst FROM g UNION SELECT dst AS src, src AS dst FROM g),
       |a0 AS (SELECT DISTINCT src AS node FROM u),
       |$blocks
       |$union
       |ORDER BY round""".stripMargin
  }

  /** q224's oracle: the 4-round multi-source BFS hop census replayed as
    * unrolled CTE blocks — seeds (node % seedMod = 0) at hop 0, each
    * round a node's hop becomes the min of its own and its neighbors'
    * +1; integer min is associative so the fixed-round result is
    * bit-exact on both engines. Unreached nodes never enter the d
    * tables (join semantics, matching the engine). */
  def graphBfsSql(cents: Seq[Array[Double]], k: Int, cap: Int,
                  seedMod: Long, rounds: Int): String = {
    val blocks = (1 to rounds).map { i =>
      val prev = s"d${i - 1}"
      s"""d$i AS (
         |  SELECT node, min(hop) AS hop FROM (
         |    SELECT node, hop FROM $prev
         |    UNION ALL
         |    SELECT u.dst AS node, p.hop + 1 AS hop
         |    FROM u JOIN $prev p ON p.node = u.src) GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |g AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |    FROM __gscored) WHERE rnk <= $k),
       |u AS (SELECT src, dst FROM g UNION SELECT dst AS src, src AS dst FROM g),
       |n AS (SELECT DISTINCT src AS node FROM u),
       |d0 AS (SELECT node, 0 AS hop FROM n WHERE node % $seedMod = 0),
       |$blocks
       |SELECT CAST(hop AS BIGINT) AS hop,
       |  CAST(count(*) AS BIGINT) AS n_nodes
       |FROM d$rounds GROUP BY hop ORDER BY hop""".stripMargin
  }

  /** q231's oracle: endpoint-degree assortativity over the symmetrized
    * k-NN graph — all four sums exact BIGINTs, one IEEE division (the
    * symmetrized marginals are equal, so no sqrt), zero-variance → 0. */
  def graphAssortativitySql(cents: Seq[Array[Double]], k: Int,
                            cap: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |g AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |    FROM __gscored) WHERE rnk <= $k),
       |u AS (SELECT src, dst FROM g UNION SELECT dst AS src, src AS dst FROM g),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM u GROUP BY 1),
       |sums AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(a.deg) AS BIGINT) AS sx,
       |    CAST(sum(a.deg * a.deg) AS BIGINT) AS sxx,
       |    CAST(sum(a.deg * b.deg) AS BIGINT) AS sxy
       |  FROM u JOIN deg a ON a.src = u.src JOIN deg b ON b.src = u.dst)
       |SELECT CAST(m // 2 AS BIGINT) AS n_edges, m AS n_directed,
       |  round(CASE WHEN m * sxx - sx * sx > 0
       |    THEN CAST(m * sxy - sx * sx AS DOUBLE) /
       |         CAST(m * sxx - sx * sx AS DOUBLE)
       |    ELSE 0.0 END, 6) AS assortativity
       |FROM sums""".stripMargin

  /** q233's oracle: 2-hop ball sizes over the symmetrized k-NN graph —
    * 1-hop ∪ 2-hop endpoints, self excluded, distinct, counted; exact
    * quantile_cont on the q113 contract. */
  def graphBallSql(cents: Seq[Array[Double]], k: Int, cap: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |g AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |    FROM __gscored) WHERE rnk <= $k),
       |u AS (SELECT src, dst FROM g UNION SELECT dst AS src, src AS dst FROM g),
       |ball AS (
       |  SELECT src, count(*) AS ball FROM (
       |    SELECT DISTINCT src, dst FROM (
       |      SELECT src, dst FROM u
       |      UNION ALL
       |      SELECT e1.src, e2.dst FROM u e1 JOIN u e2 ON e2.src = e1.dst)
       |    WHERE src <> dst) GROUP BY src)
       |SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |  round(quantile_cont(CAST(ball AS DOUBLE), 0.5), 4) AS p50_ball,
       |  round(quantile_cont(CAST(ball AS DOUBLE), 0.9), 4) AS p90_ball,
       |  CAST(max(ball) AS BIGINT) AS max_ball
       |FROM ball""".stripMargin

  def knnGraphSql(cents: Seq[Array[Double]], k: Int, cap: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |ranked AS (
       |  SELECT src, dst, s,
       |    row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |  FROM __gscored)
       |SELECT src, dst, rnk, round(s, 4) AS score
       |FROM ranked WHERE rnk <= $k
       |ORDER BY src, rnk""".stripMargin

  /** q211's oracle: deterministic INTEGER-EXACT PageRank over the same
    * capped cell-blocked k-NN graph the walk queries traverse. Rank
    * mass is held in BIGINT micro-units (start 1_000_000 per node);
    * each iteration a node keeps `(1−d)` = 150_000 and receives
    * `(r·85) // (100·outdeg)` from each in-neighbor — all integer
    * division and BIGINT sums, so the replay is bit-exact on both
    * engines regardless of partitioning (the q136 kmeans idiom applied
    * to graph analytics; floating PageRank would be addition-order
    * nondeterministic). Iterations are unrolled CTE blocks. */
  def graphPagerankSql(cents: Seq[Array[Double]], k: Int, cap: Int,
                       iters: Int, topK: Int): String = {
    val iterBlocks = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"i${i - 1}"
      s"""i$i AS (
         |  SELECT n.node,
         |    CAST(150000 AS BIGINT) + CAST(coalesce(
         |      sum((r.r * 85) // (100 * d.deg)), 0) AS BIGINT) AS r
         |  FROM nodes n
         |  LEFT JOIN g ON g.dst = n.node
         |  LEFT JOIN $prev r ON r.node = g.src
         |  LEFT JOIN deg d ON d.src = g.src
         |  GROUP BY n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |g AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |    FROM __gscored) WHERE rnk <= $k),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM g GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM g),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |$iterBlocks
       |SELECT CAST(node AS BIGINT) AS node, r AS rank_u
       |FROM i$iters ORDER BY r DESC, node LIMIT $topK""".stripMargin
  }

  /** q212's oracle: [[graphPagerankSql]] personalized — initial and
    * restart mass land only on the `node % seedMod = 0` seed set; the
    * propagation arithmetic is identical. */
  def graphPprSql(cents: Seq[Array[Double]], k: Int, cap: Int,
                  iters: Int, topK: Int, seedMod: Long): String = {
    def keep(node: String) =
      s"CASE WHEN $node % $seedMod = 0 THEN CAST(150000 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    val iterBlocks = (1 to iters).map { i =>
      val prev = if (i == 1) "r0" else s"i${i - 1}"
      s"""i$i AS (
         |  SELECT n.node,
         |    ${keep("n.node")} + CAST(coalesce(
         |      sum((r.r * 85) // (100 * d.deg)), 0) AS BIGINT) AS r
         |  FROM nodes n
         |  LEFT JOIN g ON g.dst = n.node
         |  LEFT JOIN $prev r ON r.node = g.src
         |  LEFT JOIN deg d ON d.src = g.src
         |  GROUP BY n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |g AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |    FROM __gscored) WHERE rnk <= $k),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM g GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM g),
       |r0 AS (SELECT node,
       |  CASE WHEN node % $seedMod = 0 THEN CAST(1000000 AS BIGINT)
       |       ELSE CAST(0 AS BIGINT) END AS r FROM nodes),
       |$iterBlocks
       |SELECT CAST(node AS BIGINT) AS node, r AS rank_u
       |FROM i$iters ORDER BY r DESC, node LIMIT $topK""".stripMargin
  }

  /** q159's oracle: hygiene stats of the persisted k-NN graph — node and
    * edge counts, degree extremes, and reciprocity (fraction of edges
    * whose reverse edge also exists) over the SAME capped cell-blocked
    * build the walk queries traverse ([[graphBaseCtes]] + the top-k
    * rule). All exact longs + one division. */
  def knnGraphStatsSql(cents: Seq[Array[Double]], k: Int, cap: Int): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |g AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |    FROM __gscored) WHERE rnk <= $k),
       |deg AS (SELECT src, count(*) AS deg FROM g GROUP BY src),
       |rec AS (SELECT count(*) AS n_rec FROM g a
       |        WHERE EXISTS (SELECT 1 FROM g b
       |                      WHERE b.src = a.dst AND b.dst = a.src))
       |SELECT CAST((SELECT count(DISTINCT src) FROM g) AS BIGINT) AS n_nodes,
       |  CAST((SELECT count(*) FROM g) AS BIGINT) AS n_edges,
       |  CAST(rec.n_rec AS BIGINT) AS n_reciprocal,
       |  round(CAST(rec.n_rec AS DOUBLE) /
       |    CAST((SELECT count(*) FROM g) AS DOUBLE), 4) AS reciprocity,
       |  CAST((SELECT min(deg) FROM deg) AS BIGINT) AS min_deg,
       |  CAST((SELECT max(deg) FROM deg) AS BIGINT) AS max_deg
       |FROM rec""".stripMargin

  /** q97's oracle: the [[graft.operators.GraphSearch.searchBeam]] walk
    * replayed with UNROLLED hops — graph build ([[graphBaseCtes]]),
    * probe + per-cell lowest-id entry, then `hops` blocks of
    * (frontier = unseen out-edges of the beam) → (score the frontier) →
    * (beam = global top-`beamWidth`), finishing with the top-`k` of
    * everything scored. Every fold is the strict double fold and every
    * order is (score DESC, id ASC), so the replay is row-identical to
    * the engine's driver loop — including early exhaustion (an empty
    * frontier leaves every later block a no-op on both sides). */
  /** The walk's CTE chain shared by [[graphSearchSql]] and
    * [[graphInsertSql]]: `__graph` (WITH per-edge score `s` and per-src
    * `grnk` — the search form projects them away, the insert replay
    * needs them), query/probe/entry, then `hops` expand/score/beam
    * blocks ending at `__s{hops}` (everything scored). */
  private def graphWalkCtes(kGraph: Int, nprobe: Int, beamWidth: Int,
                            hops: Int, qVecId: Int): String = {
    require(hops >= 1, s"graph walk needs at least one hop, got $hops")
    val hopCtes = (1 to hops).map { i =>
      s"""__f$i AS (
         |  SELECT DISTINCT g.dst AS id FROM __graph g
         |  JOIN __b${i - 1} b ON g.src = b.id
         |  WHERE g.dst NOT IN (SELECT id FROM __s${i - 1})),
         |__s$i AS (
         |  SELECT * FROM __s${i - 1}
         |  UNION ALL
         |  SELECT a.doc_id AS id, ${dotFold("a.embedding", "q.qe")} AS s
         |  FROM __assigned a JOIN __f$i f ON a.doc_id = f.id, q),
         |__b$i AS (
         |  SELECT id FROM (
         |    SELECT id, row_number() OVER (ORDER BY s DESC, id ASC) AS rn
         |    FROM __s$i) WHERE rn <= $beamWidth)""".stripMargin
    }.mkString(",\n")
    s"""__graph AS (
       |  SELECT src, dst, s, grnk FROM (
       |    SELECT src, dst, s,
       |      row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS grnk
       |    FROM __gscored) WHERE grnk <= $kGraph),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $qVecId),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (
       |    ORDER BY list_dot_product(c.c, q.qe) DESC, c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |entry AS (
       |  SELECT min(a.doc_id) AS id FROM __assigned a
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe)
       |  GROUP BY a.cell_id),
       |__s0 AS (
       |  SELECT a.doc_id AS id, ${dotFold("a.embedding", "q.qe")} AS s
       |  FROM __assigned a JOIN entry e ON a.doc_id = e.id, q),
       |__b0 AS (
       |  SELECT id FROM (
       |    SELECT id, row_number() OVER (ORDER BY s DESC, id ASC) AS rn
       |    FROM __s0) WHERE rn <= $beamWidth),
       |$hopCtes""".stripMargin
  }

  def graphSearchSql(cents: Seq[Array[Double]], kGraph: Int, cap: Int,
                     k: Int, nprobe: Int, beamWidth: Int,
                     hops: Int, qVecId: Int = 0): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |${graphWalkCtes(kGraph, nprobe, beamWidth, hops, qVecId)}
       |SELECT CAST(rn AS BIGINT) AS rnk, id AS doc_id, round(s, 4) AS score
       |FROM (SELECT id, s, row_number() OVER (ORDER BY s DESC, id ASC) AS rn
       |      FROM __s$hops) WHERE rn <= $k
       |ORDER BY rn""".stripMargin

  /** q199's oracle: [[graft.operators.GraphSearch.removeNodes]] replayed
    * — removed set = `doc_id % mod = res`, affected = surviving sources
    * of edges into it, refill = the REBUILT per-node list on the
    * shrunken re-capped corpus (top-`kGraph` under (s DESC, dst ASC)).
    * Emits the refilled slice, the same rows the engine query emits. */
  def graphRemoveSql(cents: Seq[Array[Double]], kGraph: Int, cap: Int,
                     mod: Long, res: Long): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |__graph AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS grnk
       |    FROM __gscored) WHERE grnk <= $kGraph),
       |__r AS (SELECT doc_id FROM __assigned WHERE doc_id % $mod = $res),
       |__aff AS (
       |  SELECT DISTINCT g.src FROM __graph g
       |  JOIN __r r ON g.dst = r.doc_id
       |  WHERE g.src NOT IN (SELECT doc_id FROM __r)),
       |__scapped AS (
       |  SELECT doc_id, embedding, cell_id FROM (
       |    SELECT a.doc_id, a.embedding, a.cell_id,
       |      row_number() OVER (PARTITION BY a.cell_id
       |        ORDER BY a.doc_id) AS crn
       |    FROM __assigned a
       |    WHERE a.doc_id NOT IN (SELECT doc_id FROM __r)) WHERE crn <= $cap),
       |__refill AS (
       |  SELECT x.doc_id AS src, y.doc_id AS dst,
       |    ${dotFold("x.embedding", "y.embedding")} AS s
       |  FROM __scapped x
       |  JOIN __aff f ON x.doc_id = f.src
       |  JOIN __scapped y ON y.cell_id = x.cell_id AND y.doc_id <> x.doc_id)
       |SELECT src, dst, CAST(rnk AS BIGINT) AS rnk, round(s, 4) AS score
       |FROM (
       |  SELECT src, dst, s,
       |    row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |  FROM __refill)
       |WHERE rnk <= $kGraph
       |ORDER BY src, rnk""".stripMargin

  /** q198's oracle: [[graft.operators.GraphSearch.insert]] of ONE new
    * node replayed end-to-end — the walk ([[graphWalkCtes]], top
    * `4·kGraph` candidates), the L2-argmin cell assignment (the
    * store's own assign rule — NOT the IP probe order, which seeds the
    * walk only), the in-cell filter and forward top-`kGraph`, each
    * chosen neighbor's reverse splice re-capped under (s DESC, dst
    * ASC), and the connectivity guard (if every cap prunes the
    * newcomer, the rank-1 neighbor keeps its top `kGraph−1` plus the
    * new edge). Emits the touched slice: the new node's forward list +
    * chosen neighbors' final lists, `(src, dst, rnk, score)`.
    *
    * COVERAGE LIMIT: replays the WALK branch only. The engine's
    * unreached-cell fallback (walk finds no in-cell candidate → exact
    * in-cell scan, GraphSearch.insert step 2) has no CTE here — a
    * fixture that triggers it would silently diverge; that branch is
    * spec-covered (GraphSearchSpec), and any future query generated
    * from this oracle must either keep a walk-reachable fixture or add
    * the fallback CTE first. */
  def graphInsertSql(cents: Seq[Array[Double]], kGraph: Int, cap: Int,
                     nprobe: Int, beamWidth: Int, hops: Int,
                     qVecId: Int, newId: Long): String =
    s"""WITH ${ivfAssignCtes(cents)},
       |${graphBaseCtes(cap)},
       |${graphWalkCtes(kGraph, nprobe, beamWidth, hops, qVecId)},
       |walked AS (
       |  SELECT id, s FROM (
       |    SELECT id, s, row_number() OVER (ORDER BY s DESC, id ASC) AS rn
       |    FROM __s$hops) WHERE rn <= ${4 * kGraph}),
       |qcell AS (
       |  SELECT cell_id FROM __cents c, q
       |  ORDER BY list_sum(list_transform(list_zip(q.qe, c.c),
       |    p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |         (CAST(p[1] AS DOUBLE) - p[2]))) ASC, c.cell_id ASC
       |  LIMIT 1),
       |chosen AS (
       |  SELECT id, s, row_number() OVER (ORDER BY s DESC, id ASC) AS crnk
       |  FROM (
       |    SELECT w.id, w.s FROM walked w
       |    JOIN __assigned a ON a.doc_id = w.id
       |    WHERE a.cell_id = (SELECT cell_id FROM qcell))
       |  QUALIFY crnk <= $kGraph),
       |rev AS (
       |  SELECT src, dst, s,
       |    row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |  FROM (
       |    SELECT g.src, g.dst, g.s FROM __graph g JOIN chosen c ON g.src = c.id
       |    UNION ALL
       |    SELECT c.id AS src, CAST($newId AS BIGINT) AS dst, c.s AS s FROM chosen c)),
       |kept AS (SELECT count(*) AS n FROM rev WHERE rnk <= $kGraph AND dst = $newId),
       |ustar AS (SELECT id, s FROM chosen WHERE crnk = 1),
       |guarded AS (
       |  SELECT src, dst, s,
       |    row_number() OVER (PARTITION BY src ORDER BY s DESC, dst ASC) AS rnk
       |  FROM (
       |    SELECT g.src, g.dst, g.s FROM __graph g
       |    JOIN ustar u ON g.src = u.id WHERE g.grnk <= ${kGraph - 1}
       |    UNION ALL
       |    SELECT u.id AS src, CAST($newId AS BIGINT) AS dst, u.s AS s FROM ustar u))
       |SELECT src, dst, CAST(rnk AS BIGINT) AS rnk, round(score, 4) AS score
       |FROM (
       |  SELECT CAST($newId AS BIGINT) AS src, id AS dst,
       |    crnk AS rnk, s AS score FROM chosen
       |  UNION ALL
       |  SELECT src, dst, rnk, s AS score FROM rev
       |  WHERE rnk <= $kGraph AND ((SELECT n FROM kept) > 0
       |    OR src <> (SELECT id FROM ustar))
       |  UNION ALL
       |  SELECT src, dst, rnk, s AS score FROM guarded
       |  WHERE (SELECT n FROM kept) = 0)
       |ORDER BY src, rnk""".stripMargin

  /** q132's oracle: the batched beam walk replayed as one
    * [[graphSearchSql]] block PER query (each its own derived-table
    * `WITH`, the nlistSweepSql idiom), unioned with the query id. The
    * batch form shares reads but changes no per-query decision, so its
    * oracle is literally the single-walk oracles stacked. */
  def graphSearchBatchSql(cents: Seq[Array[Double]], kGraph: Int, cap: Int,
                          k: Int, nprobe: Int, beamWidth: Int, hops: Int,
                          qVecIds: Seq[Int]): String = {
    val blocks = qVecIds.map { qid =>
      s"""SELECT CAST($qid AS BIGINT) AS query_id, * FROM (
         |${graphSearchSql(cents, kGraph, cap, k, nprobe, beamWidth, hops, qid)}
         |)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT query_id, rnk, doc_id, score FROM (
       |$blocks
       |) ORDER BY query_id, rnk""".stripMargin
  }

  /** q157's oracle: the beam-width tuning sweep — one [[graphSearchSql]]
    * block per beam value (each its own derived-table `WITH`, the
    * q132/nlistSweep idiom), unioned with the beam as a column. The
    * sweep changes ONLY the beam rule's cutoff; every other walk
    * decision replays identically per block. */
  def graphBeamSweepSql(cents: Seq[Array[Double]], kGraph: Int, cap: Int,
                        k: Int, nprobe: Int, beams: Seq[Int],
                        hops: Int): String = {
    val blocks = beams.map { b =>
      s"""SELECT CAST($b AS BIGINT) AS beam, * FROM (
         |${graphSearchSql(cents, kGraph, cap, k, nprobe, b, hops)}
         |)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT beam, rnk, doc_id, score FROM (
       |$blocks
       |) ORDER BY beam, rnk""".stripMargin
  }

  /** q88's oracle, GENERATED from the persisted SQ8 bounds: replay
    * encode (`floor(t + 0.5)` clamped to [0,255]) and decode
    * (`float(vmin + code·step)`) per dim, then the L2 error as a strict
    * left fold of squared double deltas in dim order — the
    * `l2_distance_f32` kernel's exact accumulation. */
  def sqReconSql(vmin: Array[Double], step: Array[Double]): String = {
    val mnLit = s"[${vmin.mkString(", ")}]"
    val stLit = s"[${step.mkString(", ")}]"
    val recon = // double reconstruction for dim i (1-based SQL index)
      s"""CAST(CAST(b.mn[i+1] + (CASE WHEN b.st[i+1] = 0 THEN 0
         |            ELSE least(greatest(CAST(floor(
         |              (CAST(e.embedding[i+1] AS DOUBLE) - b.mn[i+1])
         |              / b.st[i+1] + 0.5) AS INT), 0), 255) END) * b.st[i+1]
         |          AS FLOAT) AS DOUBLE)""".stripMargin
    s"""WITH b AS (SELECT $mnLit AS mn, $stLit AS st)
       |SELECT e.vec_id AS doc_id,
       |  round(sqrt(list_reduce(list_prepend(0.0, list_transform(
       |    list_transform(range(least(len(e.embedding), ${vmin.length})),
       |      i -> CAST(e.embedding[i+1] AS DOUBLE) - $recon),
       |    d -> d * d)), (acc, t) -> acc + t)), 4) AS err
       |FROM embeddings e, b
       |ORDER BY e.vec_id""".stripMargin
  }

  /** q86's oracle, GENERATED from the persisted PCA artifact: replay the
    * projection `y_j = float(Σ_i P[j][i]·(x_i − mean_i))` for every vector
    * with the strict left-fold idiom (sequential double accumulation in
    * dim order = the Spark kernel's loop, so the FLOAT cast lands on a
    * bit-identical double), then exact top-k by inner product in the
    * projected space. */
  def pcaSearchSql(mean: Array[Double], comps: Seq[Array[Double]],
                   k: Int): String = {
    val meanLit = s"[${mean.mkString(", ")}]"
    val matLit = comps.map(c => s"[${c.mkString(", ")}]")
      .mkString("[", ",\n      ", "]")
    s"""WITH p AS (SELECT $meanLit AS mu,
       |    $matLit AS pm),
       |proj AS (
       |  SELECT e.vec_id,
       |    list_transform(range(${comps.length}), j ->
       |      CAST(list_reduce(list_prepend(0.0,
       |        list_transform(range(least(len(e.embedding), ${mean.length})),
       |          i -> p.pm[j+1][i+1] * (CAST(e.embedding[i+1] AS DOUBLE) - p.mu[i+1]))),
       |        (acc, t) -> acc + t) AS FLOAT)) AS y
       |  FROM embeddings e, p),
       |q AS (SELECT y AS qy FROM proj WHERE vec_id = 0)
       |SELECT pr.vec_id, round(${dotFold("pr.y", "q.qy")}, 4) AS score
       |FROM proj pr, q
       |WHERE pr.vec_id <> 0
       |ORDER BY ${dotFold("pr.y", "q.qy")} DESC, pr.vec_id
       |LIMIT $k""".stripMargin
  }

  /** q119's oracle: Hamming top-k under the composed PCA+ITQ transform —
    * the [[pcaSearchSql]] projection replay (strict double left fold +
    * FLOAT cast, matching the `pca_project_f32` kernel bit-for-bit),
    * then Hamming as the count of sign-disagreeing projected dims (the
    * q84 idiom — the oracle never needs to replay the bit PACKING, only
    * the sign rule `> 0` the pack encodes). */
  def itqSearchSql(mean: Array[Double], comps: Seq[Array[Double]],
                   k: Int): String = {
    val meanLit = s"[${mean.mkString(", ")}]"
    val matLit = comps.map(c => s"[${c.mkString(", ")}]")
      .mkString("[", ",\n      ", "]")
    s"""WITH p AS (SELECT $meanLit AS mu,
       |    $matLit AS pm),
       |proj AS (
       |  SELECT e.vec_id,
       |    list_transform(range(${comps.length}), j ->
       |      CAST(list_reduce(list_prepend(0.0,
       |        list_transform(range(least(len(e.embedding), ${mean.length})),
       |          i -> p.pm[j+1][i+1] * (CAST(e.embedding[i+1] AS DOUBLE) - p.mu[i+1]))),
       |        (acc, t) -> acc + t) AS FLOAT)) AS y
       |  FROM embeddings e, p),
       |q AS (SELECT y AS qy FROM proj WHERE vec_id = 0)
       |SELECT pr.vec_id,
       |  CAST(len(list_filter(range(${comps.length}),
       |    i -> (pr.y[i+1] > 0) != (q.qy[i+1] > 0))) AS BIGINT) AS hamming
       |FROM proj pr, q
       |WHERE pr.vec_id <> 0
       |ORDER BY hamming, pr.vec_id
       |LIMIT $k""".stripMargin
  }

  def semanticDedupSql(cents: Seq[Array[Double]], minCos: Double,
                       cap: Int): String = {
    val rterm = "CAST(CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT) AS DOUBLE)"
    s"""WITH RECURSIVE ${ivfAssignCtes(cents)},
       |capped AS (
       |  SELECT doc_id, embedding, cell_id FROM (
       |    SELECT a.doc_id, a.embedding, a.cell_id,
       |      row_number() OVER (PARTITION BY a.cell_id
       |        ORDER BY a.doc_id) AS crn
       |    FROM __assigned a) WHERE crn <= $cap),
       |vpairs AS (
       |  SELECT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM capped x JOIN capped y
       |    ON x.cell_id = y.cell_id AND x.doc_id < y.doc_id
       |  WHERE ${dotFold("x.embedding", "y.embedding")} >= $minCos),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM vpairs
       |  UNION SELECT id_b, id_a FROM vpairs),
       |reach(src, dst) AS (SELECT src, dst FROM edges
       |  UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |comps AS (SELECT src AS id, CAST(least(src, min(dst)) AS BIGINT) AS comp
       |  FROM reach GROUP BY src),
       |dist AS (
       |  SELECT a.doc_id AS id, sqrt(list_reduce(list_prepend(0.0,
       |      list_transform(list_zip(a.embedding, c.c),
       |        p -> $rterm * $rterm)), (acc, t) -> acc + t)) AS dist
       |  FROM __assigned a JOIN __cents c ON a.cell_id = c.cell_id),
       |rank AS (
       |  SELECT m.id, m.comp, d.dist,
       |    row_number() OVER (PARTITION BY m.comp
       |      ORDER BY d.dist DESC, m.id ASC) AS rnk
       |  FROM comps m JOIN dist d ON m.id = d.id)
       |SELECT id, comp, round(dist, 4) AS score, rnk = 1 AS kept
       |FROM rank ORDER BY id""".stripMargin
  }

  /** q77's oracle: PQ subspace assignment + ADC top-k, replayed from the
    * persisted codebooks. `books(s)(code)` = subspace centroid (dsub
    * doubles). Assignment is the [[ivfAssignCtes]] idiom per (vec,
    * subspace) — row_number over sequential squared-L2 ASC with code ASC
    * ties (= `NearestCentroidF32`'s strict-< first-wins). The ADC sum
    * folds the per-subspace lookup values in subspace order
    * (`list_sum(list(d2 ORDER BY s))`), matching the Spark side's
    * left-assoc literal-lookup add chain. */
  def pqSearchSql(books: Seq[Seq[Array[Double]]], k: Int): String =
    pqSearchSqlFrom(books, k, source = "embeddings", preCtes = "")

  /** q90's oracle: the OPQ rotation replayed as a zero-mean projection
    * CTE (the [[pcaSearchSql]] strict-fold idiom), then the ordinary PQ
    * replay over the rotated vectors — composition of the two gated
    * replays, exactly like the operator composes. */
  def opqSearchSql(rot: Seq[Array[Double]],
                   books: Seq[Seq[Array[Double]]], k: Int): String =
    pqSearchSqlFrom(books, k, source = "__rotsrc", preCtes = rotCtes(rot))

  /** The OPQ rotation as a zero-mean projection CTE pair
    * (`__rotp`/`__rotsrc`) — the [[pcaSearchSql]] strict-fold idiom,
    * FLOAT-cast per component exactly like `PcaTransform.project`.
    * Shared front for every `OPQ…,<code>` replay. */
  private def rotCtes(rot: Seq[Array[Double]]): String = {
    val d = rot.head.length
    val matLit = rot.map(c => s"[${c.mkString(", ")}]")
      .mkString("[", ",\n      ", "]")
    s"""__rotp AS (SELECT
       |    $matLit AS pm),
       |__rotsrc AS (
       |  SELECT e.vec_id,
       |    list_transform(range(${rot.length}), j ->
       |      CAST(list_reduce(list_prepend(0.0,
       |        list_transform(range(least(len(e.embedding), $d)),
       |          i -> p.pm[j+1][i+1] * (CAST(e.embedding[i+1] AS DOUBLE) - 0.0))),
       |        (acc, t) -> acc + t) AS FLOAT)) AS embedding
       |  FROM embeddings e, __rotp p),
       |""".stripMargin
  }

  /** q105's oracle: the full `OPQ…,IVF…,PQ…` factory chain — the OPQ
    * rotation front ([[rotCtes]]) feeding the complete IVFADC replay
    * ([[ivfAdcSearchSql]]) with EVERYTHING in rotated space: cell
    * assignment against rotated-space centroids, FLOAT-cast residuals,
    * per-subspace argmin codes, probed ADC. Three artifacts (rotation,
    * quantizer, codebooks) sit under the one gate. */
  def opqIvfAdcSearchSql(rot: Seq[Array[Double]],
                         cents: Seq[Array[Double]],
                         books: Seq[Seq[Array[Double]]],
                         k: Int, nprobe: Int): String =
    ivfAdcSearchSql(cents, books, k, nprobe,
      source = "__rotsrc", preCtes = rotCtes(rot))

  /** q183's oracle: PQ ADC under METRIC_INNER_PRODUCT — the q77 replay
    * with dot-product lookup terms and a DESCENDING rank. */
  def pqIpSearchSql(books: Seq[Seq[Array[Double]]], k: Int): String = {
    val dsub = books.head.head.length
    val values = (for {
      (book, s) <- books.zipWithIndex
      (c, code) <- book.zipWithIndex
    } yield s"($s, $code, [${c.mkString(", ")}])").mkString(",\n      ")
    s"""WITH __books(s, code, c) AS (VALUES
       |      $values),
       |__codes AS (
       |  SELECT doc_id, s, code FROM (
       |    SELECT e.vec_id AS doc_id, b.s, b.code,
       |      row_number() OVER (PARTITION BY e.vec_id, b.s ORDER BY
       |        list_sum(list_transform(
       |          list_zip(e.embedding[b.s*$dsub+1 : b.s*$dsub+$dsub], b.c),
       |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |        b.code ASC) AS rn
       |    FROM embeddings e CROSS JOIN __books b)
       |  WHERE rn = 1),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |lv AS (
       |  SELECT c.doc_id, c.s,
       |    list_sum(list_transform(
       |      list_zip(q.qe[c.s*$dsub+1 : c.s*$dsub+$dsub], b.c),
       |      p -> CAST(p[1] AS DOUBLE) * p[2])) AS ip
       |  FROM __codes c JOIN __books b ON b.s = c.s AND b.code = c.code, q),
       |adc AS (
       |  SELECT doc_id, list_sum(list(ip ORDER BY s)) AS adc
       |  FROM lv GROUP BY doc_id)
       |SELECT doc_id, round(t.adc, 4) AS adc FROM (
       |  SELECT doc_id, adc FROM adc
       |  ORDER BY adc DESC, doc_id ASC LIMIT $k) t
       |ORDER BY t.adc DESC, t.doc_id ASC""".stripMargin
  }

  /** q179's oracle: PQ codebook utilization — the per-subspace code
    * histogram summary (codes used of ksub, the hottest code's mass)
    * from the SAME per-subspace argmin assignment the q77/q99 replays
    * use. A subspace using few of its codes (or one code holding most
    * mass) is a collapsed codebook: retrain or raise ksub. */
  def pqUtilizationSql(books: Seq[Seq[Array[Double]]]): String = {
    val dsub = books.head.head.length
    val values = (for {
      (book, s) <- books.zipWithIndex
      (c, code) <- book.zipWithIndex
    } yield s"($s, $code, [${c.mkString(", ")}])").mkString(",\n      ")
    s"""WITH __books(s, code, c) AS (VALUES
       |      $values),
       |__codes AS (
       |  SELECT doc_id, s, code FROM (
       |    SELECT e.vec_id AS doc_id, b.s, b.code,
       |      row_number() OVER (PARTITION BY e.vec_id, b.s ORDER BY
       |        list_sum(list_transform(
       |          list_zip(e.embedding[b.s*$dsub+1 : b.s*$dsub+$dsub], b.c),
       |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |        b.code ASC) AS rn
       |    FROM embeddings e CROSS JOIN __books b)
       |  WHERE rn = 1),
       |per AS (SELECT s, code, count(*) AS n FROM __codes GROUP BY s, code),
       |tot AS (SELECT count(*) AS t FROM embeddings)
       |SELECT CAST(s AS BIGINT) AS subspace,
       |  CAST(count(*) AS BIGINT) AS n_codes_used,
       |  CAST(max(n) AS BIGINT) AS top_code_n,
       |  round(CAST(max(n) AS DOUBLE) / tot.t, 4) AS top_code_frac
       |FROM per, tot GROUP BY s, tot.t
       |ORDER BY subspace""".stripMargin
  }

  private def pqSearchSqlFrom(books: Seq[Seq[Array[Double]]], k: Int,
                              source: String, preCtes: String): String = {
    val dsub = books.head.head.length
    val values = (for {
      (book, s) <- books.zipWithIndex
      (c, code) <- book.zipWithIndex
    } yield s"($s, $code, [${c.mkString(", ")}])").mkString(",\n      ")
    s"""WITH ${preCtes}__books(s, code, c) AS (VALUES
       |      $values),
       |__codes AS (
       |  SELECT doc_id, s, code FROM (
       |    SELECT e.vec_id AS doc_id, b.s, b.code,
       |      row_number() OVER (PARTITION BY e.vec_id, b.s ORDER BY
       |        list_sum(list_transform(
       |          list_zip(e.embedding[b.s*$dsub+1 : b.s*$dsub+$dsub], b.c),
       |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |        b.code ASC) AS rn
       |    FROM $source e CROSS JOIN __books b)
       |  WHERE rn = 1),
       |q AS (SELECT embedding AS qe FROM $source WHERE vec_id = 0),
       |lv AS (
       |  SELECT c.doc_id, c.s,
       |    list_sum(list_transform(
       |      list_zip(q.qe[c.s*$dsub+1 : c.s*$dsub+$dsub], b.c),
       |      p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |           (CAST(p[1] AS DOUBLE) - p[2]))) AS d2
       |  FROM __codes c JOIN __books b ON b.s = c.s AND b.code = c.code, q),
       |adc AS (
       |  SELECT doc_id, list_sum(list(d2 ORDER BY s)) AS adc
       |  FROM lv GROUP BY doc_id)
       |SELECT doc_id, round(t.adc, 4) AS adc FROM (
       |  SELECT doc_id, adc FROM adc
       |  ORDER BY adc ASC, doc_id ASC LIMIT $k) t
       |ORDER BY t.adc ASC, t.doc_id ASC""".stripMargin
  }

  /** q99's oracle: PQ reconstruction error replayed from the persisted
    * codebooks — per-subspace code assignment (the [[pqSearchSql]]
    * idiom: row_number over sequential squared-L2 ASC, code ASC ties),
    * FLOAT-cast decode concatenated in subspace order (= the encode
    * layout's flat dim order), then the strict squared-delta left fold
    * in dim order — `l2_distance_f32`'s exact accumulation (the q88
    * posture for the SQ8 twin). */
  def pqReconSql(books: Seq[Seq[Array[Double]]]): String = {
    val dsub = books.head.head.length
    val values = (for {
      (book, s) <- books.zipWithIndex
      (c, code) <- book.zipWithIndex
    } yield s"($s, $code, [${c.mkString(", ")}])").mkString(",\n      ")
    s"""WITH __books(s, code, c) AS (VALUES
       |      $values),
       |__codes AS (
       |  SELECT doc_id, s, code FROM (
       |    SELECT e.vec_id AS doc_id, b.s, b.code,
       |      row_number() OVER (PARTITION BY e.vec_id, b.s ORDER BY
       |        list_sum(list_transform(
       |          list_zip(e.embedding[b.s*$dsub+1 : b.s*$dsub+$dsub], b.c),
       |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |        b.code ASC) AS rn
       |    FROM embeddings e CROSS JOIN __books b)
       |  WHERE rn = 1),
       |rec AS (
       |  SELECT c.doc_id,
       |    flatten(list(list_transform(b.c, v -> CAST(v AS FLOAT))
       |      ORDER BY c.s)) AS r
       |  FROM __codes c JOIN __books b ON b.s = c.s AND b.code = c.code
       |  GROUP BY c.doc_id)
       |SELECT e.vec_id AS doc_id,
       |  round(sqrt(list_reduce(list_prepend(0.0, list_transform(
       |    list_zip(e.embedding, rec.r),
       |    p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) *
       |         (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
       |    (acc, t) -> acc + t)), 4) AS err
       |FROM embeddings e JOIN rec ON rec.doc_id = e.vec_id
       |ORDER BY e.vec_id""".stripMargin
  }

  /** q120's oracle: IVFPQR — the [[ivfAdcSearchSql]] replay (assign,
    * residual, level-1 encode, ADC) extended with the SECOND quantizer:
    * decode₁ per doc, second-level residual (double-sub-float-cast ≡
    * the engine's float subtraction on exact floats), level-2 argmin
    * encode, top-`rerank` ADC candidates, then the refined re-rank
    * against `‖q − ((centroid + decode₁) + decode₂)‖²` as a strict
    * double fold with the engine's pinned addition order. */
  def ivfPqrSearchSql(cents: Seq[Array[Double]],
                      books1: Seq[Seq[Array[Double]]],
                      books2: Seq[Seq[Array[Double]]],
                      k: Int, rerank: Int, nprobe: Int): String = {
    val dsub = books1.head.head.length
    val dsub2 = books2.head.head.length
    def bookVals(books: Seq[Seq[Array[Double]]]) = (for {
      (book, s) <- books.zipWithIndex
      (c, code) <- book.zipWithIndex
    } yield s"($s, $code, [${c.mkString(", ")}])").mkString(",\n      ")
    s"""WITH ${ivfAssignCtes(cents)},
       |__books(s, code, c) AS (VALUES
       |      ${bookVals(books1)}),
       |__books2(s, code, c) AS (VALUES
       |      ${bookVals(books2)}),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (ORDER BY
       |    list_sum(list_transform(list_zip(q.qe, c.c),
       |      p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |           (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |    c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |res AS (
       |  SELECT a.doc_id, a.cell_id,
       |    list_transform(list_zip(a.embedding, c.c),
       |      p -> CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT)) AS r
       |  FROM __assigned a JOIN __cents c USING (cell_id)
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe)),
       |codes AS (
       |  SELECT doc_id, cell_id, s, code FROM (
       |    SELECT r.doc_id, r.cell_id, b.s, b.code,
       |      row_number() OVER (PARTITION BY r.doc_id, b.s ORDER BY
       |        list_sum(list_transform(
       |          list_zip(r.r[b.s*$dsub+1 : b.s*$dsub+$dsub], b.c),
       |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |        b.code ASC) AS rn
       |    FROM res r CROSS JOIN __books b) WHERE rn = 1),
       |dec1 AS (
       |  SELECT cd.doc_id, cd.cell_id,
       |    flatten(list(list_transform(b.c, v -> CAST(v AS FLOAT))
       |      ORDER BY cd.s)) AS d1
       |  FROM codes cd JOIN __books b ON b.s = cd.s AND b.code = cd.code
       |  GROUP BY cd.doc_id, cd.cell_id),
       |res2 AS (
       |  SELECT r.doc_id, r.cell_id,
       |    list_transform(list_zip(r.r, d.d1),
       |      p -> CAST(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) AS FLOAT)) AS r2
       |  FROM res r JOIN dec1 d ON r.doc_id = d.doc_id),
       |codes2 AS (
       |  SELECT doc_id, cell_id, s, code FROM (
       |    SELECT r.doc_id, r.cell_id, b.s, b.code,
       |      row_number() OVER (PARTITION BY r.doc_id, b.s ORDER BY
       |        list_sum(list_transform(
       |          list_zip(r.r2[b.s*$dsub2+1 : b.s*$dsub2+$dsub2], b.c),
       |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |        b.code ASC) AS rn
       |    FROM res2 r CROSS JOIN __books2 b) WHERE rn = 1),
       |qres AS (
       |  SELECT c.cell_id,
       |    list_transform(list_zip(q.qe, c.c),
       |      p -> CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT)) AS qr
       |  FROM __cents c, q
       |  WHERE c.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe)),
       |lv AS (
       |  SELECT cd.doc_id, cd.cell_id, cd.s,
       |    list_sum(list_transform(
       |      list_zip(qr.qr[cd.s*$dsub+1 : cd.s*$dsub+$dsub], b.c),
       |      p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |           (CAST(p[1] AS DOUBLE) - p[2]))) AS d2
       |  FROM codes cd JOIN qres qr ON cd.cell_id = qr.cell_id
       |  JOIN __books b ON b.s = cd.s AND b.code = cd.code),
       |adc AS (
       |  SELECT doc_id, cell_id, list_sum(list(d2 ORDER BY s)) AS adc
       |  FROM lv GROUP BY doc_id, cell_id),
       |cand AS (
       |  SELECT doc_id, cell_id FROM adc
       |  ORDER BY adc ASC, doc_id ASC LIMIT $rerank),
       |dec2 AS (
       |  SELECT cd.doc_id,
       |    flatten(list(list_transform(b.c, v -> CAST(v AS FLOAT))
       |      ORDER BY cd.s)) AS d2v
       |  FROM codes2 cd JOIN __books2 b ON b.s = cd.s AND b.code = cd.code
       |  WHERE cd.doc_id IN (SELECT doc_id FROM cand)
       |  GROUP BY cd.doc_id),
       |recon AS (
       |  SELECT cand.doc_id, cand.cell_id,
       |    list_transform(range(len(c.c)), j ->
       |      (c.c[j+1] + CAST(d1.d1[j+1] AS DOUBLE)) +
       |        CAST(d2.d2v[j+1] AS DOUBLE)) AS rv
       |  FROM cand JOIN __cents c USING (cell_id)
       |  JOIN dec1 d1 ON cand.doc_id = d1.doc_id
       |  JOIN dec2 d2 ON cand.doc_id = d2.doc_id),
       |rd AS (
       |  SELECT r.doc_id, r.cell_id,
       |    list_reduce(list_prepend(0.0, list_transform(range(len(r.rv)), j ->
       |      (CAST(q.qe[j+1] AS DOUBLE) - r.rv[j+1]) *
       |      (CAST(q.qe[j+1] AS DOUBLE) - r.rv[j+1]))),
       |      (acc, t) -> acc + t) AS rdist
       |  FROM recon r, q)
       |SELECT t.doc_id, CAST(t.cell_id AS BIGINT) AS cell_id,
       |  round(t.rdist, 4) AS rdist
       |FROM (SELECT doc_id, cell_id, rdist FROM rd
       |      ORDER BY rdist ASC, doc_id ASC LIMIT $k) t
       |ORDER BY t.rdist ASC, t.doc_id ASC""".stripMargin
  }

  /** q78's oracle: IVFADC replayed from BOTH persisted artifacts — cell
    * assignment via [[ivfAssignCtes]], FLOAT-cast residuals, per-subspace
    * residual code assignment, L2 cell probe, per-cell query-residual
    * LUT values folded in subspace order. Same rounding posture as
    * [[pqSearchSql]]: select on the exact adc, compare rounded(4). */
  def ivfAdcSearchSql(cents: Seq[Array[Double]],
                      books: Seq[Seq[Array[Double]]],
                      k: Int, nprobe: Int,
                      source: String = "embeddings",
                      preCtes: String = ""): String = {
    val dsub = books.head.head.length
    val bookVals = (for {
      (book, s) <- books.zipWithIndex
      (c, code) <- book.zipWithIndex
    } yield s"($s, $code, [${c.mkString(", ")}])").mkString(",\n      ")
    s"""WITH $preCtes${ivfAssignCtes(cents, source)},
       |__books(s, code, c) AS (VALUES
       |      $bookVals),
       |q AS (SELECT embedding AS qe FROM $source WHERE vec_id = 0),
       |probe AS (
       |  SELECT c.cell_id, row_number() OVER (ORDER BY
       |    list_sum(list_transform(list_zip(q.qe, c.c),
       |      p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |           (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |    c.cell_id ASC) AS pr
       |  FROM __cents c, q),
       |res AS (
       |  SELECT a.doc_id, a.cell_id,
       |    list_transform(list_zip(a.embedding, c.c),
       |      p -> CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT)) AS r
       |  FROM __assigned a JOIN __cents c USING (cell_id)
       |  WHERE a.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe)),
       |codes AS (
       |  SELECT doc_id, cell_id, s, code FROM (
       |    SELECT r.doc_id, r.cell_id, b.s, b.code,
       |      row_number() OVER (PARTITION BY r.doc_id, b.s ORDER BY
       |        list_sum(list_transform(
       |          list_zip(r.r[b.s*$dsub+1 : b.s*$dsub+$dsub], b.c),
       |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |        b.code ASC) AS rn
       |    FROM res r CROSS JOIN __books b) WHERE rn = 1),
       |qres AS (
       |  SELECT c.cell_id,
       |    list_transform(list_zip(q.qe, c.c),
       |      p -> CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT)) AS qr
       |  FROM __cents c, q
       |  WHERE c.cell_id IN (SELECT cell_id FROM probe WHERE pr <= $nprobe)),
       |lv AS (
       |  SELECT cd.doc_id, cd.cell_id, cd.s,
       |    list_sum(list_transform(
       |      list_zip(qr.qr[cd.s*$dsub+1 : cd.s*$dsub+$dsub], b.c),
       |      p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |           (CAST(p[1] AS DOUBLE) - p[2]))) AS d2
       |  FROM codes cd JOIN qres qr ON cd.cell_id = qr.cell_id
       |  JOIN __books b ON b.s = cd.s AND b.code = cd.code),
       |adc AS (
       |  SELECT doc_id, cell_id, list_sum(list(d2 ORDER BY s)) AS adc
       |  FROM lv GROUP BY doc_id, cell_id)
       |SELECT t.doc_id, CAST(t.cell_id AS BIGINT) AS cell_id,
       |  round(t.adc, 4) AS adc
       |FROM (SELECT doc_id, cell_id, adc FROM adc
       |      ORDER BY adc ASC, doc_id ASC LIMIT $k) t
       |ORDER BY t.adc ASC, t.doc_id ASC""".stripMargin
  }

  /** q109's oracle: BATCHED IVFADC — the [[ivfAdcSearchSql]] replay with
    * the first `nq` vectors as queries: per-query L2 centroid probe,
    * residuals/codes over the UNION of probed cells, per-(query, cell)
    * query residuals, subspace terms folded in s order, per-query rank
    * (adc ASC, doc_id ties). */
  def ivfAdcBatchSearchSql(cents: Seq[Array[Double]],
                           books: Seq[Seq[Array[Double]]],
                           k: Int, nprobe: Int, nq: Int): String = {
    val dsub = books.head.head.length
    val bookVals = (for {
      (book, s) <- books.zipWithIndex
      (c, code) <- book.zipWithIndex
    } yield s"($s, $code, [${c.mkString(", ")}])").mkString(",\n      ")
    s"""WITH ${ivfAssignCtes(cents)},
       |__books(s, code, c) AS (VALUES
       |      $bookVals),
       |qs AS (SELECT vec_id AS query_id, embedding AS qe
       |       FROM embeddings WHERE vec_id < $nq),
       |probe AS (
       |  SELECT q.query_id, c.cell_id, row_number() OVER (
       |    PARTITION BY q.query_id ORDER BY
       |    list_sum(list_transform(list_zip(q.qe, c.c),
       |      p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |           (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |    c.cell_id ASC) AS pr
       |  FROM __cents c CROSS JOIN qs q),
       |res AS (
       |  SELECT a.doc_id, a.cell_id,
       |    list_transform(list_zip(a.embedding, c.c),
       |      p -> CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT)) AS r
       |  FROM __assigned a JOIN __cents c USING (cell_id)
       |  WHERE a.cell_id IN (SELECT DISTINCT cell_id FROM probe
       |                      WHERE pr <= $nprobe)),
       |codes AS (
       |  SELECT doc_id, cell_id, s, code FROM (
       |    SELECT r.doc_id, r.cell_id, b.s, b.code,
       |      row_number() OVER (PARTITION BY r.doc_id, b.s ORDER BY
       |        list_sum(list_transform(
       |          list_zip(r.r[b.s*$dsub+1 : b.s*$dsub+$dsub], b.c),
       |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |        b.code ASC) AS rn
       |    FROM res r CROSS JOIN __books b) WHERE rn = 1),
       |qres AS (
       |  SELECT p.query_id, c.cell_id,
       |    list_transform(list_zip(q.qe, c.c),
       |      p2 -> CAST(CAST(p2[1] AS DOUBLE) - p2[2] AS FLOAT)) AS qr
       |  FROM probe p JOIN __cents c ON c.cell_id = p.cell_id
       |  JOIN qs q ON q.query_id = p.query_id
       |  WHERE p.pr <= $nprobe),
       |lv AS (
       |  SELECT qr.query_id, cd.doc_id, cd.s,
       |    list_sum(list_transform(
       |      list_zip(qr.qr[cd.s*$dsub+1 : cd.s*$dsub+$dsub], b.c),
       |      p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |           (CAST(p[1] AS DOUBLE) - p[2]))) AS d2
       |  FROM codes cd JOIN qres qr ON cd.cell_id = qr.cell_id
       |  JOIN __books b ON b.s = cd.s AND b.code = cd.code),
       |adc AS (
       |  SELECT query_id, doc_id, list_sum(list(d2 ORDER BY s)) AS adc
       |  FROM lv GROUP BY query_id, doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, adc, row_number() OVER (
       |    PARTITION BY query_id ORDER BY adc ASC, doc_id ASC) AS doc_rank
       |  FROM adc)
       |SELECT query_id, doc_id, round(adc, 4) AS adc,
       |  CAST(doc_rank AS BIGINT) AS doc_rank
       |FROM ranked WHERE doc_rank <= $k
       |ORDER BY query_id, doc_rank""".stripMargin
  }

  /** q114's oracle: residual-quantizer search replayed from the
    * persisted per-level codebooks — the greedy encode chain (level-l
    * argmin by squared L2, code ties ASC; FLOAT-cast residual feeds
    * level l+1) and the reconstructed-dot score (per-level strict
    * double fold of q · cent, summed in level order — the `adc_lut`
    * accumulation). Order on the UNROUNDED score (q85 posture). */
  /** The greedy RQ encode chain as CTEs (`__rl<l>` codebook VALUES,
    * `__a<l>` per-level argmin, `__r<l>` FLOAT-cast residual) — shared
    * by [[rqSearchSql]] and [[rqReconSql]]. */
  private def rqChainCtes(levels: Seq[Seq[Array[Double]]]): String = {
    val lvlVals = levels.zipWithIndex.map { case (cents, l) =>
      val values = cents.zipWithIndex
        .map { case (c, code) => s"($code, [${c.mkString(", ")}])" }
        .mkString(",\n      ")
      s"__rl$l(code, c) AS (VALUES\n      $values)"
    }.mkString(",\n")
    val chain = levels.indices.map { l =>
      val src = if (l == 0) "embeddings" else s"__r${l - 1}"
      val vcol = if (l == 0) "embedding" else "r"
      s"""__a$l AS (
         |  SELECT vec_id, $vcol, code FROM (
         |    SELECT e.vec_id, e.$vcol, t.code,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        list_sum(list_transform(list_zip(e.$vcol, t.c),
         |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
         |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
         |        t.code ASC) AS rn
         |    FROM $src e CROSS JOIN __rl$l t) WHERE rn = 1),
         |__r$l AS (
         |  SELECT a.vec_id,
         |    list_transform(list_zip(a.$vcol, t.c),
         |      p -> CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT)) AS r
         |  FROM __a$l a JOIN __rl$l t ON t.code = a.code)""".stripMargin
    }.mkString(",\n")
    s"$lvlVals,\n$chain"
  }

  def rqSearchSql(levels: Seq[Seq[Array[Double]]], k: Int): String = {
    val termSelects = levels.indices.map { l =>
      s"""  SELECT a.vec_id, $l AS lvl, ${dotFold("q.qe", "t.c")} AS term
         |  FROM __a$l a JOIN __rl$l t ON t.code = a.code, q""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH ${rqChainCtes(levels)},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |lv AS (
       |$termSelects),
       |sc AS (
       |  SELECT vec_id, list_sum(list(term ORDER BY lvl)) AS s
       |  FROM lv GROUP BY vec_id)
       |SELECT t.vec_id AS doc_id, round(t.s, 4) AS score FROM (
       |  SELECT vec_id, s FROM sc ORDER BY s DESC, vec_id ASC LIMIT $k) t
       |ORDER BY t.s DESC, t.vec_id ASC""".stripMargin
  }

  /** q117's oracle: RQ reconstruction error — the [[rqChainCtes]] encode
    * replay, additive decode per dim (strict left fold over the chosen
    * centroids in LEVEL order, FLOAT cast at the end — the engine's
    * `decode` arithmetic), then the `l2_distance_f32` squared-delta fold
    * in dim order (the q88/q99 posture). */
  def rqReconSql(levels: Seq[Seq[Array[Double]]]): String = {
    val d = levels.head.head.length
    val lvSelects = levels.indices.map { l =>
      s"""  SELECT a.vec_id, $l AS lvl, t.c AS cv
         |  FROM __a$l a JOIN __rl$l t ON t.code = a.code""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH ${rqChainCtes(levels)},
       |lv AS (
       |$lvSelects),
       |cvs AS (
       |  SELECT vec_id, list(cv ORDER BY lvl) AS cs FROM lv GROUP BY vec_id),
       |dec AS (
       |  SELECT vec_id, list_transform(range($d), j ->
       |    CAST(list_reduce(list_prepend(0.0,
       |      list_transform(cs, c -> c[j+1])), (acc, t) -> acc + t) AS FLOAT)) AS rec
       |  FROM cvs)
       |SELECT e.vec_id AS doc_id,
       |  round(sqrt(list_reduce(list_prepend(0.0, list_transform(
       |    list_zip(e.embedding, d.rec),
       |    p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) *
       |         (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
       |    (acc, t) -> acc + t)), 4) AS err
       |FROM embeddings e JOIN dec d ON d.vec_id = e.vec_id
       |ORDER BY e.vec_id""".stripMargin
  }

  /** q104's oracle: `search_and_reconstruct` — the full [[ivfAdcSearchSql]]
    * replay proposes the top-k hits (nested derived table, the q80
    * idiom), then each hit's codes are re-derived (FLOAT-cast residual
    * vs its assigned centroid, per-subspace argmin — sequential squared-L2
    * ASC, code ASC ties) and decoded: recon component =
    * `round(CAST(book AS FLOAT) + centroid, 4)`, the engine's exact
    * decode arithmetic. The second replay touches only the k hit docs. */
  def ivfAdcReconSql(cents: Seq[Array[Double]],
                     books: Seq[Seq[Array[Double]]],
                     k: Int, nprobe: Int): String = {
    val dsub = books.head.head.length
    val inner = ivfAdcSearchSql(cents, books, k, nprobe)
    val centVals = cents.zipWithIndex
      .map { case (c, i) => s"($i, [${c.mkString(", ")}])" }
      .mkString(",\n      ")
    val bookVals = (for {
      (book, s) <- books.zipWithIndex
      (c, code) <- book.zipWithIndex
    } yield s"($s, $code, [${c.mkString(", ")}])").mkString(",\n      ")
    s"""WITH hits AS (SELECT * FROM (
       |$inner
       |) __h),
       |__rcents(cell_id, c) AS (VALUES
       |      $centVals),
       |__rbooks(s, code, c) AS (VALUES
       |      $bookVals),
       |res AS (
       |  SELECT h.doc_id, h.cell_id,
       |    list_transform(list_zip(e.embedding, c.c),
       |      p -> CAST(CAST(p[1] AS DOUBLE) - p[2] AS FLOAT)) AS r
       |  FROM hits h JOIN embeddings e ON e.vec_id = h.doc_id
       |  JOIN __rcents c ON c.cell_id = h.cell_id),
       |codes AS (
       |  SELECT doc_id, s, code FROM (
       |    SELECT r.doc_id, b.s, b.code,
       |      row_number() OVER (PARTITION BY r.doc_id, b.s ORDER BY
       |        list_sum(list_transform(
       |          list_zip(r.r[b.s*$dsub+1 : b.s*$dsub+$dsub], b.c),
       |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
       |               (CAST(p[1] AS DOUBLE) - p[2]))) ASC,
       |        b.code ASC) AS rn
       |    FROM res r CROSS JOIN __rbooks b) WHERE rn = 1),
       |dec AS (
       |  SELECT c.doc_id,
       |    flatten(list(list_transform(b.c, v -> CAST(v AS FLOAT))
       |      ORDER BY c.s)) AS dr
       |  FROM codes c JOIN __rbooks b ON b.s = c.s AND b.code = c.code
       |  GROUP BY c.doc_id)
       |SELECT h.doc_id, h.cell_id, h.adc, CAST(j.range AS BIGINT) AS j,
       |  round(CAST(d.dr[j.range + 1] AS DOUBLE) + c.c[j.range + 1], 4) AS val
       |FROM hits h JOIN dec d ON d.doc_id = h.doc_id
       |JOIN __rcents c ON c.cell_id = h.cell_id, range(${books.length * dsub}) j
       |ORDER BY h.adc ASC, h.doc_id ASC, j""".stripMargin
  }

  /** q80's oracle: refined search — the [[ivfAdcSearchSql]] replay (as a
    * nested-WITH derived table) proposes the top-`rerank` candidates,
    * then the exact inner product re-ranks just those ids with the strict
    * double fold ([[dotFold]]). Candidate selection orders on the exact
    * replayed adc (ties doc_id ASC) exactly as the Spark side's
    * TakeOrdered; the final score compares rounded(4). */
  def refineSearchSql(cents: Seq[Array[Double]],
                      books: Seq[Seq[Array[Double]]],
                      k: Int, rerank: Int, nprobe: Int): String = {
    val inner = ivfAdcSearchSql(cents, books, rerank, nprobe)
    s"""WITH cand AS (SELECT doc_id FROM (
       |$inner
       |) __ivfadc),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT t.doc_id, round(t.score, 4) AS score FROM (
       |  SELECT e.vec_id AS doc_id,
       |    ${dotFold("e.embedding", "q.qe")} AS score
       |  FROM embeddings e JOIN cand ON cand.doc_id = e.vec_id, q
       |  ORDER BY score DESC, e.vec_id ASC LIMIT $k) t
       |ORDER BY t.score DESC, t.doc_id ASC""".stripMargin
  }

  /** Oracle for the full-mode pipeline's event log (`FullMode.fullQuery`
    * with the deterministic LLM fakes of `SparkEntry.q39FullEvents`): the
    * retrieval side (embed → top-10 → descending threshold grid) is
    * replicated from first principles; the sweep/improvement/stream event
    * counts and value sums follow from the fakes' closed forms — response
    * length = (100·t mod 80) + 3·final_hits, score = min(len, 200)/200,
    * +7 chars per improvement iteration until score 1.0, 32-byte stream
    * chunks. `qVals` are the `(id, txt)` literal query rows (negative ids). */
  def fullEventsSql(qVals: String, temps: Seq[Double], dim: Int = 64,
                    topK: Int = 10, hitTarget: Int = 3, stepMilli: Int = 50,
                    baseMod: Int = 80, perDoc: Int = 3, divisor: Int = 200,
                    improveStep: Int = 7, maxIter: Int = 50,
                    chunkSize: Int = 32): String = {
    val nSteps = 1000 / stepMilli // grid 1.000 … 0.000 inclusive
    val tempVals = temps.zipWithIndex
      .map { case (t, i) => s"(${i + 1}, ${math.round(t * 100)})" }.mkString(", ")
    s"""WITH __docs AS (
       |  SELECT doc_id AS id, text AS txt FROM documents
       |  UNION ALL
       |  SELECT * FROM (VALUES $qVals) v(id, txt)),
       |${embedCtes(dim)},
       |q AS (SELECT -id - 1 AS query_id, embedding AS qe FROM __emb WHERE id < 0),
       |d AS (SELECT id AS doc_id, embedding FROM __emb WHERE id >= 0),
       |topk AS (
       |  SELECT query_id, score FROM (
       |    SELECT q.query_id, list_dot_product(d.embedding, q.qe) AS score,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY list_dot_product(d.embedding, q.qe) DESC, d.doc_id ASC) AS rnk
       |    FROM d CROSS JOIN q)
       |  WHERE rnk <= $topK),
       |grid AS (
       |  SELECT CAST(1000 - $stepMilli * t.gs AS BIGINT) AS t_milli,
       |         t.gs + 1 AS attempt
       |  FROM generate_series(0, $nSteps) t(gs)),
       |counts AS (
       |  SELECT qg.query_id, qg.t_milli, qg.attempt, count(h.score) AS hits
       |  FROM (SELECT query_id, t_milli, attempt
       |        FROM (SELECT DISTINCT query_id FROM q) CROSS JOIN grid) qg
       |  LEFT JOIN topk h ON h.query_id = qg.query_id
       |                  AND h.score >= qg.t_milli / 1000.0
       |  GROUP BY 1, 2, 3),
       |st AS (
       |  SELECT query_id,
       |    min(CASE WHEN hits >= $hitTarget THEN attempt END) AS ra,
       |    max(hits) AS max_hits
       |  FROM counts GROUP BY 1),
       |st2 AS (
       |  SELECT s.query_id,
       |    coalesce(s.ra, ${nSteps + 1}) AS attempts,
       |    CASE WHEN s.ra IS NOT NULL THEN 1000 - $stepMilli * (s.ra - 1)
       |         ELSE (SELECT max(c.t_milli) FROM counts c
       |               WHERE c.query_id = s.query_id AND c.hits = s.max_hits)
       |    END AS final_milli,
       |    CASE WHEN s.ra IS NOT NULL THEN
       |           (SELECT c.hits FROM counts c
       |            WHERE c.query_id = s.query_id AND c.attempt = s.ra)
       |         ELSE s.max_hits END AS f
       |  FROM st s),
       |thr AS (
       |  SELECT c.query_id, count(*) AS n, sum(c.t_milli) AS sv
       |  FROM counts c JOIN st2 ON c.query_id = st2.query_id
       |                        AND c.attempt <= st2.attempts
       |  GROUP BY 1),
       |temps(tno, t100) AS (VALUES $tempVals),
       |tl AS (
       |  SELECT s.query_id, t.tno, t.t100,
       |         (t.t100 % $baseMod) + $perDoc * s.f AS len
       |  FROM st2 s CROSS JOIN temps t),
       |tb AS (
       |  SELECT query_id, len AS len0 FROM (
       |    SELECT query_id, len, row_number() OVER (PARTITION BY query_id
       |      ORDER BY least(len, $divisor) DESC, tno ASC) AS r FROM tl)
       |  WHERE r = 1),
       |imp AS (
       |  SELECT query_id, len0,
       |    CASE WHEN len0 >= $divisor THEN 0
       |         ELSE least($maxIter,
       |                CAST(ceil(($divisor - len0) / $improveStep.0) AS INT)) END AS n_iter
       |  FROM tb),
       |iters AS (
       |  SELECT i.query_id, g.it, i.len0 + $improveStep * g.it AS len
       |  FROM imp i CROSS JOIN generate_series(1, $maxIter) g(it)
       |  WHERE g.it <= i.n_iter),
       |fin AS (SELECT query_id, len0 + $improveStep * n_iter AS L FROM imp),
       |ev AS (
       |  SELECT query_id, 'retrieval_start' AS event_type, 1 AS n,
       |         $hitTarget AS sv FROM st2
       |  UNION ALL SELECT query_id, 'threshold_attempt', n, sv FROM thr
       |  UNION ALL SELECT query_id, 'retrieval_complete', 1, final_milli FROM st2
       |  UNION ALL SELECT query_id, 'temperature_test', count(*), sum(t100)
       |    FROM tl GROUP BY 1
       |  UNION ALL SELECT query_id, 'temperature_response', count(*), sum(len)
       |    FROM tl GROUP BY 1
       |  UNION ALL SELECT query_id, 'temperature_evaluation', count(*),
       |      sum(round((least(len, $divisor) / $divisor.0) * 1000))
       |    FROM tl GROUP BY 1
       |  UNION ALL SELECT query_id, 'improvement_iteration', 2 * count(*),
       |      2 * sum(it) FROM iters GROUP BY 1
       |  UNION ALL SELECT query_id, 'improvement_response', count(*), sum(len)
       |    FROM iters GROUP BY 1
       |  UNION ALL SELECT query_id, 'improvement_evaluation', count(*),
       |      sum(round((least(len, $divisor) / $divisor.0) * 1000))
       |    FROM iters GROUP BY 1
       |  UNION ALL SELECT query_id, 'llm_stream_start', 1, 0 FROM st2
       |  UNION ALL SELECT query_id, 'llm_stream_chunk',
       |      CAST(ceil(L / $chunkSize.0) AS BIGINT), L FROM fin
       |  UNION ALL SELECT query_id, 'llm_stream_complete', 1, L FROM fin)
       |SELECT CAST(query_id AS BIGINT) AS query_id, event_type,
       |  CAST(n AS BIGINT) AS n, CAST(sv AS BIGINT) AS sum_value
       |FROM ev ORDER BY query_id, event_type""".stripMargin
  }

  /** CTE chain replicating the conversational chunker
    * (`Chunker.chunkConversational`) over per-source K:/V: dialogs whose
    * turns are the `documents` rows sorted by doc_id, each prefixed
    * `"K: "`/`"V: "` (alternating) and newline-joined
    * (`SparkEntry.q40ConvChunks`'s fixture shape — every turn is one line
    * of `3 + len(text)` chars, texts are pre-trimmed and under the max).
    *
    * Same greedy recursive packing as the regular dialect but with the
    * `"\n"` joiner (separator cost 1) and a 1-TURN overlap: each chunk
    * after the first is prefixed with the previous chunk's final turn,
    * so its size grows by that turn's length + 1. Produces
    * `__chunks(filename, chunk_index, size, start_line, end_line)`. */
  def conversationalChunkCtes(maxChars: Int = 2000, minChars: Int = 500): String =
    s"""__blocks AS (
       |  SELECT source,
       |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS i,
       |    length(trim(text)) + 3 AS len,
       |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS line
       |  FROM documents WHERE trim(text) <> ''),
       |__rec AS (
       |  SELECT source, i, 1 AS chunk_no, len AS cur_len,
       |         line AS start_line, line AS end_line
       |  FROM __blocks WHERE i = 1
       |  UNION ALL
       |  SELECT b.source, b.i,
       |    CASE WHEN r.cur_len + 1 + b.len > $maxChars AND r.cur_len >= $minChars
       |         THEN r.chunk_no + 1 ELSE r.chunk_no END,
       |    CASE WHEN r.cur_len + 1 + b.len > $maxChars AND r.cur_len >= $minChars
       |         THEN b.len ELSE r.cur_len + 1 + b.len END,
       |    CASE WHEN r.cur_len + 1 + b.len > $maxChars AND r.cur_len >= $minChars
       |         THEN b.line ELSE r.start_line END,
       |    b.line
       |  FROM __rec r JOIN __blocks b ON b.source = r.source AND b.i = r.i + 1),
       |__packed AS (
       |  SELECT r.source, r.chunk_no, r.cur_len AS len, r.start_line,
       |         r.end_line, lst.last_i
       |  FROM __rec r
       |  JOIN (SELECT source, chunk_no, max(i) AS last_i
       |        FROM __rec GROUP BY 1, 2) lst
       |    ON r.source = lst.source AND r.chunk_no = lst.chunk_no
       |   AND r.i = lst.last_i),
       |__tailinfo AS (
       |  SELECT p.source, s.nc, p.len AS tail_len, p.end_line AS tail_end,
       |         p.last_i AS tail_last_i
       |  FROM __packed p
       |  JOIN (SELECT source, max(chunk_no) AS nc FROM __packed GROUP BY 1) s
       |    ON p.source = s.source AND p.chunk_no = s.nc),
       |__merged AS (
       |  SELECT p.source, p.chunk_no,
       |    CASE WHEN t.nc > 1 AND t.tail_len < $minChars AND p.chunk_no = t.nc - 1
       |         THEN p.len + 1 + t.tail_len ELSE p.len END AS len,
       |    p.start_line,
       |    CASE WHEN t.nc > 1 AND t.tail_len < $minChars AND p.chunk_no = t.nc - 1
       |         THEN t.tail_end ELSE p.end_line END AS end_line,
       |    CASE WHEN t.nc > 1 AND t.tail_len < $minChars AND p.chunk_no = t.nc - 1
       |         THEN t.tail_last_i ELSE p.last_i END AS last_i
       |  FROM __packed p JOIN __tailinfo t ON p.source = t.source
       |  WHERE NOT (t.nc > 1 AND t.tail_len < $minChars AND p.chunk_no = t.nc)),
       |__withprev AS (
       |  SELECT *, lag(last_i) OVER (PARTITION BY source ORDER BY chunk_no)
       |    AS prev_last_i
       |  FROM __merged),
       |__chunks AS (
       |  SELECT w.source AS filename, w.chunk_no - 1 AS chunk_index,
       |    w.len + CASE WHEN w.prev_last_i IS NULL THEN 0
       |            ELSE pb.len + 1 END AS size,
       |    w.start_line, w.end_line
       |  FROM __withprev w
       |  LEFT JOIN __blocks pb ON pb.source = w.source AND pb.i = w.prev_last_i)""".stripMargin

  /** Hyperplane-LSH ANN oracle (`HyperplaneLsh.search`): ±1 planes inlined
    * as FLOAT[] literals (like IVF centroids), bucket = signed-projection
    * bits, multi-probe = own bucket + Hamming-1 neighbors, rank by
    * (dot DESC, id ASC) within probed buckets. Bucket sign, ranking and
    * the near-dup cosine threshold all use the strict double fold
    * ([[dotFold]]) — the engine's `dot_f32` accumulation — so a
    * float32-accumulated near-tie can never flip a bucket bit, a rank,
    * or a threshold row vs the engine. */
  /** Shared LSH-bucket CTEs: ±1 planes as FLOAT[] literals + per-vector
    * bucket ids. Produces `planes(j, p)` and `b(vec_id, bucket)`. */
  def lshBucketCtes(planes: Seq[Array[Float]]): String = {
    val values = planes.zipWithIndex.map { case (p, j) =>
      s"($j, CAST([${p.map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")}] AS FLOAT[]))"
    }.mkString(",\n      ")
    s"""planes(j, p) AS (VALUES
       |      $values),
       |b AS (
       |  SELECT e.vec_id, CAST(sum(CASE WHEN ${dotFold("e.embedding", "p.p")} > 0
       |                        THEN 1 << CAST(p.j AS INT) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id)""".stripMargin
  }

  def lshSearchSql(planes: Seq[Array[Float]], k: Int, nq: Int): String = {
    val nbits = planes.length
    s"""WITH ${lshBucketCtes(planes)},
       |q AS (
       |  SELECT e.vec_id AS query_id, e.embedding AS qe, b.bucket
       |  FROM embeddings e JOIN b ON b.vec_id = e.vec_id WHERE e.vec_id < $nq),
       |probes AS (
       |  SELECT query_id, qe,
       |    xor(bucket, CASE WHEN f.j < 0 THEN 0 ELSE 1 << CAST(f.j AS INT) END) AS pb
       |  FROM q CROSS JOIN (SELECT unnest(range(-1, $nbits)) AS j) f),
       |cand AS (
       |  SELECT p.query_id, p.qe, e.vec_id, e.embedding
       |  FROM probes p JOIN b ON b.bucket = p.pb
       |  JOIN embeddings e ON e.vec_id = b.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id,
       |    round(${dotFold("embedding", "qe")}, 4) AS score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY ${dotFold("embedding", "qe")} DESC, vec_id ASC) AS rank
       |  FROM cand)
       |SELECT query_id, vec_id, score, CAST(rank AS BIGINT) AS rank
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Label-free embedding near-dup oracle (`Dedup.embeddingNearDups`
    * blocked by LSH bucket): same-bucket pairs above the cosine floor. */
  def lshNearDupSql(planes: Seq[Array[Float]], minCos: Double): String =
    s"""WITH ${lshBucketCtes(planes)}
       |SELECT x.bucket AS block, x.vec_id AS id_a, y.vec_id AS id_b,
       |  round(${dotFold("ea.embedding", "eb.embedding")}, 4) AS cos
       |FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |JOIN embeddings ea ON ea.vec_id = x.vec_id
       |JOIN embeddings eb ON eb.vec_id = y.vec_id
       |WHERE ${dotFold("ea.embedding", "eb.embedding")} >= $minCos
       |ORDER BY block, id_a, id_b""".stripMargin

  /** Full q38 oracle: the S2→P1→E1 docx pipeline in SQL. The docx
    * fixtures are themselves synthesized from `documents` rows with
    * `doc_id < 6` (heading "Doc N" + 120-char paragraph slices), and the
    * XML-escape → parse round trip is the identity, so the oracle can
    * rebuild the exact Markdown each fixture converts to, re-run the
    * greedy chunker WITH text reconstruction (chunk body = blocks joined
    * by blank lines, tail merge, 100-char overlap prefix), and embed each
    * chunk via [[embedCtes]] — making the one remaining binary-ingest
    * query hash-checked instead of rows-only.
    *
    * Text reconstruction stays non-recursive: the recursive CTE carries
    * only running lengths (the greedy boundary decision needs nothing
    * else); chunk bodies are then a `string_agg` over each chunk's block
    * range, so the string work is one ordered aggregation per chunk. */
  def docxPipelineSql(dim: Int = 64, maxChars: Int = 2000, minChars: Int = 500,
                      overlap: Int = 100): String = {
    val docId = chunkDocId("filename", "chunk_index")
    s"""WITH RECURSIVE __files AS (
       |  SELECT doc_id, 'doc_' || CAST(doc_id AS VARCHAR) || '.docx' AS source, text
       |  FROM documents WHERE doc_id < 6),
       |__slices AS (
       |  -- bound 10000 slices = 1.2M chars/doc, far beyond any documents
       |  -- row (the WHERE prunes unused indexes; a doc longer than the
       |  -- bound would silently truncate, so keep it generous)
       |  SELECT source, s.i AS ord,
       |    trim(substr(text, CAST((s.i - 1) * 120 + 1 AS INT), 120)) AS txt
       |  FROM __files, (SELECT unnest(range(1, 10000)) AS i) AS s
       |  WHERE (s.i - 1) * 120 < length(text)),
       |__blockraw AS (
       |  SELECT source, 0 AS ord, '# Doc ' || CAST(doc_id AS VARCHAR) AS txt FROM __files
       |  UNION ALL
       |  SELECT source, CAST(ord AS INT), txt FROM __slices WHERE txt <> ''),
       |__blocks AS (
       |  SELECT source, row_number() OVER (PARTITION BY source ORDER BY ord) AS i,
       |    length(txt) AS len, txt
       |  FROM __blockraw),
       |__rec AS (
       |  SELECT source, i, 1 AS chunk_no, len AS cur_len FROM __blocks WHERE i = 1
       |  UNION ALL
       |  SELECT b.source, b.i,
       |    CASE WHEN r.cur_len + 2 + b.len > $maxChars AND r.cur_len >= $minChars
       |         THEN r.chunk_no + 1 ELSE r.chunk_no END,
       |    CASE WHEN r.cur_len + 2 + b.len > $maxChars AND r.cur_len >= $minChars
       |         THEN b.len ELSE r.cur_len + 2 + b.len END
       |  FROM __rec r JOIN __blocks b ON b.source = r.source AND b.i = r.i + 1),
       |__ranges AS (
       |  SELECT source, chunk_no, min(i) AS first_i, max(i) AS last_i
       |  FROM __rec GROUP BY 1, 2),
       |__packedtxt AS (
       |  SELECT g.source, g.chunk_no,
       |    string_agg(b.txt, chr(10) || chr(10) ORDER BY b.i) AS body
       |  FROM __ranges g JOIN __blocks b
       |    ON b.source = g.source AND b.i BETWEEN g.first_i AND g.last_i
       |  GROUP BY 1, 2),
       |__nc AS (SELECT source, max(chunk_no) AS nc FROM __packedtxt GROUP BY 1),
       |__mergedtxt AS (
       |  SELECT p.source, p.chunk_no,
       |    CASE WHEN t.nc > 1 AND length(tl.body) < $minChars AND p.chunk_no = t.nc - 1
       |         THEN p.body || chr(10) || chr(10) || tl.body ELSE p.body END AS body
       |  FROM __packedtxt p
       |  JOIN __nc t ON t.source = p.source
       |  LEFT JOIN __packedtxt tl ON tl.source = p.source AND tl.chunk_no = t.nc
       |  WHERE NOT (t.nc > 1 AND length(tl.body) < $minChars AND p.chunk_no = t.nc)),
       |__chunktext AS (
       |  SELECT source AS filename, chunk_no - 1 AS chunk_index,
       |    CASE WHEN chunk_no = 1 THEN body
       |         ELSE right(lag_body, $overlap) || chr(10) || body END AS ctext
       |  FROM (SELECT *, lag(body) OVER (PARTITION BY source ORDER BY chunk_no) AS lag_body
       |        FROM __mergedtxt)),
       |__docs AS (
       |  SELECT $docId AS id, ctext AS txt FROM __chunktext),
       |${embedCtes(dim)}
       |SELECT $docId AS doc_id, filename,
       |  CAST(chunk_index AS BIGINT) AS chunk_index,
       |  CAST(length(ctext) AS BIGINT) AS size,
       |  round(sqrt(list_sum(list_transform(e.embedding, x -> x * x))), 4) AS norm
       |FROM __chunktext c JOIN __emb e ON e.id = $docId
       |ORDER BY filename, chunk_index""".stripMargin
  }

  /** CTE chain replicating the regular chunker (`Chunker.chunkRegular`) over
    * per-source files whose paragraph blocks are the `documents` rows sorted
    * by doc_id and joined with blank lines (`SparkEntry.q22CorpusBuild`'s
    * input shape — every document text is newline-free and under
    * `MaxChunkChars`, so `splitOversized` is the identity and a block's line
    * span is a single line).
    *
    * The greedy packing loop (`Chunker.packBlocks`) is a recursive CTE
    * stepping block-by-block per source (depth = blocks per file); the tail
    * merge and the 100-char overlap's size contribution are closed-form
    * post-passes. Produces
    * `__chunks(filename, chunk_index, size, start_line, end_line)`. */
  def regularChunkCtes(maxChars: Int = 2000, minChars: Int = 500,
                       overlap: Int = 100): String =
    s"""__blocks AS (
       |  SELECT source,
       |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS i,
       |    length(trim(text)) AS len,
       |    2 * row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS line
       |  FROM documents WHERE trim(text) <> ''),
       |__rec AS (
       |  SELECT source, i, 1 AS chunk_no, len AS cur_len,
       |         line AS start_line, line AS end_line
       |  FROM __blocks WHERE i = 1
       |  UNION ALL
       |  SELECT b.source, b.i,
       |    CASE WHEN r.cur_len + 2 + b.len > $maxChars AND r.cur_len >= $minChars
       |         THEN r.chunk_no + 1 ELSE r.chunk_no END,
       |    CASE WHEN r.cur_len + 2 + b.len > $maxChars AND r.cur_len >= $minChars
       |         THEN b.len ELSE r.cur_len + 2 + b.len END,
       |    CASE WHEN r.cur_len + 2 + b.len > $maxChars AND r.cur_len >= $minChars
       |         THEN b.line ELSE r.start_line END,
       |    b.line
       |  FROM __rec r JOIN __blocks b ON b.source = r.source AND b.i = r.i + 1),
       |__packed AS (
       |  SELECT r.source, r.chunk_no, r.cur_len AS len, r.start_line, r.end_line
       |  FROM __rec r
       |  JOIN (SELECT source, chunk_no, max(i) AS last_i
       |        FROM __rec GROUP BY 1, 2) lst
       |    ON r.source = lst.source AND r.chunk_no = lst.chunk_no
       |   AND r.i = lst.last_i),
       |__tailinfo AS (
       |  SELECT p.source, s.nc, p.len AS tail_len, p.end_line AS tail_end
       |  FROM __packed p
       |  JOIN (SELECT source, max(chunk_no) AS nc FROM __packed GROUP BY 1) s
       |    ON p.source = s.source AND p.chunk_no = s.nc),
       |__merged AS (
       |  SELECT p.source, p.chunk_no,
       |    CASE WHEN t.nc > 1 AND t.tail_len < $minChars AND p.chunk_no = t.nc - 1
       |         THEN p.len + 2 + t.tail_len ELSE p.len END AS len,
       |    p.start_line,
       |    CASE WHEN t.nc > 1 AND t.tail_len < $minChars AND p.chunk_no = t.nc - 1
       |         THEN t.tail_end ELSE p.end_line END AS end_line
       |  FROM __packed p JOIN __tailinfo t ON p.source = t.source
       |  WHERE NOT (t.nc > 1 AND t.tail_len < $minChars AND p.chunk_no = t.nc)),
       |__chunks AS (
       |  SELECT source AS filename, chunk_no - 1 AS chunk_index,
       |    len + CASE WHEN chunk_no = 1 THEN 0
       |          ELSE least($overlap,
       |                     lag(len) OVER (PARTITION BY source ORDER BY chunk_no)) + 1
       |          END AS size,
       |    start_line, end_line
       |  FROM __merged)""".stripMargin

  /** The nested merge-fold expression shared by the BPE oracles: encode
    * `wordExpr` by replaying every merge as ONE `list_reduce` pass.
    * Elements are lifted to single-symbol lists so accumulator and
    * element types unify, and "`acc`'s last symbol is `lhs`, the
    * incoming one is `rhs` → replace the last with `lhs||rhs`" is
    * EXACTLY the kernel's left-to-right non-overlapping pass — a
    * just-merged `lhs+rhs` can never equal `lhs` (rhs nonempty), so
    * neither side cascades within a pass (property-pinned in
    * TextAnalysisSpec). Merges nest in rank order; SQL size is linear
    * in the merge count. */
  private def bpeFoldExpr(wordExpr: String,
                          merges: Seq[(String, String)]): String = {
    def esc(x: String) = x.replace("'", "''")
    var e = s"list_append(regexp_extract_all($wordExpr, '.'), '</w>')"
    for ((l, r) <- merges) {
      val le = esc(l)
      val re = esc(r)
      e = s"""list_reduce(
        |    list_prepend([]::VARCHAR[], list_transform($e, xx -> [xx])),
        |    (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = '$le' AND xx[1] = '$re'
        |      THEN list_append(acc[:-2], '$le$re')
        |      ELSE list_append(acc, xx[1]) END)""".stripMargin
    }
    e
  }

  /** Shared unigram-Viterbi CTE chain (q254/q255): every distinct word
    * of the `tf` CTE segmented under the persisted piece table by the
    * EXACT DP the `unigram_encode` kernel runs — a recursive CTE grows
    * per-word dp/backpointer LISTS position by position (`dp[i] = max
    * over the window of dp[j] + lp(substr)`, candidate window
    * [max(0, i−maxLen), i), first-position-of-max ≡ smallest-j ties,
    * UNK floor for absent single chars, −∞ for absent longer
    * substrings), then a second recursive CTE walks the backpointers
    * into the piece sequence. Each candidate is ONE double addition of
    * artifact-literal doubles — bit-equal to the kernel on both
    * engines. Ends at `useg(token, cnt, pieces)`. */
  private def unigramViterbiCtes(
      pieces: Seq[(String, Double)], unkLogp: Double, maxLen: Int): String = {
    def esc(x: String) = x.replace("'", "''")
    val keys = pieces.map(p => s"'${esc(p._1)}'").mkString(", ")
    val vals = pieces.map(_._2).mkString(", ")
    s"""vm AS (SELECT MAP([$keys], CAST([$vals] AS DOUBLE[])) AS m),
       |urec AS (
       |  WITH RECURSIVE r(token, cnt, i, dp, bp, m) AS (
       |    SELECT token, cnt, 0, CAST([0.0] AS DOUBLE[]),
       |      CAST([] AS INTEGER[]), m
       |    FROM tf, vm
       |    UNION ALL
       |    SELECT token, cnt, i + 1, list_append(dp, list_max(cand)),
       |      list_append(bp, greatest(0, i + 1 - $maxLen)
       |        + list_position(cand, list_max(cand)) - 1), m
       |    FROM (
       |      SELECT token, cnt, i, dp, bp, m,
       |        list_transform(range(greatest(0, i + 1 - $maxLen), i + 1), j ->
       |          dp[j + 1] + coalesce(m[substr(token, j + 1, i + 1 - j)][1],
       |            CASE WHEN i + 1 - j = 1 THEN CAST($unkLogp AS DOUBLE)
       |                 ELSE '-infinity'::DOUBLE END)) AS cand
       |      FROM r WHERE i < len(token)))
       |  SELECT token, cnt, bp FROM r WHERE i = len(token)),
       |useg AS (
       |  WITH RECURSIVE w(token, cnt, i, ps, bp) AS (
       |    SELECT token, cnt, len(token), CAST([] AS VARCHAR[]), bp FROM urec
       |    UNION ALL
       |    SELECT token, cnt, bp[i],
       |      list_append(ps, substr(token, bp[i] + 1, i - bp[i])), bp
       |    FROM w WHERE i > 0)
       |  SELECT token, cnt, ps AS pieces FROM w WHERE i = 0)""".stripMargin
  }

  /** q254's oracle: corpus piece frequencies under the trained unigram
    * LM — the q118 shape with [[unigramViterbiCtes]] replacing the
    * merge fold. */
  def unigramEncodeSql(pieces: Seq[(String, Double)], unkLogp: Double,
                       maxLen: Int, topK: Int): String = {
    val pat = graft.operators.TextAnalysis.BpeTokenPattern.replace("'", "''")
    s"""WITH toks AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '$pat')) AS token
      |  FROM documents),
      |tf AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
      |       FROM toks GROUP BY 1),
      |${unigramViterbiCtes(pieces, unkLogp, maxLen)},
      |enc AS (SELECT cnt, unnest(pieces) AS piece FROM useg)
      |SELECT piece, CAST(sum(cnt) AS BIGINT) AS n_occurrences
      |FROM enc GROUP BY 1
      |ORDER BY n_occurrences DESC, piece LIMIT $topK""".stripMargin
  }

  /** q255's oracle: BPE-vs-unigram corpus fertility + single-char-piece
    * coverage — the BPE merge fold and the unigram Viterbi replay over
    * ONE shared word table, rolled into the two dataset-card rows. */
  def tokenizerCompareSql(merges: Seq[(String, String)],
                          pieces: Seq[(String, Double)], unkLogp: Double,
                          maxLen: Int): String = {
    val pat = graft.operators.TextAnalysis.BpeTokenPattern.replace("'", "''")
    val e = bpeFoldExpr("token", merges)
    s"""WITH toks AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '$pat')) AS token
      |  FROM documents),
      |tf AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
      |       FROM toks GROUP BY 1),
      |${unigramViterbiCtes(pieces, unkLogp, maxLen)},
      |b0 AS (SELECT tf.cnt, $e AS bl, u.pieces AS ul
      |       FROM tf JOIN useg u USING (token)),
      |b AS (SELECT cnt, CAST(len(bl) AS BIGINT) AS nb,
      |        CAST(len(list_filter(bl, x -> len(x) = 1)) AS BIGINT) AS cb,
      |        CAST(len(ul) AS BIGINT) AS nu,
      |        CAST(len(list_filter(ul, x -> len(x) = 1)) AS BIGINT) AS cu
      |      FROM b0),
      |s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_words,
      |        CAST(sum(cnt * nb) AS BIGINT) AS bpe_tokens,
      |        CAST(sum(cnt * cb) AS BIGINT) AS bpe_chars,
      |        CAST(sum(cnt * nu) AS BIGINT) AS uni_tokens,
      |        CAST(sum(cnt * cu) AS BIGINT) AS uni_chars
      |      FROM b)
      |SELECT 'bpe' AS tokenizer, n_words, bpe_tokens AS n_tokens,
      |  round(CAST(bpe_tokens AS DOUBLE) / n_words, 4) AS fertility,
      |  bpe_chars AS n_char_tokens,
      |  round(CASE WHEN bpe_tokens > 0
      |    THEN CAST(bpe_chars AS DOUBLE) / bpe_tokens ELSE 0.0 END, 4)
      |    AS char_token_rate
      |FROM s
      |UNION ALL
      |SELECT 'unigram' AS tokenizer, n_words, uni_tokens AS n_tokens,
      |  round(CAST(uni_tokens AS DOUBLE) / n_words, 4) AS fertility,
      |  uni_chars AS n_char_tokens,
      |  round(CASE WHEN uni_tokens > 0
      |    THEN CAST(uni_chars AS DOUBLE) / uni_tokens ELSE 0.0 END, 4)
      |    AS char_token_rate
      |FROM s
      |ORDER BY tokenizer""".stripMargin
  }

  /** q266's oracle: unigram-budget packing — the per-doc unigram count
    * replay (the q261 tfd/useg join) fed through the q52/q124
    * streaming-pack window (`bin = (cumsum_before_doc) div budget`,
    * per-shard, id order) and summarized per (source, bin). Tokenless
    * docs pack at cost 0, matching the engine's coalesce. */
  def unigramPackSql(pieces: Seq[(String, Double)], unkLogp: Double,
                     maxLen: Int, budget: Long): String = {
    val pat = graft.operators.TextAnalysis.BpeTokenPattern.replace("'", "''")
    s"""WITH toksd AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$pat')) AS token
      |  FROM documents),
      |tfd AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |        FROM toksd GROUP BY 1, 2),
      |tf AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
      |       FROM toksd GROUP BY 1),
      |${unigramViterbiCtes(pieces, unkLogp, maxLen)},
      |perdoc AS (
      |  SELECT t.doc_id, CAST(sum(t.tf * len(u.pieces)) AS BIGINT) AS nu
      |  FROM tfd t JOIN useg u USING (token) GROUP BY 1),
      |counted AS (
      |  SELECT d.doc_id, d.source, coalesce(p.nu, 0) AS nu
      |  FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id),
      |cum AS (
      |  SELECT doc_id, source, nu,
      |    sum(nu) OVER (PARTITION BY source ORDER BY doc_id) AS c
      |  FROM counted),
      |bins AS (SELECT source, (c - nu) // $budget AS bin, nu FROM cum)
      |SELECT source, CAST(bin AS BIGINT) AS bin,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(nu) AS BIGINT) AS n_uni_tokens
      |FROM bins GROUP BY 1, 2
      |ORDER BY source, bin""".stripMargin
  }

  /** q259's oracle: corpus NLL under the trained unigram LM — the
    * Viterbi replay's pieces re-scored piece by piece with the strict
    * left fold (the engine's `aggregate` order), totals via the
    * round(,6)→DECIMAL(22,6) exact-sum idiom. */
  def unigramNllSql(pieces: Seq[(String, Double)], unkLogp: Double,
                    maxLen: Int): String = {
    val pat = graft.operators.TextAnalysis.BpeTokenPattern.replace("'", "''")
    s"""WITH toks AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '$pat')) AS token
      |  FROM documents),
      |tf AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
      |       FROM toks GROUP BY 1),
      |${unigramViterbiCtes(pieces, unkLogp, maxLen)},
      |scored AS (
      |  SELECT u.cnt, CAST(len(u.pieces) AS BIGINT) AS np,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(u.pieces, p ->
      |        coalesce(m[p][1], CAST($unkLogp AS DOUBLE)))),
      |      (a, b) -> a + b) AS lp
      |  FROM useg u, vm)
      |SELECT CAST(sum(cnt) AS BIGINT) AS n_words,
      |  CAST(sum(cnt * np) AS BIGINT) AS n_pieces,
      |  round(CAST(sum(CAST(round(lp, 6) AS DECIMAL(22,6)) * cnt) AS DOUBLE),
      |    4) AS total_logp,
      |  round(CAST(sum(CAST(round(lp, 6) AS DECIMAL(22,6)) * cnt) AS DOUBLE)
      |    / sum(cnt * np), 4) AS mean_logp_per_piece
      |FROM scored""".stripMargin
  }

  /** q261's oracle: per-document mean piece log-prob — the Viterbi
    * replay's distinct-word scores joined back to the per-doc tf table
    * and rolled up with the DECIMAL exact-sum idiom (order-free, like
    * the engine's decimal fold). Tokenless docs drop via the inner
    * join, mirroring the engine's n_pieces > 0 filter. */
  def unigramDocScoreSql(pieces: Seq[(String, Double)], unkLogp: Double,
                         maxLen: Int): String = {
    val pat = graft.operators.TextAnalysis.BpeTokenPattern.replace("'", "''")
    s"""WITH toksd AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$pat')) AS token
      |  FROM documents),
      |tfd AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |        FROM toksd GROUP BY 1, 2),
      |tf AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
      |       FROM toksd GROUP BY 1),
      |${unigramViterbiCtes(pieces, unkLogp, maxLen)},
      |ws AS (
      |  SELECT u.token, CAST(len(u.pieces) AS BIGINT) AS np,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(u.pieces, p ->
      |        coalesce(m[p][1], CAST($unkLogp AS DOUBLE)))),
      |      (a, b) -> a + b) AS lp
      |  FROM useg u, vm)
      |SELECT t.doc_id, CAST(sum(t.tf * ws.np) AS BIGINT) AS n_pieces,
      |  round(CAST(sum(CAST(round(ws.lp, 6) AS DECIMAL(22,6)) * t.tf)
      |    AS DOUBLE) / sum(t.tf * ws.np), 4) AS mean_logp
      |FROM tfd t JOIN ws USING (token)
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin
  }

  /** q118's oracle: corpus token frequencies under a trained BPE merge
    * list (the `bpe_encode` kernel's contract, generated from the
    * persisted merges artifact) — full distinct-word table, every word
    * encoded via [[bpeFoldExpr]], symbols unnested weighted by count. */
  def bpeEncodeSql(merges: Seq[(String, String)], topK: Int): String = {
    val pat = graft.operators.TextAnalysis.BpeTokenPattern.replace("'", "''")
    val e = bpeFoldExpr("token", merges)
    s"""WITH toks AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '$pat')) AS token
      |  FROM documents),
      |tf AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
      |       FROM toks GROUP BY 1),
      |enc AS (SELECT cnt, unnest($e) AS sym FROM tf)
      |SELECT sym, CAST(sum(cnt) AS BIGINT) AS n_occurrences
      |FROM enc GROUP BY 1
      |ORDER BY n_occurrences DESC, sym LIMIT $topK""".stripMargin
  }

  /** q121's oracle: per-document pre-token and BPE token counts — the
    * per-doc `(doc_id, token, tf)` table, each distinct token's encoded
    * length via the shared merge-fold replay, then `Σ tf·|enc(token)|`
    * per document (tokenless docs = 0/0, matching the engine's fold
    * over an empty `token_tf` array). */
  /** The shared per-doc BPE-count CTE chain (`toks`/`tf`/`enc`/`agg`)
    * used by the q121 and q124 oracles. */
  private def bpeDocCountCtes(merges: Seq[(String, String)]): String = {
    val pat = graft.operators.TextAnalysis.BpeTokenPattern.replace("'", "''")
    val e = bpeFoldExpr("token", merges)
    s"""toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$pat')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      |       FROM toks GROUP BY 1, 2),
      |enc AS (SELECT doc_id, tf, CAST(len($e) AS BIGINT) AS ns FROM tf),
      |agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS np,
      |               CAST(sum(tf * ns) AS BIGINT) AS nb
      |        FROM enc GROUP BY 1)""".stripMargin
  }

  /** q138's oracle: per-language tokenizer fertility — the q12
    * language-id replay joined with the per-doc BPE count replay
    * ([[bpeDocCountCtes]]), rolled up as ratios of BIGINT sums. */
  def tokenizerFertilitySql(merges: Seq[(String, String)]): String = {
    def markers(l: String) =
      graft.operators.TextAnalysis.LangMarkers(l)
        .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH ${bpeDocCountCtes(merges)},
      |langsc AS (
      |  SELECT doc_id,
      |    len(list_filter(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
      |        x -> list_contains(${markers("de")}, x))) AS n_de,
      |    len(list_filter(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
      |        x -> list_contains(${markers("en")}, x))) AS n_en,
      |    len(list_filter(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
      |        x -> list_contains(${markers("es")}, x))) AS n_es,
      |    len(list_filter(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
      |        x -> list_contains(${markers("fr")}, x))) AS n_fr
      |  FROM documents),
      |langp AS (
      |  SELECT doc_id,
      |    CASE WHEN n_de = 0 AND n_en = 0 AND n_es = 0 AND n_fr = 0 THEN 'und'
      |         WHEN n_fr >= n_es AND n_fr >= n_en AND n_fr >= n_de THEN 'fr'
      |         WHEN n_es >= n_en AND n_es >= n_de THEN 'es'
      |         WHEN n_en >= n_de THEN 'en'
      |         ELSE 'de' END AS lang_pred
      |  FROM langsc),
      |per AS (
      |  SELECT d.doc_id, lp.lang_pred,
      |    coalesce(a.np, 0) AS np, coalesce(a.nb, 0) AS nb, d.n_chars
      |  FROM documents d
      |  JOIN langp lp USING (doc_id)
      |  LEFT JOIN agg a USING (doc_id))
      |SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(np) AS BIGINT) AS n_pretokens,
      |  CAST(sum(nb) AS BIGINT) AS n_bpe_tokens,
      |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |  round(CASE WHEN sum(np) > 0
      |    THEN CAST(sum(nb) AS DOUBLE) / CAST(sum(np) AS DOUBLE) END, 4)
      |    AS fertility,
      |  round(CASE WHEN sum(nb) > 0
      |    THEN CAST(sum(n_chars) AS DOUBLE) / CAST(sum(nb) AS DOUBLE) END, 4)
      |    AS chars_per_token
      |FROM per GROUP BY lang_pred
      |ORDER BY lang_pred""".stripMargin
  }

  def bpeDocTokenSql(merges: Seq[(String, String)]): String =
    s"""WITH ${bpeDocCountCtes(merges)}
      |SELECT d.doc_id,
      |  coalesce(a.np, 0) AS n_pretokens,
      |  coalesce(a.nb, 0) AS n_bpe_tokens
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q124's oracle: BPE-budget packing — the per-doc count replay
    * ([[bpeDocCountCtes]]) fed through the q52 streaming-pack window
    * (`bin = (cumsum_before_doc) div budget`, per-shard, id order) and
    * summarized per (source, bin). */
  /** q136's oracle: the Lloyd TRAINING LOOP unrolled (the q97
    * unrolled-hops posture applied to k-means) — deterministic init
    * (the k lowest-id vectors), then per iteration: argmin assignment
    * (strict-left-fold squared L2, ties to the lowest cell — the
    * `nearest_centroid_f32` kernel's exact arithmetic), per-cell
    * occupancy + decimal-summed objective, and the INTEGER-EXACT
    * centroid update (`floor(x·1e6 + 0.5)` scaled sums, one IEEE
    * division) with empty cells keeping their previous centroid. The
    * recomputed centroids are bit-identical to the engine's, so no
    * iteration can diverge on a Voronoi near-tie. */
  def kmeansLloydSql(k: Int, iters: Int, spherical: Boolean = false,
                     weightExpr: Option[String] = None): String =
    s"""WITH ${lloydChainCtes(k, iters, spherical, weightExpr)}
       |SELECT CAST(it AS BIGINT) AS iter, CAST(cell AS BIGINT) AS cell_id,
       |  n, round(obj, 4) AS obj
       |FROM (
       |  ${(1 to iters)
           .map(i => s"SELECT $i AS it, cell, n, obj FROM st$i")
           .mkString("\n  UNION ALL ")})
       |ORDER BY iter, cell_id""".stripMargin

  /** q141's oracle: the k-elbow sweep — one full [[lloydChainCtes]]
    * training replay per swept k, each block's per-iteration totals
    * (non-empty cells, objective as an EXACT decimal re-sum of the
    * per-cell decimal-born doubles) unioned as derived tables (the
    * nlistSweepSql WITH-in-derived-table idiom — CTE names reset per
    * block, no collisions). */
  def kmeansSweepSql(ks: Seq[Int], iters: Int): String = {
    val blocks = ks.map { k =>
      val totals = (1 to iters).map(i =>
        s"""SELECT $k AS k, $i AS it, CAST(count(*) AS BIGINT) AS n_cells,
           |      CAST(sum(CAST(obj AS DECIMAL(22,6))) AS DOUBLE) AS obj
           |    FROM st$i""".stripMargin).mkString("\n    UNION ALL ")
      s"""SELECT * FROM (WITH ${lloydChainCtes(k, iters, spherical = false)}
         |    $totals)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT CAST(k AS BIGINT) AS k, CAST(it AS BIGINT) AS iter,
       |  n_cells, round(obj, 4) AS obj
       |FROM (
       |$blocks)
       |ORDER BY k, iter""".stripMargin
  }

  /** The shared unrolled-Lloyd CTE body (`cents0`, then per iteration
    * `a{i}`/`st{i}`/`cents{i}`) used by [[kmeansLloydSql]] and
    * [[kmeansSweepSql]]. */
  private def lloydChainCtes(k: Int, iters: Int, spherical: Boolean,
                             weightExpr: Option[String] = None): String = {
    def d2 = s"""list_reduce(list_prepend(0.0,
                |        list_transform(list_zip(e.embedding, c.v),
                |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
                |               (CAST(p[1] AS DOUBLE) - p[2]))),
                |        (acc, t) -> acc + t)""".stripMargin
    // weighted: occupancy = Σw, objective/means on BIGINT w·scaled-long
    // products — the engine's exact-integer weighted path
    val wSel = weightExpr.map(w => s", CAST($w AS BIGINT) AS w").getOrElse("")
    val wOut = if (weightExpr.isDefined) ", w" else ""
    val stBody =
      if (weightExpr.isEmpty)
        """CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CAST(round(d2, 6) AS DECIMAL(22,6))) AS DOUBLE) AS obj""".stripMargin
      else
        """CAST(sum(w) AS BIGINT) AS n,
          |    CAST(sum(CAST(floor(d2 * 1000000 + 0.5) AS BIGINT) * w) AS DOUBLE)
          |      / 1000000.0 AS obj""".stripMargin
    val sumBody =
      if (weightExpr.isEmpty)
        """sum(CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS sv,
          |        count(*) AS n""".stripMargin
      else
        """sum(w * CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS sv,
          |        CAST(sum(w) AS BIGINT) AS n""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""a$i AS (
         |  SELECT vec_id, embedding, cell, d2$wOut FROM (
         |    SELECT e.vec_id, e.embedding, c.cell$wSel,
         |      $d2 AS d2,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |        $d2 ASC, c.cell ASC) AS rn
         |    FROM embeddings e CROSS JOIN cents${i - 1} c) WHERE rn = 1),
         |st$i AS (
         |  SELECT cell, $stBody
         |  FROM a$i GROUP BY cell),
         |cents$i AS (
         |  SELECT c0.cell, coalesce(nv.v, c0.v) AS v
         |  FROM cents${i - 1} c0 LEFT JOIN (
         |    SELECT cell, ${
           if (spherical)
             """CASE WHEN nrm > 0 THEN list_transform(vm, x -> x / nrm)
               |           ELSE vm END AS v
               |    FROM (
               |      SELECT cell, vm,
               |        sqrt(list_reduce(list_prepend(0.0,
               |          list_transform(vm, x -> x * x)),
               |          (acc, t) -> acc + t)) AS nrm
               |      FROM (SELECT cell,
               |              list(CAST(sv AS DOUBLE) / (n * 1000000.0) ORDER BY j) AS vm""".stripMargin
           else
             "list(CAST(sv AS DOUBLE) / (n * 1000000.0) ORDER BY j) AS v"
         }
         |    FROM (
         |      SELECT cell, j,
         |        $sumBody
         |      FROM (SELECT cell$wOut, unnest(range(len(embedding))) AS j,
         |                   unnest(embedding) AS x
         |            FROM a$i)
         |      GROUP BY cell, j)
         |    GROUP BY cell${if (spherical) "))" else ""}) nv USING (cell))""".stripMargin
    }.mkString(",\n")
    s"""cents0 AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE vec_id < $k),
       |$iterCtes""".stripMargin
  }

  def bpePackSql(merges: Seq[(String, String)], budget: Long): String =
    s"""WITH ${bpeDocCountCtes(merges)},
      |counted AS (
      |  SELECT d.doc_id, d.source, coalesce(a.nb, 0) AS nb
      |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
      |cum AS (
      |  SELECT doc_id, source, nb,
      |    sum(nb) OVER (PARTITION BY source ORDER BY doc_id) AS c
      |  FROM counted),
      |bins AS (SELECT source, (c - nb) // $budget AS bin, nb FROM cum)
      |SELECT source, CAST(bin AS BIGINT) AS bin,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(nb) AS BIGINT) AS n_bpe_tokens
      |FROM bins GROUP BY 1, 2
      |ORDER BY source, bin""".stripMargin
}
