package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** SQL + Column surface for graft's native expressions.
  *
  * Spark 4 no longer exposes a public `Column(Expression)` constructor, so
  * the expressions are registered in the session `FunctionRegistry` and
  * invoked through `call_function` — which keeps them fully codegen-capable
  * (they are real Catalyst expressions, not UDFs).
  *
  * `register` is idempotent; every graft entry point calls it.
  */
object GraftFunctions {

  /** Sessions already registered — skip re-registration so repeated entry
    * points don't churn the registry (every createOrReplaceTempFunction on
    * an existing name logs a replacement WARN; 50 queries × 11 functions
    * made real driver logs unreadable). Weak keys: a dropped session
    * unpins its entry. */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = {
    if (registered.containsKey(spark)) return
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "dot_f32", exprs => DotProductF32(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "l2_distance_f32", exprs => L2DistanceF32(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "l1_distance_f32", exprs => L1DistanceF32(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "linf_distance_f32", exprs => LinfDistanceF32(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "l2_normalize_f32", exprs => L2NormalizeF32(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "norm_f32", exprs => NormF32(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "hash_embed", exprs => HashEmbedExpression(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "text_stats", exprs => TextStatsExpression(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "nearest_centroid_f32",
      exprs => NearestCentroidF32(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sigs", exprs => MinhashSigs(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sigs_multi",
      exprs => MinhashSigsMulti(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "strip_non_alnum", exprs => StripNonAlnum(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "residual_f32",
      exprs => ResidualF32(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "tree_route_f32",
      exprs => TreeRouteF32(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "adc_lut", exprs => AdcLut(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "adc_lut_cells",
      exprs => AdcLutCells(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "sq8_encode_f32",
      exprs => Sq8EncodeF32(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "sq4_encode_packed_f32",
      exprs => Sq4EncodePackedF32(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "dsir_logw", exprs => DsirLogw(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "dsir_buckets", exprs => DsirBucketCounts(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "dsir_dot", exprs => DsirBucketDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "sign_pack", exprs => SignPackF32(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "hamming_words", exprs => HammingWords(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "pca_project_f32",
      exprs => PcaProjectF32(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "screen_flags", exprs => ScreenFlagsExpression(exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "rep_stats", exprs => RepStatsExpression(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "lm_score", exprs => LmScoreExpression(exprs(0), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "token_tf", exprs => TokenTfExpression(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "nfc", exprs => NfcNormalizeExpression(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "bpe_encode",
      exprs => BpeEncodeExpression(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "unigram_encode",
      exprs => UnigramEncodeExpression(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "decode_num_refs", exprs => DecodeNumRefs(exprs.head), "built-in")
    // Mark AFTER the registrations: marking first would let a concurrent
    // caller observe the key and return before the functions exist. Two
    // threads racing here both register — idempotent and safe (the
    // pre-guard behavior), just one redundant pass.
    registered.put(spark, java.lang.Boolean.TRUE)
  }

  /** Inner product of two `array<float>` columns (double accumulation). */
  def dotF32(a: Column, b: Column): Column = call_function("dot_f32", a, b)

  /** Euclidean distance between two `array<float>` columns. */
  def l2DistanceF32(a: Column, b: Column): Column =
    call_function("l2_distance_f32", a, b)

  /** Manhattan (L1) distance between two `array<float>` columns. */
  def l1DistanceF32(a: Column, b: Column): Column =
    call_function("l1_distance_f32", a, b)

  /** Chebyshev (L∞) distance between two `array<float>` columns. */
  def linfDistanceF32(a: Column, b: Column): Column =
    call_function("linf_distance_f32", a, b)

  /** L2-normalize an `array<float>` column. */
  def l2NormalizeF32(a: Column): Column = call_function("l2_normalize_f32", a)

  /** Euclidean norm of an `array<float>` column. */
  def normF32(a: Column): Column = call_function("norm_f32", a)

  /** Deterministic feature-hash embedding of a string column. */
  def hashEmbed(text: Column, dim: Column): Column =
    call_function("hash_embed", text, dim)

  /** Decode canonical HTML numeric character references in the pinned
    * bounded set (see [[DecodeNumRefs]]). */
  def decodeNumRefs(text: Column): Column =
    call_function("decode_num_refs", text)

  /** Distinct word n-gram shingles (single-pass tokenization). */
  def wordShingles(text: Column, n: Column): Column =
    call_function("word_shingles", text, n)

  /** All per-document text metrics as one struct (single-pass). */
  def textStats(text: Column): Column = call_function("text_stats", text)

  /** Repetition signals (top-bigram, dup-line mass) as one struct;
    * NULL text yields a NULL struct — `coalesce` first if zeros are
    * wanted (the composed forms' posture). */
  def repStats(text: Column): Column = call_function("rep_stats", text)

  /** Unigram-LM fold: `struct(sum, n_tokens, n_oov)` against a vocab
    * map literal (sorted-token accumulation, OOV floor). */
  def lmScore(text: Column, vmap: Column, total: Column): Column =
    call_function("lm_score", text, vmap, total)

  /** Per-document pre-tokenizer term frequencies
    * (`array<struct<token, tf>>`, one Java pass). */
  def tokenTf(text: Column): Column = call_function("token_tf", text)

  /** BPE-encode one pre-token with a trained merge list (rank order);
    * the merges ride as two array<string> literals. */
  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column =
    call_function("bpe_encode", word,
      org.apache.spark.sql.functions.typedlit(merges.map(_._1)),
      org.apache.spark.sql.functions.typedlit(merges.map(_._2)))

  /** Viterbi-encode one pre-token under a trained unigram LM; the
    * vocabulary rides as (piece, logp) literal arrays with the UNK
    * floor at slot 0 (empty-string piece). */
  def unigramEncode(word: Column, pieces: Seq[(String, Double)],
                    unkLogp: Double): Column =
    call_function("unigram_encode", word,
      org.apache.spark.sql.functions.typedlit("" +: pieces.map(_._1)),
      org.apache.spark.sql.functions.typedlit(unkLogp +: pieces.map(_._2)))

  /** Unicode NFC normalization of a string column. */
  def nfc(text: Column): Column = call_function("nfc", text)

  /** IVF cell assignment: argmin squared-L2 over a centroid literal. */
  def nearestCentroidF32(emb: Column, centroids: Column): Column =
    call_function("nearest_centroid_f32", emb, centroids)

  /** Per-document MinHash band signatures (single pass, one md5/shingle). */
  def minhashSigs(text: Column, n: Column, bands: Column): Column =
    call_function("minhash_sigs", text, n, bands)

  /** [[minhashSigs]] for several band counts in one md5 pass (sweeps). */
  def minhashSigsMulti(text: Column, n: Column, bandCounts: Column): Column =
    call_function("minhash_sigs_multi", text, n, bandCounts)

  /** Drop every byte outside `[a-z0-9]` (fingerprint normalizer). */
  def stripNonAlnum(s: Column): Column = call_function("strip_non_alnum", s)

  /** 64-bit SimHash over word tokens (md5-derived, oracle-replicable). */
  def simhash64(text: Column): Column = call_function("simhash64", text)

  /** IVF residual `float(double(emb) − centroids[cell])` (codegen'd). */
  def residualF32(emb: Column, centroids: Column, cellId: Column): Column =
    call_function("residual_f32", emb, centroids, cellId)

  /** Quantizer-code ADC: `Σ_i lut[i][codes[i]]` over a LUT literal. */
  def adcLut(codes: Column, lut: Column): Column =
    call_function("adc_lut", codes, lut)

  /** RP-tree leaf routing over heap-ordered plane/threshold literals. */
  def treeRouteF32(emb: Column, planes: Column, thetas: Column): Column =
    call_function("tree_route_f32", emb, planes, thetas)

  /** IVFADC scan kernel: ADC against the row's coarse cell's LUT. */
  def adcLutCells(codes: Column, cellId: Column, luts: Column): Column =
    call_function("adc_lut_cells", codes, cellId, luts)

  /** Sign-binarize an `array<float>` into ⌈d/64⌉ packed 64-bit words. */
  def signPack(emb: Column): Column = call_function("sign_pack", emb)

  /** Hamming distance between two `array<bigint>` packed codes. */
  def hammingWords(a: Column, b: Column): Column =
    call_function("hamming_words", a, b)

  /** PCA-project an `array<float>` against (mean, components) literals. */
  def pcaProjectF32(emb: Column, mean: Column, comps: Column): Column =
    call_function("pca_project_f32", emb, mean, comps)

  /** Gopher + C4 screen verdicts in one kernel pass (struct). */
  def screenFlags(text: Column, minWords: Column, maxWords: Column,
                  minLineWords: Column, minSentences: Column): Column =
    call_function("screen_flags", text, minWords, maxWords,
      minLineWords, minSentences)

  /** 8-bit scalar-quantizer encode against per-dim (vmin, step) bounds. */
  def sq8EncodeF32(emb: Column, vmin: Column, step: Column): Column =
    call_function("sq8_encode_f32", emb, vmin, step)

  /** 4-bit scalar-quantizer encode + nibble pack (two codes per int). */
  def sq4EncodePackedF32(emb: Column, vmin: Column, step: Column): Column =
    call_function("sq4_encode_packed_f32", emb, vmin, step)

  /** Single-pass DSIR log-weight: struct(logw, n_features). */
  def dsirLogw(text: Column, lr: Column): Column =
    call_function("dsir_logw", text, lr)

  /** Single-pass `Σ_b hist[b]·w[b]` (bucket-order fold) — the quality
    * classifier's logit minus intercept. */
  def dsirDot(text: Column, weights: Column): Column =
    call_function("dsir_dot", text, weights)

  /** Single-pass DSIR per-document bucket histogram: array<long>. */
  def dsirBuckets(text: Column, buckets: Column): Column =
    call_function("dsir_buckets", text, buckets)

  /** Similarity from distance, matching the reference's transform
    * (`components/core/search_service.py:336-349`): identity for inner
    * product on normalized vectors, `1/(1+d)` for L2. */
  def l2Similarity(dist: Column): Column = {
    import org.apache.spark.sql.functions.lit
    lit(1.0) / (lit(1.0) + dist)
  }
}
