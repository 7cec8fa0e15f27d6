package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH ANN — the bucketed scale path for cosine search
  * beside IVF cells (SURVEY §2.3 J3; reference exact search at
  * `components/core/search_service.py:205-235`, IVF alternative at
  * `components/core/index_service.py:84-98`).
  *
  * `nbits` signed projections give each vector a bucket id (bit j set when
  * dot(v, plane_j) > 0 — sign-random-projection LSH, Charikar 2002);
  * search probes the query's bucket plus its `nbits` Hamming-1 neighbors,
  * so per-query scan cost is ~ (nbits+1)/2^nbits of the corpus instead of
  * all of it. At ingest the bucket is a narrow map column (16 codegen'd
  * dot products against baked literal float[] planes) — persist the
  * corpus partitioned by bucket and probes prune parquet partitions
  * exactly like IVF cells.
  *
  * Hyperplanes are md5-derived (component i of plane j is ±1 from one hex
  * digit of md5("hp:j:i")): deterministic, dimension-independent, and
  * inlined into oracle SQL as literals the same way IVF centroids are.
  */
object HyperplaneLsh {

  val DefaultNbits = 6

  /** Bucket ids are written as an int-typed parquet partition column, so
    * the id must fit in 31 bits; enforced everywhere planes are consumed. */
  val MaxNbits = 30

  /** Deterministic ±1 hyperplanes: +1 iff the first hex digit of
    * md5("hp:j:i") < 8. */
  def hyperplanes(nbits: Int, dim: Int): Array[Array[Float]] = {
    require(nbits <= MaxNbits,
      s"nbits=$nbits would overflow the int-typed bucket partition column (max $MaxNbits)")
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nbits) { j =>
      Array.tabulate(dim) { i =>
        md.reset()
        val d = md.digest(s"hp:$j:$i".getBytes("UTF-8"))
        if (((d(0) >> 4) & 0xf) < 8) 1.0f else -1.0f
      }
    }
  }

  /** Stable identity of a plane set — `<nbits>d<dim>-<md5 of component
    * float bits>` — persisted beside a [[saveBucketed]] corpus and
    * carried as `bucket` column metadata, so a corpus bucketed under
    * different planes cannot silently produce empty joins. Hashes the
    * full IEEE bits, not just signs: callers may pass learned (non-±1)
    * planes, and magnitude changes bucket membership. */
  def planesFingerprint(planes: Array[Array[Float]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(4)
    planes.foreach(p => p.foreach { v =>
      buf.clear(); buf.putInt(java.lang.Float.floatToIntBits(v))
      md.update(buf.array())
    })
    val dim = if (planes.isEmpty) 0 else planes.head.length
    s"${planes.length}d$dim-" + md.digest().map("%02x".format(_)).mkString
  }

  private val FpMetaKey = "graft.lsh.planes_fp"
  private val MetaFile = "_lsh_meta"

  private def fpMetadata(planes: Array[Array[Float]]) =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putString(FpMetaKey, planesFingerprint(planes)).build()

  /** Fail fast when a DataFrame's `bucket` column records a fingerprint
    * for a DIFFERENT plane set; columns without the metadata (externally
    * bucketed corpora) are trusted as documented on [[search]]. */
  private def requireConsistentBuckets(df: DataFrame, planes: Array[Array[Float]]): Unit = {
    val m = df.schema("bucket").metadata
    if (m.contains(FpMetaKey)) {
      val have = m.getString(FpMetaKey)
      val want = planesFingerprint(planes)
      require(have == want,
        s"corpus was bucketed under planes $have but search was passed $want — " +
          "rebuild the bucketed corpus or pass the matching planes")
    }
  }

  /** Bucket id: bit j set when dot(v, plane_j) > 0. Each projection is a
    * codegen'd `dot_f32` against a baked literal float[] (the
    * `VecCodegen` literal specialization), so bucketing stays inside one
    * whole-stage span over the scan. */
  def bucketCol(emb: Column, planes: Array[Array[Float]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(GraftFunctions.dotF32(emb, typedLit(p)) > 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  def withBuckets(vecs: DataFrame, planes: Array[Array[Float]],
                  embCol: String = "embedding"): DataFrame = {
    require(planes.length <= MaxNbits,
      s"nbits=${planes.length} would overflow the int-typed bucket partition column")
    GraftFunctions.register(vecs.sparkSession)
    // drop() first so re-bucketing an already-bucketed corpus replaces
    // the column (select-append alone would duplicate it and break
    // partitionBy("bucket") downstream); no-op when absent
    vecs.drop("bucket")
      .select(col("*"), bucketCol(col(embCol), planes).as("bucket", fpMetadata(planes)))
  }

  /** Persist a corpus `partitionBy("bucket")` so probe joins prune parquet
    * partitions the way IVF cells do (`IvfIndex.searchBatch`'s DPP shape):
    * search against [[loadBucketed]] data reads only the (nbits+1)/2^nbits
    * probed partitions per query batch instead of the full corpus.
    * The plane-set fingerprint is written as a `_lsh_meta` sidecar (the
    * partition column's own metadata does not survive a parquet
    * round-trip) so [[loadBucketed]] can refuse mismatched planes. */
  def saveBucketed(corpus: DataFrame, planes: Array[Array[Float]],
                   path: String, embCol: String = "embedding"): Unit = {
    withBuckets(corpus, planes, embCol)
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
    val metaPath = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = metaPath.getFileSystem(
      corpus.sparkSession.sessionState.newHadoopConf())
    val out = fs.create(metaPath, true)
    try out.write(planesFingerprint(planes).getBytes("UTF-8")) finally out.close()
  }

  /** True iff `path` holds a complete [[saveBucketed]] corpus built under
    * exactly these planes — the build-or-load guard: callers rebuild on
    * false instead of tripping [[loadBucketed]]'s hard failure (e.g. a
    * cache written under an older fingerprint scheme or other planes). */
  def bucketedMatches(spark: org.apache.spark.sql.SparkSession, path: String,
                      planes: Array[Array[Float]]): Boolean = {
    val metaPath = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(metaPath) && {
      val in = fs.open(metaPath)
      val have = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                 finally in.close()
      have == planesFingerprint(planes)
    }
  }

  /** Load a [[saveBucketed]] corpus; its `bucket` column is the parquet
    * partition column, so [[search]] skips recomputing projections and the
    * broadcast probe join drives dynamic partition pruning. Validates the
    * `_lsh_meta` sidecar against `planes` (a corpus bucketed under other
    * planes would otherwise return silently empty joins) and re-attaches
    * the fingerprint as column metadata for [[search]]'s own check. */
  def loadBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
                   planes: Array[Array[Float]]): DataFrame = {
    val metaPath = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val want = planesFingerprint(planes)
    require(fs.exists(metaPath), s"no $MetaFile sidecar at $path — not a " +
      "saveBucketed corpus (or written before fingerprinting); rebuild it")
    val in = fs.open(metaPath)
    val have = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
               finally in.close()
    require(have == want,
      s"bucketed corpus at $path was built under planes $have, not $want — " +
        "rebuild it or pass the planes it was built with")
    val df = spark.read.parquet(path)
    df.select(df.columns.toIndexedSeq.map(c =>
      if (c == "bucket") col(c).as("bucket", fpMetadata(planes)) else col(c)): _*)
  }

  /** The multi-probe set of a bucket id as an array column: the bucket
    * itself plus its `nbits` Hamming-1 neighbors. THE definition of what
    * search probes — external measurements (ScaleProbe's scan fraction)
    * use this same column so they cannot drift from search's behavior. */
  def probeBucketsCol(bucket: Column, nbits: Int): Column =
    array(bucket +: (0 until nbits).map(j =>
      bucket.bitwiseXOR(lit(1L << j))): _*)

  /** Probe fan-out: each query row explodes to [[probeBucketsCol]]
    * (standard multi-probe — single-bucket recall is poor at small nbits).
    * A corpus vector lives in exactly ONE bucket and probe ids are
    * distinct, so a (query, corpus) pair matches at most once — no
    * downstream dedup needed. */
  private def probeFrame(queries: DataFrame, planes: Array[Array[Float]],
                         qIdCol: String, qEmbCol: String): DataFrame = {
    val qb = withBuckets(
      queries.select(col(qIdCol).as("query_id"), col(qEmbCol).as("q_embedding")),
      planes, "q_embedding")
    qb.select(col("query_id"), col("q_embedding"),
      explode(probeBucketsCol(col("bucket"), planes.length)).as("probe_bucket"))
  }

  /** Multi-probe bucket-LSH top-k cosine search, ranked by
    * (score DESC, id ASC). The probe join is a broadcast equality join on
    * bucket id — never all-pairs — and ranking is the `TopKByScore`
    * partial aggregate, so each scan partition map-side-combines to ≤ k
    * candidates per query before the single shuffle (the
    * `knnBatchAggregated` idiom; the row_number window this replaced
    * shuffled every scored (probe × bucket-mate) row and measured ~3×
    * slower at the 2M-row probe, BASELINE.md). On a [[saveBucketed]]
    * corpus (pre-existing `bucket` partition column) the broadcast join
    * drives dynamic partition pruning: unprobed buckets are never read. */
  def search(queries: DataFrame, corpus: DataFrame, k: Int,
             planes: Array[Array[Float]],
             idCol: String = "vec_id", embCol: String = "embedding",
             qIdCol: String = "query_id", qEmbCol: String = "q_embedding"): DataFrame = {
    VectorSearch.requireIntegralId(corpus, idCol)
    require(planes.length <= MaxNbits,
      s"nbits=${planes.length} would overflow the int-typed bucket partition column")
    // A pre-bucketed corpus is trusted only after its fingerprint check:
    // graft-produced bucket columns (withBuckets / loadBucketed) carry the
    // plane-set fingerprint as column metadata and a mismatch throws here;
    // external bucket columns without the metadata are trusted as-is.
    val cb = if (corpus.columns.contains("bucket")) {
      requireConsistentBuckets(corpus, planes); corpus
    } else withBuckets(corpus, planes, embCol)
    // Match the corpus bucket type exactly (a saveBucketed corpus reads its
    // partition column back as int): a cast on the partition-column side of
    // the join key disqualifies the scan from dynamic partition pruning.
    // A bucket id is a sum of 1L<<j terms, so `>= 0` is always true — it
    // exists to satisfy PartitionPruning's has-selective-predicate gate:
    // without a selective filter on the broadcast side, Catalyst never
    // inserts the dynamic-pruning subquery and a saveBucketed corpus is
    // read in full.
    val probes = probeFrame(queries, planes, qIdCol, qEmbCol)
      .withColumn("probe_bucket", col("probe_bucket").cast(cb.schema("bucket").dataType))
      .filter(col("probe_bucket") >= 0)
    val topk = udaf(new TopKByScore(k))
    cb.join(broadcast(probes), probes("probe_bucket") === cb("bucket"))
      .withColumn("score", GraftFunctions.dotF32(col("q_embedding"), col(embCol)))
      .select(col("query_id"), col(idCol).cast("long").as("id"), col("score"))
      .groupBy(col("query_id"))
      .agg(topk(col("id"), col("score")).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("rank0", "hit")))
      .select(col("query_id"), col("hit.id").as(idCol), col("hit.score").as("score"),
        (col("rank0") + 1).cast("int").as("rank"))
  }

  /** The pre-aggregator window form of [[search]] (row_number over
    * per-query scored rows). Same results, same total order; kept for
    * non-integral id columns, which the typed aggregate cannot carry. */
  def searchWindowed(queries: DataFrame, corpus: DataFrame, k: Int,
                     planes: Array[Array[Float]],
                     idCol: String = "vec_id", embCol: String = "embedding",
                     qIdCol: String = "query_id", qEmbCol: String = "q_embedding"): DataFrame = {
    val cb = if (corpus.columns.contains("bucket")) {
      requireConsistentBuckets(corpus, planes); corpus
    } else withBuckets(corpus, planes, embCol)
    val probes = probeFrame(queries, planes, qIdCol, qEmbCol)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    probes.join(cb, probes("probe_bucket") === cb("bucket"))
      .withColumn("score", GraftFunctions.dotF32(col("q_embedding"), col(embCol)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("score"), col("rank"))
  }
}
