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

  /** Deterministic ±1 hyperplanes: +1 iff the first hex digit of
    * md5("hp:j:i") < 8. */
  def hyperplanes(nbits: Int, dim: Int): Array[Array[Float]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nbits) { j =>
      Array.tabulate(dim) { i =>
        md.reset()
        val d = md.digest(s"hp:$j:$i".getBytes("UTF-8"))
        if (((d(0) >> 4) & 0xf) < 8) 1.0f else -1.0f
      }
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
    GraftFunctions.register(vecs.sparkSession)
    vecs.withColumn("bucket", bucketCol(col(embCol), planes))
  }

  /** Multi-probe bucket-LSH top-k cosine search: each query probes its own
    * bucket and the `nbits` Hamming-1 neighbor buckets (standard
    * multi-probe — single-bucket recall is poor at small nbits), scores
    * only within probed buckets, and ranks by (score DESC, id ASC).
    * The probe join is an equality join on bucket id: never all-pairs,
    * and broadcast when the query side is small. */
  def search(queries: DataFrame, corpus: DataFrame, k: Int,
             planes: Array[Array[Float]],
             idCol: String = "vec_id", embCol: String = "embedding",
             qIdCol: String = "query_id", qEmbCol: String = "q_embedding"): DataFrame = {
    val nbits = planes.length
    val cb = withBuckets(corpus, planes, embCol)
    val qb = withBuckets(
      queries.select(col(qIdCol).as("query_id"), col(qEmbCol).as("q_embedding")),
      planes, "q_embedding")
    val probeBuckets = array(
      col("bucket") +: (0 until nbits).map(j =>
        col("bucket").bitwiseXOR(lit(1L << j))): _*)
    val probes = qb
      .select(col("query_id"), col("q_embedding"),
        explode(probeBuckets).as("probe_bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    probes.join(cb, probes("probe_bucket") === cb("bucket"))
      .withColumn("score", GraftFunctions.dotF32(col("q_embedding"), col(embCol)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("score"), col("rank"))
  }
}
