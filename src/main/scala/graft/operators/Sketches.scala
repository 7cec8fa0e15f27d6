package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — the approximate-analytics tier a
  * 100 TB pipeline reads its cardinality dashboards from (vocabulary
  * sizes, per-source shingle diversity, cross-source overlap) without a
  * count-distinct shuffle of the full key set.
  *
  * The sketch is KMV (k minimum values): the k smallest distinct 60-bit
  * hash points of the set. Unlike engine-private HLL
  * (`approx_count_distinct`), KMV over md5-derived points is
  * DETERMINISTIC and engine-portable — the same idiom the dedup tier
  * uses for signatures — so sketch contents, estimates, and merges sit
  * directly under the DuckDB hash oracle. Estimation: with the k-th
  * smallest normalized point u = h_k / 2^60, D ≈ (k−1)/u; below k
  * distinct values the sketch IS the set and the estimate is exact.
  * Both numerator and h_k are exactly-representable integers, so the
  * estimate is ONE IEEE division — bit-equal on both engines.
  *
  * Sketches MERGE by taking the k smallest of the unioned value lists —
  * the property that makes them map-side-combinable: at scale each
  * partition sketches locally and the merge is a k-element fold,
  * never a re-scan. */
object Sketches {

  /** 60-bit hash point of an item: first 15 hex chars of md5, parsed as
    * BIGINT (the chunk-id idiom — identical in DuckDB via
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`). */
  def hashPoint(item: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(item), 1, 15), 16, 10).cast("long")

  /** 2^60 as a double — exactly representable; (k−1)·2^60 stays exact
    * for any practical k (power-of-two mantissa). */
  val HashSpace: Double = math.pow(2.0, 60)

  /** Per-group KMV sketch over an item column: (grp, sketch ASC
    * array<long>, n_vals). The distinct() is the only full shuffle —
    * on (grp, h), the same key the bottom-k window then uses; the
    * rank filter compiles to WindowGroupLimit, so each partition keeps
    * only k rows before the final exchange. */
  def kmvSketch(df: DataFrame, grpCol: String, itemCol: String,
                k: Int): DataFrame = {
    val pts = df
      .select(col(grpCol).as("grp"), hashPoint(col(itemCol)).as("h"))
      .distinct()
    val w = Window.partitionBy("grp").orderBy("h")
    pts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy("grp")
      .agg(sort_array(collect_list("h")).as("sketch"),
        count(lit(1)).cast("long").as("n_vals"))
  }

  /** Distinct-count estimate from a sketch column: exact size when the
    * sketch holds fewer than k values, else (k−1)·2^60 / h_k. */
  def estimate(sketch: org.apache.spark.sql.Column,
               k: Int): org.apache.spark.sql.Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * HashSpace) /
        element_at(sketch, k).cast("double"))

  /** Merge two sketches: k smallest of the union (array_union dedups;
    * the result is again a valid KMV sketch of the set union). */
  def merge(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
            k: Int): org.apache.spark.sql.Column =
    slice(array_sort(array_union(a, b)), 1, k)
}
