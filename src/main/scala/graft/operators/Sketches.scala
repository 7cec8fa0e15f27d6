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

  // ---- Count-Min sketch: approximate FREQUENCIES (KMV counts DISTINCTS) --

  /** Count-Min row hash: item's cell in sketch row `row` — the KMV
    * 60-bit md5 point idiom salted with the row index, reduced mod
    * `width`. Deterministic and engine-portable (DuckDB:
    * `CAST('0x' || substr(md5(row || ':' || x),1,15) AS BIGINT) % w`). */
  def cmHash(item: org.apache.spark.sql.Column, row: Int,
             width: Int): org.apache.spark.sql.Column =
    conv(substring(md5(concat_ws(":", lit(row), item)), 1, 15), 16, 10)
      .cast("long") % width

  /** Build a Count-Min sketch over an item-occurrence column: `depth`
    * rows × `width` counters, materialized as (r, c, v) rows — at most
    * depth·width of them regardless of input size. ONE pass: each
    * occurrence explodes to its `depth` cells and the counter sums
    * combine map-side, so the only exchange moves ≤ depth·width partial
    * cells per task, never the corpus. Point-estimate property: for any
    * item, min over rows of its cell value ≥ its true count (counters
    * only ever add) — the overcount is bounded by collisions, 2·N/width
    * in expectation per row. Sketches MERGE by cell-wise addition
    * (counters are sums), making the build embarrassingly combinable
    * across shards — see [[cmMerge]]. */
  def cmSketch(items: DataFrame, itemCol: String, depth: Int,
               width: Int): DataFrame = {
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("r"), cmHash(col(itemCol), r, width).as("c"))
    }
    items.select(explode(array(cells: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).cast("long").as("v"))
  }

  /** Merge two CM sketches in (r, c, v) form: cell-wise addition. */
  def cmMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy("r", "c")
      .agg(sum("v").cast("long").as("v"))

  /** Point estimates for a probe set: each probe row explodes to its
    * `depth` cells, broadcast-joins the (tiny) sketch, and takes the
    * min across rows. `carryCols` are probe columns carried through
    * (grouping keys of the output). Probes the sketch never saw
    * estimate 0 (left join + coalesce — CM's floor for absent keys). */
  def cmEstimate(probes: DataFrame, itemCol: String, carryCols: Seq[String],
                 sketch: DataFrame, depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map { r =>
      struct(lit(r).as("r"), cmHash(col(itemCol), r, width).as("c"))
    }
    val sk = sketch.select(col("r").as("__sr"), col("c").as("__sc"),
      col("v").as("__sv"))
    probes.withColumn("__rc", explode(array(cells: _*)))
      .join(broadcast(sk),
        col("__rc.r") === col("__sr") && col("__rc.c") === col("__sc"), "left")
      .groupBy(itemCol, carryCols: _*)
      .agg(min(coalesce(col("__sv"), lit(0L))).as("n_est"))
  }
}
