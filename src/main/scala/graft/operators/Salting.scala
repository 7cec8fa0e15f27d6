package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY §7 scale toolkit; complements
  * AQE's runtime skew-join splitting when skew is known a priori).
  *
  * - [[saltedAggregate]]: two-phase aggregation — partial per (key, salt)
  *   spreads one hot key over `buckets` reducers, final re-aggregates per
  *   key. Works for decomposable aggregates (sum/count/min/max).
  * - [[saltedJoin]]: the skewed (large) side gets a random-ish salt; the
  *   small side is exploded `buckets`× so every (key, salt) pair matches —
  *   a hot key's rows land on `buckets` tasks instead of one.
  *
  * Salt is `pmod(xxhash64(all columns), buckets)` — derived from row
  * CONTENT, never from `monotonically_increasing_id()` or `rand()`: a
  * nondeterministic grouping key can double-count or drop rows when a
  * stage is retried after a fetch failure (the SPARK-23207 class of
  * bug), because the retried tasks re-salt rows differently from the
  * already-consumed map outputs. Content-derived salt recomputes
  * identically on retry. Exactly duplicate rows share a salt, so a hot
  * key whose rows are all identical will not spread — acceptable,
  * since such rows carry no per-row information to aggregate unevenly.
  */
object Salting {

  private def salt(df: DataFrame, buckets: Int, saltCols: Seq[String]): Column = {
    val cols = if (saltCols.nonEmpty) saltCols else df.columns.toIndexedSeq
    pmod(xxhash64(cols.map(col): _*), lit(buckets.toLong)).cast("int")
  }

  /** Two-phase salted sum/count aggregation: `aggs` maps output column
    * name → (valueColumn, "sum" | "count" | "min" | "max").
    * Identical-row hot keys are safe here even though they share a salt:
    * the map-side partial aggregation collapses them before the shuffle. */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], buckets: Int,
                      aggs: Map[String, (Column, String)]): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(aggs.nonEmpty, "at least one aggregate required")
    val partialAggs = aggs.map { case (name, (valueCol, kind)) =>
      (kind match {
        case "sum" => sum(valueCol)
        case "count" => count(valueCol)
        case "min" => min(valueCol)
        case "max" => max(valueCol)
        case other => throw new IllegalArgumentException(
          s"non-decomposable aggregate: $other")
      }).as(s"__p_$name")
    }.toSeq
    val finalAggs = aggs.map { case (name, (_, kind)) =>
      (kind match {
        case "sum" | "count" => sum(col(s"__p_$name"))
        case "min" => min(col(s"__p_$name"))
        case "max" => max(col(s"__p_$name"))
      }).as(name)
    }.toSeq
    df.withColumn("__salt", salt(df, buckets, Nil))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join: `large` is salted, `small` exploded buckets×.
    *
    * UNLIKE the aggregate, a join gets no map-side collapse — a hot key
    * whose rows are IDENTICAL across all hashed columns shares one salt
    * and still lands on one task. When the large side is a narrow
    * projection (just the key), pass `saltCols` pointing at a
    * high-cardinality column of the pre-projection frame (a row id, an
    * event timestamp) to restore spread; the default hashes every
    * column, which suffices whenever any per-row attribute varies. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int, saltCols: Seq[String] = Nil): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val saltedLarge = large.withColumn("__salt", salt(large, buckets, saltCols))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
