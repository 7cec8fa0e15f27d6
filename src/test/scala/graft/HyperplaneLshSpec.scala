package graft

import graft.operators.HyperplaneLsh
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HyperplaneLshSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  graft.functions.GraftFunctions.register(SparkTestBase.spark)

  test("hyperplanes are deterministic ±1 and dimension-shaped") {
    val a = HyperplaneLsh.hyperplanes(4, 8)
    val b = HyperplaneLsh.hyperplanes(4, 8)
    assert(a.length == 4 && a.forall(_.length == 8))
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(x => x == 1.0f || x == -1.0f))
    assert(a.flatten.exists(_ == 1.0f) && a.flatten.exists(_ == -1.0f))
  }

  test("identical vectors share a bucket; search finds self at rank 1") {
    val planes = HyperplaneLsh.hyperplanes(4, 4)
    val vecs = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f, 0.0f, 0.0f)),   // identical to 0
      (2L, Array(-1.0f, 0.0f, 0.3f, 0.0f))
    ).toDF("vec_id", "embedding")
    val buckets = HyperplaneLsh.withBuckets(vecs, planes)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(buckets(0L) == buckets(1L))
    val queries = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val hits = HyperplaneLsh.search(queries, vecs, k = 3, planes)
      .orderBy("rank").select("vec_id", "rank").as[(Long, Int)].collect()
    // ids 0 and 1 tie on score; id ASC breaks the tie
    assert(hits.take(2).toSeq == Seq((0L, 1), (1L, 2)))
  }

  test("search plan: probe join is broadcast-hash, never cartesian") {
    val planes = HyperplaneLsh.hyperplanes(4, 4)
    val vecs = (0 until 64).map(i =>
      (i.toLong, Array(i.toFloat, 1f, -i.toFloat, 0.5f))).toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val plan = HyperplaneLsh.search(queries, vecs, 3, planes)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("search ranks via partial aggregate: no Window exchange in the plan") {
    val planes = HyperplaneLsh.hyperplanes(4, 4)
    val vecs = (0 until 64).map(i =>
      (i.toLong, Array(i.toFloat, 1f, -i.toFloat, 0.5f))).toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val plan = HyperplaneLsh.search(queries, vecs, 3, planes)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window exec leaked into aggregated search:\n$plan")
    assert(plan.contains("Aggregate"))
  }

  test("windowed and aggregated search agree exactly") {
    val planes = HyperplaneLsh.hyperplanes(6, 8)
    val r = new scala.util.Random(7)
    val vecs = (0 until 200).map { i =>
      val v = Array.fill(8)(r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum)
      (i.toLong, v.map(x => (x / n).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val agg = HyperplaneLsh.search(queries, vecs, 4, planes)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().sorted.toSeq
    val win = HyperplaneLsh.searchWindowed(queries, vecs, 4, planes)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().sorted.toSeq
    assert(agg == win)
  }

  test("bucket-partitioned corpus: probe join prunes partitions dynamically") {
    val planes = HyperplaneLsh.hyperplanes(4, 4)
    val r = new scala.util.Random(3)
    val vecs = (0 until 256).map { i =>
      (i.toLong, Array.fill(4)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-lsh").toString + "/corpus"
    HyperplaneLsh.saveBucketed(vecs, planes, path)
    val stored = HyperplaneLsh.loadBucketed(spark, path, planes)
    assert(stored.columns.contains("bucket"))
    val queries = vecs.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val hits = HyperplaneLsh.search(queries, stored, 3, planes)
    // The scan's partition filter must be the dynamic-pruning subquery on
    // bucket — without it every probe reads all 2^nbits partitions.
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on bucketed corpus:\n$plan")
    // and results match the compute-buckets-on-the-fly path exactly
    val direct = HyperplaneLsh.search(queries, vecs, 3, planes)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().sorted.toSeq
    val pruned = hits
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().sorted.toSeq
    assert(pruned == direct)
  }

  test("multi-probe reaches Hamming-1 neighbor buckets") {
    val planes = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    // v0 bucket = 11 (both dots > 0); v1 bucket = 01 (first dot < 0)
    val vecs = Seq(
      (0L, Array(0.5f, 0.5f)),
      (1L, Array(-0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val found = HyperplaneLsh.search(queries, vecs, k = 2, planes)
      .select("vec_id").as[Long].collect().toSet
    assert(found == Set(0L, 1L)) // v1 only reachable via a Hamming-1 probe
  }

  test("mismatched planes are refused, not silently empty") {
    val planes = HyperplaneLsh.hyperplanes(4, 4)
    val other = HyperplaneLsh.hyperplanes(5, 4)
    val r = new scala.util.Random(7)
    val vecs = (0 until 32).map { i =>
      (i.toLong, Array.fill(4)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-lshm").toString + "/corpus"
    HyperplaneLsh.saveBucketed(vecs, planes, path)
    // load under the wrong planes → sidecar mismatch
    val exLoad = intercept[IllegalArgumentException] {
      HyperplaneLsh.loadBucketed(spark, path, other)
    }
    assert(exLoad.getMessage.contains("built under planes"))
    // search a correctly-loaded corpus with the wrong planes → column
    // metadata mismatch (this was the silent-empty-results hazard)
    val stored = HyperplaneLsh.loadBucketed(spark, path, planes)
    val queries = vecs.limit(1)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val exSearch = intercept[IllegalArgumentException] {
      HyperplaneLsh.search(queries, stored, 2, other)
    }
    assert(exSearch.getMessage.contains("bucketed under planes"))
    // a corpus whose bucket column has no fingerprint (external origin)
    // is still accepted as documented
    val external = stored.select(col("vec_id"), col("embedding"),
      col("bucket").cast("long").as("bucket"))
    assert(HyperplaneLsh.search(queries, external, 2, planes).count() > 0)
  }

  test("nbits past the int partition-column range is rejected") {
    intercept[IllegalArgumentException] { HyperplaneLsh.hyperplanes(31, 4) }
  }

  test("fingerprint sees magnitude, and re-bucketing replaces the column") {
    // sign-identical planes with different magnitudes bucket differently
    // and must NOT share a fingerprint
    val a = Array(Array(1.0f, 1.0f))
    val b = Array(Array(1.0f, 100.0f))
    assert(HyperplaneLsh.planesFingerprint(a) != HyperplaneLsh.planesFingerprint(b))
    // withBuckets over an already-bucketed frame replaces (not appends)
    val vecs = Seq((0L, Array(0.5f, -0.25f))).toDF("vec_id", "embedding")
    val twice = HyperplaneLsh.withBuckets(
      HyperplaneLsh.withBuckets(vecs, a), b)
    assert(twice.columns.count(_ == "bucket") == 1)
    // bucket under b: dot(0.5, -0.25)·(1,100) = 0.5 - 25 < 0 → bucket 0
    assert(twice.select("bucket").head().getLong(0) == 0L)
  }
}
