package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q208–q210 retrieval tier: MaxSim scoring and the MRL prefix
  * cascade, pinned against driver-computed references independently of
  * the DuckDB gate, plus the plan shapes their 100 TB story relies on
  * (map-side partial max before the exchange; prefix dot via the
  * min-length rule, not a sliced copy). */
class MultiVectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def vecs(n: Int, dim: Int = 16): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(77)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(r.nextGaussian().toFloat)))
  }

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0; var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  test("maxsim ≡ driver reference: sum of per-token maxes, fixed order") {
    val data = vecs(96) // docs of 8 -> 12 docs
    val qs = data.take(4).map(_._2)
    GraftFunctions.register(spark)
    val emb = data.toDF("vec_id", "embedding")
    val maxes = qs.zipWithIndex.map { case (v, i) =>
      max(GraftFunctions.dotF32(col("embedding"), typedlit(v.toSeq))).as(s"m$i") }
    val got = emb.filter($"vec_id" >= 8)
      .groupBy(expr("vec_id div 8").cast("long").as("doc_id"))
      .agg(maxes.head, maxes.tail: _*)
      .withColumn("__s", qs.indices.map(i => col(s"m$i")).reduce(_ + _))
      .select($"doc_id", $"__s").as[(Long, Double)].collect().toMap

    val docs = data.filter(_._1 >= 8).groupBy(_._1 / 8)
    val want = docs.view.mapValues { rows =>
      // engine sum order: ((m0 + m1) + m2) + m3
      qs.map(q => rows.map(r => dot(r._2, q)).max).reduce(_ + _)
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (d, s) =>
      assert(s == want(d), s"maxsim for doc $d: $s != ${want(d)}") }
  }

  test("maxsim plan: partial max BEFORE the exchange (map-side combine)") {
    GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-mv").toString + "/emb"
    vecs(96).toDF("vec_id", "embedding").write.parquet(path)
    val emb = spark.read.parquet(path)
    val q = vecs(1).head._2
    val df = emb.groupBy(expr("vec_id div 8").as("doc_id"))
      .agg(max(GraftFunctions.dotF32(col("embedding"), typedlit(q.toSeq))).as("m"))
    df.collect() // AQE: plan shape is inspectable after execution
    val plan = df.queryExecution.executedPlan.toString
    val firstAgg = plan.indexOf("HashAggregate")
    val exch = plan.indexOf("Exchange")
    assert(firstAgg >= 0 && exch >= 0 && firstAgg < exch,
      s"final agg / exchange order wrong (top-down plan should show final agg, then exchange, then partial):\n$plan")
    assert(plan.indexOf("HashAggregate", exch) > exch,
      s"no partial aggregate below the exchange:\n$plan")
  }

  test("prefix dot via min-length rule ≡ explicit prefix slice") {
    GraftFunctions.register(spark)
    val data = vecs(40, dim = 64)
    val q16 = data.head._2.take(16)
    val emb = data.toDF("vec_id", "embedding")
    val viaRule = emb.select($"vec_id",
        GraftFunctions.dotF32(col("embedding"), typedlit(q16.toSeq)).as("s"))
      .as[(Long, Double)].collect().toMap
    data.foreach { case (id, v) =>
      assert(viaRule(id) == dot(v.take(16), q16),
        s"prefix dot diverged for $id") }
  }
}
