package graft

import graft.functions.{GraftFunctions, HashEmbedder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("dot_f32 matches scalar computation and handles nulls") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.5f), Array(2.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.dotF32($"a", $"b")).as[Double].collect()
    assert(got(0) == 1.0 * 4 + 2 * 5 + 3 * 6)
    assert(got(1) == 0.5 * 2 - 0.5 * 2)
    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(withNull.select(GraftFunctions.dotF32($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("dot_f32 survives both codegen and interpreted paths") {
    GraftFunctions.register(spark)
    val df = Seq((Array.fill(64)(0.25f), Array.fill(64)(0.5f))).toDF("a", "b")
    val expected = 64 * 0.25 * 0.5
    assert(df.select(GraftFunctions.dotF32($"a", $"b")).as[Double].head() === expected)
    // force interpreted eval
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try
      assert(df.select(GraftFunctions.dotF32($"a", $"b")).as[Double].head() === expected)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("l2_distance_f32 and l2_normalize_f32") {
    GraftFunctions.register(spark)
    val df = Seq((Array(3.0f, 4.0f), Array(0.0f, 0.0f))).toDF("a", "b")
    assert(df.select(GraftFunctions.l2DistanceF32($"a", $"b")).as[Double].head() === 5.0)
    val norm = df.select(GraftFunctions.l2NormalizeF32($"a")).as[Array[Float]].head()
    assert(math.abs(norm(0) - 0.6f) < 1e-6 && math.abs(norm(1) - 0.8f) < 1e-6)
    // zero vector passes through
    val z = df.select(GraftFunctions.l2NormalizeF32($"b")).as[Array[Float]].head()
    assert(z.toSeq == Seq(0.0f, 0.0f))
    assert(df.select(GraftFunctions.normF32($"a")).as[Double].head() === 5.0)
  }

  test("l1_distance_f32 and linf_distance_f32: values, nulls, both eval paths") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, -2.0f, 3.0f), Array(4.0f, 0.0f, 1.5f)), // |−3|+|−2|+|1.5|
      (Array(0.5f, 0.5f), Array(0.5f, 0.5f))
    ).toDF("a", "b")
    val l1 = df.select(GraftFunctions.l1DistanceF32($"a", $"b")).as[Double].collect()
    assert(l1(0) == 3.0 + 2.0 + 1.5 && l1(1) == 0.0)
    val linf = df.select(GraftFunctions.linfDistanceF32($"a", $"b")).as[Double].collect()
    assert(linf(0) == 3.0 && linf(1) == 0.0)
    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(withNull.select(GraftFunctions.l1DistanceF32($"a", $"b")).collect()(0).isNullAt(0))
    assert(withNull.select(GraftFunctions.linfDistanceF32($"a", $"b")).collect()(0).isNullAt(0))
    // interpreted path agrees with codegen
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      assert(df.select(GraftFunctions.l1DistanceF32($"a", $"b")).as[Double].collect().toSeq
        == l1.toSeq)
      assert(df.select(GraftFunctions.linfDistanceF32($"a", $"b")).as[Double].collect().toSeq
        == linf.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("hash embedder: deterministic, unit-norm, dimension-correct") {
    val a = HashEmbedder.embed("spark join vector", 64)
    val b = HashEmbedder.embed("spark join vector", 64)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64)
    val norm = math.sqrt(a.map(x => x * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // different text -> different vector (with overwhelming probability)
    val c = HashEmbedder.embed("completely different words here", 64)
    assert(c.toSeq != a.toSeq)
    // empty text -> zero vector
    assert(HashEmbedder.embed("", 64).forall(_ == 0.0f))
    // similar texts are closer than dissimilar ones
    def cos(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p * q.toDouble }.sum
    val nearA = HashEmbedder.embed("spark join vector stream", 64)
    assert(cos(a, nearA) > cos(a, c))
  }

  test("hash_embed expression matches the Scala function") {
    GraftFunctions.register(spark)
    val got = Seq("some text here").toDF("t")
      .select(GraftFunctions.hashEmbed($"t", lit(64))).as[Array[Float]].head()
    assert(got.toSeq == HashEmbedder.embed("some text here", 64).toSeq)
  }
}
