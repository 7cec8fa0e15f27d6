package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val K = 64

  private def itemsDf(grp: String, items: Seq[String]) =
    items.map((grp, _)).toDF("grp", "item")

  test("sketch of fewer than k distinct values is the exact set and estimates exactly") {
    val df = itemsDf("a", (1 to 40).map(i => s"item-$i") ++ Seq("item-1", "item-2"))
    val sk = Sketches.kmvSketch(df, "grp", "item", K)
    val row = sk.select(col("sketch"), round(Sketches.estimate(col("sketch"), K), 4))
      .head()
    assert(row.getSeq[Long](0).length == 40) // dups collapsed
    assert(row.getDouble(1) == 40.0)         // exact below k
  }

  test("estimate lands within 3 standard errors of the true cardinality") {
    // KMV relative standard error ~ 1/sqrt(k-2) ≈ 12.7% at k=64
    val n = 5000
    val df = itemsDf("a", (1 to n).map(i => s"value-$i"))
    val est = Sketches.kmvSketch(df, "grp", "item", K)
      .select(Sketches.estimate(col("sketch"), K)).head().getDouble(0)
    val rse = 1.0 / math.sqrt(K - 2.0)
    assert(math.abs(est - n) < 3 * rse * n, s"est=$est for n=$n")
  }

  test("merged sketch equals the sketch of the union (mergeability)") {
    val aItems = (1 to 3000).map(i => s"a-$i") ++ (1 to 1000).map(i => s"c-$i")
    val bItems = (1 to 2000).map(i => s"b-$i") ++ (1 to 1000).map(i => s"c-$i")
    val sk = Sketches.kmvSketch(
      itemsDf("a", aItems).union(itemsDf("b", bItems)), "grp", "item", K)
    val merged = sk.filter(col("grp") === "a").select(col("sketch").as("sa"))
      .crossJoin(sk.filter(col("grp") === "b").select(col("sketch").as("sb")))
      .select(Sketches.merge(col("sa"), col("sb"), K))
      .head().getSeq[Long](0)
    val direct = Sketches.kmvSketch(
      itemsDf("u", aItems ++ bItems), "grp", "item", K)
      .select(col("sketch")).head().getSeq[Long](0)
    assert(merged == direct)
  }

  test("CM sketch never undercounts, is exact sans collisions, zero for absent keys") {
    val depth = 4
    val width = 4096
    val occurrences = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val toks = occurrences.toDF("token")
    val sk = Sketches.cmSketch(toks, "token", depth, width)
    // total mass per row = total occurrences
    val perRow = sk.groupBy("r").agg(sum("v")).collect()
      .map(r => r.getLong(1))
    assert(perRow.length == depth && perRow.forall(_ == occurrences.length))
    val exact = Map("alpha" -> 5L, "beta" -> 3L, "gamma" -> 1L, "absent" -> 0L)
    val probes = exact.keys.toSeq.toDF("token")
    val est = Sketches.cmEstimate(probes, "token", Seq.empty, sk, depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // never undercounts; with 3 keys in 4096 cells any same-cell collision
    // in ALL 4 rows is impossible, so estimates are exact here
    exact.foreach { case (t, n) => assert(est(t) == n, s"token $t") }
  }

  test("CM merge is cell-wise addition ≡ the sketch of the concatenated input") {
    val depth = 4
    val width = 512
    val a = (Seq.fill(7)("x") ++ Seq.fill(2)("y")).toDF("token")
    val b = (Seq.fill(4)("y") ++ Seq.fill(3)("z")).toDF("token")
    val merged = Sketches.cmMerge(
      Sketches.cmSketch(a, "token", depth, width),
      Sketches.cmSketch(b, "token", depth, width))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Sketches.cmSketch(a.unionAll(b), "token", depth, width)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == direct)
  }

  test("hash points are the conv(md5-prefix) idiom (oracle parity pin)") {
    // the DuckDB side casts '0x' || substr(md5(x),1,15); pin one value
    // computed independently so neither side can drift silently
    val h = Seq("abc").toDF("x").select(Sketches.hashPoint(col("x")))
      .head().getLong(0)
    assert(h == 648541476951500027L) // CAST('0x900150983cd24fb' AS BIGINT)
  }
}
