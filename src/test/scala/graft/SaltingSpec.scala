package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // Heavily skewed: one hot key with 10k rows, 10 cold keys
  private lazy val skewed = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
    (1 to 10).flatMap(k => Seq((s"cold$k", k.toDouble))))
    .toDF("key", "value").repartition(8)

  test("salted aggregate equals direct aggregate") {
    val direct = skewed.groupBy("key")
      .agg(sum("value").as("s"), count("value").as("n"),
        min("value").as("mn"), max("value").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Salting.saltedAggregate(skewed, Seq("key"), buckets = 16,
      Map("s" -> (col("value"), "sum"), "n" -> (col("value"), "count"),
        "mn" -> (col("value"), "min"), "mx" -> (col("value"), "max")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, n, mn, mx)) =>
      val (ds, dn, dmn, dmx) = direct(k)
      assert(n == dn && mn == dmn && mx == dmx)
      assert(math.abs(s - ds) < 1e-6) // double sum order differs
    }
  }

  test("salted join equals plain join and spreads the hot key") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("cold2", "C2"))
      .toDF("key", "label")
    val plain = skewed.join(dim, "key").groupBy("key", "label")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Salting.saltedJoin(skewed, dim, "key", buckets = 8)
      .groupBy("key", "label").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
    assert(salted.exists { case (k, _, n) => k == "hot" && n == 10000L })
  }

  test("salting actually spreads the hot key over multiple buckets") {
    // a degenerate constant salt would pass the equality tests above —
    // verify the hot key's partial groups really fan out
    val partials = Salting.saltedAggregate(skewed, Seq("key"), buckets = 16,
      Map("n" -> (col("value"), "count")))
    assert(partials.count() == 11) // final shape unchanged
    val df = skewed.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(16)))
    val hotSalts = df.filter(col("key") === "hot")
      .select(countDistinct("__salt")).as[Long].head()
    assert(hotSalts > 4, s"hot key landed on only $hotSalts salt buckets")
  }

  test("salted aggregate plan is two-phase: salt exchange then key exchange") {
    val plan = Salting.saltedAggregate(skewed, Seq("key"), buckets = 16,
      Map("n" -> (col("value"), "count")))
      .queryExecution.executedPlan.toString
    // partial phase shuffles on (key, __salt), final phase on key alone —
    // a regression to a single-phase groupBy would drop the salt exchange
    // and put the hot key back on one reducer.
    assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
    val exchanges = "hashpartitioning\\(".r.findAllIn(plan).length
    assert(exchanges >= 2, s"expected two hash exchanges, got $exchanges:\n$plan")
  }

  test("non-decomposable aggregate is rejected") {
    intercept[IllegalArgumentException] {
      Salting.saltedAggregate(skewed, Seq("key"), 4,
        Map("bad" -> (col("value"), "avg")))
    }
  }
}
