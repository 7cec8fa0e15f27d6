package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling / split assignment (operators/Sampling.scala). */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("doc_id")

  test("sample is deterministic, repartition-invariant, and near-fraction") {
    val df = ids(10000)
    val a = Sampling.deterministicSample(df, 0.1).select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.deterministicSample(df.repartition(7), 0.1).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size - 1000) < 150) // ~3 sigma of binomial(10000, 0.1)
    // a different salt draws a different sample
    val c = Sampling.deterministicSample(df, 0.1, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(a != c)
  }

  test("splits partition every row exactly once with stable membership") {
    val df = ids(10000)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.assignSplit(df, splits)
    val counts = assigned.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L)
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") - 8000) < 200)
    // membership is per-key stable: re-assignment is identical
    val again = Sampling.assignSplit(df.repartition(5), splits)
      .as[(Long, String)].collect().toMap
    val first = assigned.as[(Long, String)].collect().toMap
    assert(first == again)
    // sampling predicate pushes to the scan side (no shuffle/state)
    val plan = Sampling.deterministicSample(df, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample added an exchange:\n$plan")
  }

  test("split assignment is streaming-safe: stream membership == batch membership") {
    // deterministic + stateless ⇒ the same expression runs unchanged on a
    // stream, and an id ingested in any micro-batch lands in the same
    // split as the batch assignment — the property that makes a held-out
    // set stable under incremental ingest
    val staging = java.nio.file.Files.createTempDirectory("graft-split-stream").toString
    def write(r: Range): Unit = r.map(_.toLong).toDF("doc_id")
      .write.mode("append").parquet(staging)
    write(0 until 500)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType)))
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val in = spark.readStream.schema(schema).parquet(staging)
    val q = Sampling.assignSplit(in, splits).writeStream
      .outputMode("append").format("memory").queryName("ssplit").start()
    try {
      q.processAllAvailable()
      write(500 until 1000) // second micro-batch
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, split FROM ssplit")
        .as[(Long, String)].collect().toMap
      val batch = Sampling.assignSplit(ids(1000), splits)
        .as[(Long, String)].collect().toMap
      assert(streamed == batch)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ssplit")
    }
  }

  test("fractions must sum to one and be valid") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(ids(10), Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] { Sampling.thresholdHex(1.5) }
  }

  test("stratified sample: per-stratum weights, stable membership, no exchange") {
    val df = (0 until 6000).map(i => (i.toLong, s"s${i % 3}")).toDF("doc_id", "source")
    val mix = Map("s0" -> 1.0, "s1" -> 0.5) // s2 dropped
    val out = Sampling.stratifiedSample(df, mix)
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("s0", "s1"))
    assert(counts("s0") == 2000L) // weight 1.0 keeps every row
    assert(math.abs(counts("s1") - 1000) < 120)
    // a row's membership doesn't change when OTHER strata weights do
    val s1only = Sampling.stratifiedSample(df, Map("s1" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    val s1fromMix = out.filter(col("source") === "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(s1only == s1fromMix)
    // pure scan predicate
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stratified sample added an exchange:\n$plan")
  }

  test("fraction 1.0 is the identity (the ffffffff bucket is kept)") {
    assert(Sampling.deterministicSample(ids(5000), 1.0).count() == 5000L)
    intercept[IllegalArgumentException] {
      Sampling.deterministicSample(ids(5), 1.5)
    }
  }

  test("mixQuotas: integer quotas sum to budget, largest-remainder order") {
    import spark.implicits._
    val docs = ((1 to 90).map(i => (i.toLong, "web")) ++
      (91 to 99).map(i => (i.toLong, "code")) ++
      Seq((100L, "math"))).toDF("doc_id", "source")
    for (b <- Seq(0L, 1L, 7L, 100L, 100003L)) {
      val q = Sampling.mixQuotas(docs, "source", alpha = 0.5, budget = b)
        .select("source", "quota").as[(String, Long)].collect().toMap
      assert(q.values.sum == b, s"budget $b: quotas ${q} do not sum")
      assert(q.values.forall(_ >= 0))
    }
    // quotas track the weights: alpha=1 on 90/9/1 with budget 100 is exact
    val exact = Sampling.mixQuotas(docs, "source", alpha = 1.0, budget = 100L)
      .select("source", "quota").as[(String, Long)].collect().toMap
    assert(exact == Map("web" -> 90L, "code" -> 9L, "math" -> 1L))
    // repartition invariance (the windows fix the fold order)
    val a = Sampling.mixQuotas(docs, "source", alpha = 0.5, budget = 12345L)
      .collect().map(_.toString).toSeq
    val bq = Sampling.mixQuotas(docs.repartition(7), "source", alpha = 0.5,
      budget = 12345L).collect().map(_.toString).toSeq
    assert(a.sorted == bq.sorted)
  }

  test("drawQuotas returns only corpus columns, full mixQuotas frame in") {
    import spark.implicits._
    val docs = ((1 to 90).map(i => (i.toLong, "web")) ++
      (91 to 99).map(i => (i.toLong, "code")) ++
      Seq((100L, "math"))).toDF("doc_id", "source")
    // pass mixQuotas' FULL output (n_docs, weight, quota) — none may leak
    val quotas = Sampling.mixQuotas(docs, "source", alpha = 0.5, budget = 20L)
    val drawn = Sampling.drawQuotas(docs, quotas, "source")
    assert(drawn.columns.sorted.toSeq == Seq("doc_id", "source"),
      s"quota-frame columns leaked: ${drawn.columns.mkString(",")}")
    // per-domain: min(quota, domain size) — shortfall is the contract
    val q = quotas.select("source", "quota").as[(String, Long)].collect().toMap
    val sz = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val got = drawn.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    q.foreach { case (s, n) =>
      assert(got.getOrElse(s, 0L) == math.min(n, sz(s))) }
  }

  test("mixWeights: alpha endpoints and the sqrt rebalance direction") {
    import spark.implicits._
    // 90/9/1 split across three domains.
    val docs = ((1 to 90).map(i => (i.toLong, "web")) ++
      (91 to 99).map(i => (i.toLong, "code")) ++
      Seq((100L, "math"))).toDF("doc_id", "source")
    def weights(alpha: Double): Map[String, Double] =
      Sampling.mixWeights(docs, "source", alpha)
        .select("source", "weight").as[(String, Double)].collect().toMap
    val w1 = weights(1.0) // proportional
    assert(math.abs(w1("web") - 0.90) < 1e-12 && math.abs(w1("math") - 0.01) < 1e-12)
    val w0 = weights(0.0) // uniform
    assert(w0.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12))
    val wh = weights(0.5) // sqrt: between the two, small domains upweighted
    assert(wh("math") > 0.01 && wh("math") < 1.0 / 3)
    assert(wh("web") < 0.90 && wh("web") > 1.0 / 3)
    assert(math.abs(wh.values.sum - 1.0) < 1e-12)
    intercept[IllegalArgumentException] { weights(-1.0) }
  }

  test("cluster-balanced sample: per-cell quota, salted order, reproducible") {
    import graft.operators.IvfIndex
    val r = new scala.util.Random(1212)
    val anchors = Array.fill(4)(Array.fill(8)(r.nextGaussian().toFloat * 4f))
    // skewed cells: cluster 0 has 4x the members of the others
    val data = (0 until 500).map { i =>
      val c = if (i % 8 < 5) 0 else i % 4
      (i.toLong, anchors(c).map(x => x + r.nextGaussian().toFloat * 0.05f))
    }
    val docs = data.toDF("doc_id", "embedding")
    val (withCells, ivf) = IvfIndex.build(docs, nlist = 4)
    val got = Sampling.clusterBalancedSample(docs, ivf, perCell = 7)
      .as[(Long, Long, Long)].collect()
    // quota per cell; rnk dense from 1
    got.groupBy(_._2).foreach { case (cell, rows) =>
      assert(rows.length <= 7, s"cell $cell over quota")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // every trained cell with members contributes (balance, not a skew echo)
    val cellSizes = withCells.groupBy("cell_id").count()
      .as[(Int, Long)].collect().toMap
    cellSizes.foreach { case (cell, size) =>
      val picked = got.count(_._2 == cell)
      assert(picked == math.min(size, 7L), s"cell $cell picked $picked of $size")
    }
    // deterministic draw: selection matches the salted-md5 order replay
    val byCell = withCells.select("doc_id", "cell_id")
      .as[(Long, Int)].collect().groupBy(_._2)
    def bucket(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"balance:$id".getBytes("UTF-8"))
      md.map("%02x".format(_)).mkString.substring(0, 8)
    }
    byCell.foreach { case (cell, members) =>
      val expect = members.map(_._1).sortBy(id => (bucket(id), id)).take(7).toSet
      val gotIds = got.filter(_._2 == cell).map(_._1).toSet
      assert(gotIds == expect, s"cell $cell selection diverged from hash order")
    }
    // reproducible across runs
    val again = Sampling.clusterBalancedSample(docs, ivf, perCell = 7)
      .as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("component-keyed split: a near-dup cluster never straddles splits") {
    // the q127 composition: split on coalesce(comp, doc_id) — every
    // member of a component hashes the same key, so equality is
    // structural; the test pins the wiring (left join + coalesce), and
    // that singletons still spread across splits.
    val comps = Seq((10L, 3L), (11L, 3L), (12L, 3L), (20L, 20L), (21L, 20L))
      .toDF("doc_id", "comp")
    val docs = (0L until 60L).toDF("doc_id")
    val keyed = docs.join(comps, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce($"comp", $"doc_id"))
    val split = Sampling.assignSplit(keyed,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), keyCol = "split_key")
      .select("doc_id", "split_key", "split")
      .as[(Long, Long, String)].collect()
    val byKey = split.groupBy(_._2).view.mapValues(_.map(_._3).distinct)
    byKey.foreach { case (k, ss) =>
      assert(ss.size == 1, s"split key $k straddles splits: $ss")
    }
    assert(split.map(_._3).distinct.size > 1, "singletons must spread")
    // members of comp 3 and comp 20 each landed together
    assert(split.filter(t => Seq(10L, 11L, 12L).contains(t._1))
      .map(_._3).distinct.size == 1)
  }
  test("quota sample takes exactly ceil(frac*n) per stratum, monotone in fraction") {
    val df = (0 until 1000).map(i => (i.toLong, if (i % 3 == 0) "fi" else "en"))
      .toDF("doc_id", "lang")
    val s20 = Sampling.stratifiedQuotaSample(df, 0.2)
      .as[(Long, String)].collect()
    val byLang = s20.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("fi") == math.ceil(334 * 0.2).toInt)
    assert(byLang("en") == math.ceil(666 * 0.2).toInt)
    // repartition-invariant
    val again = Sampling.stratifiedQuotaSample(df.repartition(7), 0.2)
      .as[(Long, String)].collect().toSet
    assert(again == s20.toSet)
    // growing the fraction only ADDS rows (draw order is fraction-free)
    val s40 = Sampling.stratifiedQuotaSample(df, 0.4)
      .as[(Long, String)].collect().toSet
    assert(s20.toSet.subsetOf(s40))
  }

  test("waterfill: saturation, exact budget, remainder order, capacity clamp") {
    import org.apache.spark.sql.functions._
    // skewed fixture: heavy-weight tiny-cap source saturates, the big
    // three split the freed budget
    val src = Seq(("a", 5L, 100L), ("b", 500L, 100L), ("c", 500L, 100L),
      ("d", 500L, 100L)).toDF("source", "cap", "w")
    val got = Sampling.waterfill(src, budget = 300L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // 'a': cap/w = 0.05 << lambda -> saturates at 5; remaining 295 over
    // w=300: floors 98 each (sum 294), remainder 1 -> 'b' (name order)
    assert(got("a") == ((1L, 5L)))
    assert(got("b") == ((0L, 99L)))
    assert(got("c") == ((0L, 98L)) && got("d") == ((0L, 98L)))
    assert(got.values.map(_._2).sum == 300L) // exact budget
    // budget above capacity: everyone saturates at cap
    val all = Sampling.waterfill(src, budget = 99999L)
      .collect().map(r => (r.getLong(3), r.getLong(1), r.getLong(4)))
    assert(all.forall { case (sat, cap, alloc) => sat == 1L && alloc == cap })
  }

  test("esTicket: weight-1 is the bare hash, tickets shrink monotonically in weight") {
    import org.apache.spark.sql.functions._
    val df = (1L to 100L).toDF("k")
    val rows = df.select(col("k"),
      Sampling.esTicket(col("k"), lit(1), "es").as("t1"),
      Sampling.esTicket(col("k"), lit(3), "es").as("t3"),
      Sampling.esTicket(col("k"), lit(9), "es").as("t9"),
      conv(substring(md5(concat_ws(":", lit("es"), col("k").cast("string"),
        lit("1"))), 1, 15), 16, 10).cast("long").as("h1"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(4))      // w=1 ⇒ the single ticket
      assert(r.getLong(2) <= r.getLong(1))      // more tickets ⇒ min can only drop
      assert(r.getLong(3) <= r.getLong(2))
    }
  }

  test("esTicket draw favors heavy rows proportionally (E–S WOR distribution)") {
    import org.apache.spark.sql.functions._
    // 1000 keys at w=1 vs 1000 at w=9: in the top-200 by ticket, heavy
    // rows should win ~90% of slots (each slot independently ~9:1)
    val df = (1L to 2000L).toDF("k")
      .withColumn("w", when(col("k") <= 1000L, 1).otherwise(9))
      .withColumn("t", Sampling.esTicket(col("k"), col("w"), "es"))
    val heavy = df.orderBy("t", "k").limit(200)
      .filter(col("w") === 9).count()
    assert(heavy > 150 && heavy <= 200, s"heavy=$heavy of 200")
  }
}
