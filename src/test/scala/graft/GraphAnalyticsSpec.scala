package graft

import graft.operators.GraphAnalytics
import org.scalatest.funsuite.AnyFunSuite

class GraphAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // Two triangles sharing node 3 — {1,2,3} and {3,4,5} — plus an isolated
  // edge {6,7}. Directed input with both duplicate and reversed edges to
  // exercise the canonical orientation's dedup.
  private def g = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), // triangle A (3-1 both ways)
    (3L, 4L), (4L, 5L), (5L, 3L),           // triangle B
    (6L, 7L), (7L, 6L),                     // isolated edge, both ways
    (4L, 4L)                                // self-loop: ignored
  ).toDF("src", "dst")

  test("triangleStats counts each triangle once and computes lcc") {
    val rows = GraphAnalytics.triangleStats(g)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // node 3 sits in both triangles, degree 4 → lcc = 2·2/(4·3) = 1/3
    assert(rows(3L)._1 == 2L && rows(3L)._2 == 4L)
    assert(math.abs(rows(3L)._3 - 1.0 / 3.0) < 1e-12)
    // the other four triangle corners: 1 triangle, degree 2 → lcc 1.0
    for (n <- Seq(1L, 2L, 4L, 5L)) {
      assert(rows(n)._1 == 1L, s"node $n")
      assert(rows(n)._2 == 2L && rows(n)._3 == 1.0)
    }
    // nodes without triangles (6, 7) are absent by join semantics
    assert(!rows.contains(6L) && !rows.contains(7L))
  }

  test("wccCensus converges to the exact component census once rounds cover the diameter") {
    val census = GraphAnalytics.wccCensus(g, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // {1..5} is one component labeled by its min id; {6,7} another.
    // The self-loop on 4 adds no node and no component.
    assert(census == Map(1L -> 5L, 6L -> 2L))
  }

  test("kcorePeel strips the tendrils and keeps the dense core") {
    // K4 on {1,2,3,4} (every node degree 3) plus a tail 4-8-9: the tail
    // dies in two rounds of k=2 peeling (9 has degree 1; then 8), the
    // clique survives any number of rounds
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val g = (k4 ++ Seq((4L, 8L), (8L, 9L))).toDF("src", "dst")
    val rows = graft.operators.GraphAnalytics.kcorePeel(g, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(1L) == ((5L, 7L))) // 9 dropped; 1-2-3-4-8 alive, 7 edges
    assert(rows(2L) == ((4L, 6L))) // 8 dropped; K4 = 4 nodes, 6 edges
    assert(rows(3L) == ((4L, 6L))) // fixpoint: the true 2-core
  }

  test("assortativity: star graph is exactly -1, regular cycle reports 0") {
    import org.apache.spark.sql.functions.col
    val star = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val rStar = GraphAnalytics.assortativity(star).collect().head
    assert(rStar.getLong(0) == 4L && rStar.getLong(1) == 8L)
    assert(rStar.getDouble(2) == -1.0) // (4,1)/(1,4) pairs correlate exactly -1
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rCyc = GraphAnalytics.assortativity(cycle).collect().head
    assert(rCyc.getDouble(2) == 0.0) // all degrees equal: zero variance → 0
  }

  test("assortativity survives sums whose BIGINT products would wrap past 2^63") {
    // K_n plus one pendant leaf on node 0, n chosen so the denominator's
    // M·Σx² product exceeds Long.MaxValue: with longs this aborts (ANSI)
    // or wraps (ANSI off); the DECIMAL(38,0) form must return the exact
    // closed-form r. Degrees: node 0 = n, clique nodes = n−1, leaf = 1.
    import org.apache.spark.sql.functions.{col, lit}
    val n = 1500L
    val r = spark.range(n)
    val clique = r.select(col("id").as("src"))
      .crossJoin(r.select(col("id").as("dst")))
      .filter(col("src") < col("dst"))
    val edges = clique.unionAll(
      spark.range(1).select(lit(0L).as("src"), lit(n).as("dst")))
    val row = GraphAnalytics.assortativity(edges).collect().head
    // closed-form sums over DIRECTED edges, exact in BigInt
    val N = BigInt(n)
    val m = N * (N - 1) + 2
    val sx = N * N + (N - 1).pow(3) + 1              // Σ deg(src)^2 over nodes
    val sxx = N.pow(3) + (N - 1).pow(4) + 1          // Σ deg(src)^3
    val sxy = 2 * ((N - 1) * N * (N - 1) +
      (N - 1) * (N - 2) / 2 * (N - 1) * (N - 1) + N) // 2·Σ_undirected da·db
    assert(m * sxx > BigInt(Long.MaxValue),
      "fixture too small: the BIGINT product would not have wrapped")
    val expected = (m * sxy - sx * sx).toDouble / (m * sxx - sx * sx).toDouble
    assert(row.getLong(0) == (m / 2).toLong && row.getLong(1) == m.toLong)
    assert(math.abs(row.getDouble(2) - expected) < 1e-6,
      s"got ${row.getDouble(2)}, expected ~$expected")
  }

  test("twoHopBallSizes: path graph balls are exact, self excluded, islands separate") {
    // Path 1-2-3-4-5: ball(1)={2,3}, ball(2)={1,3,4}, ball(3)={1,2,4,5};
    // isolated pair 10-11: ball=1 each
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val balls = GraphAnalytics.twoHopBallSizes(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(balls == Map(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 3L, 5L -> 2L,
      10L -> 1L, 11L -> 1L))
  }

  test("bfsHops censuses exact hop distances out to the round bound") {
    import org.apache.spark.sql.functions.col
    // Path 1-2-3-4-5 plus an isolated pair 10-11; seed = node 1 only.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val r2 = GraphAnalytics.bfsHops(path, col("node") === 1L, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hops 0..2 reached; 4, 5 and the 10-11 island absent
    assert(r2 == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    val r4 = GraphAnalytics.bfsHops(path, col("node") === 1L, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r4 == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // multi-source: seeds at both ends meet in the middle
    val ends = GraphAnalytics.bfsHops(path,
        col("node") === 1L || col("node") === 5L, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ends == Map(0L -> 2L, 1L -> 2L, 2L -> 1L))
  }

  test("wccCensus with too few rounds is a refinement in progress, never a wrong merge") {
    // A path 10-11-12-13-14 has diameter 4; after 1 round labels have
    // traveled at most 1 hop, so the census splits the path — but every
    // label is still a true member of the component (min over a subset).
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
      .toDF("src", "dst")
    val r1 = GraphAnalytics.wccCensus(path, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1.values.sum == 5L)      // every node counted exactly once
    assert(r1.keySet.min == 10L)     // min label present
    assert(r1.size > 1)              // not yet converged at 1 round
    val r4 = GraphAnalytics.wccCensus(path, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r4 == Map(10L -> 5L))     // diameter covered → exact
  }
}
