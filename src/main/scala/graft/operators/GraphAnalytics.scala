package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-analytics kernels over a directed edge list (`src`, `dst`) —
  * the analysis tier for the persisted k-NN graph (GraphSearch walks it,
  * these summarize it): triangle closure and connectivity census, the
  * two standard curation signals (tight clusters = near-dup / template
  * families; isolated components = off-topic islands).
  *
  * All kernels are exact-integer (counts, min-labels) so results are
  * bit-identical under any partitioning and sit directly under the
  * DuckDB hash oracle; the only floating output (the local clustering
  * coefficient) is a single division left unrounded for callers to
  * round at the presentation edge.
  */
object GraphAnalytics {

  /** Canonical undirected edge set: orient every edge low→high and
    * dedup — each undirected edge appears exactly once as (a < b). */
  def undirectedEdges(g: DataFrame): DataFrame =
    g.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()

  /** Per-node triangle participation + degree + local clustering
    * coefficient. Each triangle {x<y<z} is enumerated exactly once as
    * two oriented wedge joins closed by a third edge — equi-joins only,
    * so the plan is three shuffle-hash/broadcast joins with no row
    * visited per triangle more than once. Orientation here is by id;
    * the general form for skewed graphs orients by (degree, id) to
    * bound wedge fan-out — a k-NN graph's degree is capped by the build
    * (k out-edges, ≤ cap in-edges per cell) so id orientation is safe.
    * Nodes with no triangles are absent (join semantics — callers
    * wanting zeros outer-join the degree table). */
  def triangleStats(g: DataFrame): DataFrame = {
    val e = undirectedEdges(g)
    val tri = e.as("e1")
      .join(e.as("e2"),
        col("e2.a") === col("e1.a") && col("e2.b") > col("e1.b"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.b") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast("long").as("n_tri"))
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("deg"))
    perNode.join(deg, Seq("node"))
      .select(col("node"), col("n_tri"), col("deg"),
        when(col("deg") > 1,
          col("n_tri") * lit(2.0) / (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0.0)).as("lcc"))
  }

  /** Bounded k-core peel: `rounds` FIXED rounds of "drop every node
    * whose undirected degree among still-alive nodes is < k", reporting
    * per round the surviving node and edge counts. Fixed rounds keep
    * the result deterministic and unrolled-CTE-replayable (the q216
    * stance); the survivor set after R rounds is an upper bound on the
    * true k-core that is exact once a round removes nothing. The
    * k-core is the density skeleton of the corpus graph — survivors
    * are documents embedded in mutually-dense semantic neighborhoods
    * (template/boilerplate families first among them), the complement
    * of the q216 isolates. Per round: one semi-join per endpoint + one
    * degree aggregation — alive-set state is one id column, never the
    * corpus. */
  def kcorePeel(g: DataFrame, k: Int, rounds: Int): DataFrame = {
    // the peel is a genuine fold — round r's edge set feeds round r+1 —
    // so each round's surviving EDGE set persists and the previous one
    // unpersists (the lazy chained form replays round 1..r−1 inside
    // every round-r subtree: O(rounds²) exchanges, measured ~8× this
    // form at 3 rounds); counts are per-round actions over the persisted
    // state, never a recompute
    var e = g.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .unionAll(g.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val out = (1 to rounds).map { r =>
      val alive = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("node"))
      val e2 = e
        .join(alive.withColumnRenamed("node", "src"), Seq("src"), "leftsemi")
        .join(alive.withColumnRenamed("node", "dst"), Seq("dst"), "leftsemi")
        .persist()
      val nAlive = alive.count()
      val nEdges = e2.count() / 2
      e.unpersist()
      e = e2
      (r.toLong, nAlive, nEdges)
    }
    e.unpersist()
    val sp = g.sparkSession
    import sp.implicits._
    out.toDF("round", "n_alive", "n_edges")
  }

  /** Degree assortativity of the symmetrized graph — the Pearson
    * correlation of endpoint degrees over directed edge instances, the
    * one-number health signal for hub structure (negative = hubs attach
    * to leaves, the usual k-NN shape; positive = rich-club). Because
    * the edge list is symmetrized, the two endpoint-degree marginals
    * are IDENTICAL, so r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²) — degrees
    * are exact BIGINTs, the sums and their products are carried in
    * DECIMAL(38,0) (exact integer arithmetic, associative, any
    * partitioning), and the result is ONE IEEE division (no sqrt),
    * bit-equal on any engine. The DECIMAL promotion is load-bearing at
    * scale: over ~10¹¹ directed edges with hub degrees ~10⁴,
    * M·Σ(da·db) ≈ 10³⁰ — a BIGINT product wraps (ANSI off) or aborts
    * (ANSI on) near 2⁶³, while DECIMAL(38,0) holds to 10³⁸
    * (GraphAnalyticsSpec pins a graph whose products exceed
    * Long.MaxValue and the q237 affinity sums use the same
    * discipline). Zero variance (a regular graph) reports 0.0.
    * Plan: one degree aggregation + two broadcast-or-shuffle joins on
    * the edge key + one global fold. */
  def assortativity(g: DataFrame): DataFrame = {
    val und = g.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .unionAll(g.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = und.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
    val dec = "decimal(38,0)"
    val sums = und
      .join(deg.select(col("src"), col("deg").as("da")), Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("db")), Seq("dst"))
      .agg(count(lit(1)).cast("long").as("m"),
        sum(col("da").cast(dec)).cast(dec).as("sx"),
        sum(col("da").cast(dec) * col("da").cast(dec)).cast(dec).as("sxx"),
        sum(col("da").cast(dec) * col("db").cast(dec)).cast(dec).as("sxy"))
    val mD = col("m").cast(dec)
    sums.select(
      expr("m div 2").as("n_edges"),
      col("m"),
      when(mD * col("sxx") - col("sx") * col("sx") > 0,
        (mD * col("sxy") - col("sx") * col("sx")).cast("double") /
          (mD * col("sxx") - col("sx") * col("sx")).cast("double"))
        .otherwise(lit(0.0)).as("r"))
      .select(col("n_edges"), col("m").as("n_directed"),
        round(col("r"), 6).as("assortativity"))
  }

  /** Multi-source BFS hop census: seed nodes (those satisfying
    * `seedPred` over the node id) start at hop 0, then `rounds` FIXED
    * rounds of `hop'(v) = min(hop(v), min over neighbors u of
    * hop(u)+1)` over the symmetrized graph; the result is the census of
    * REACHED nodes per hop distance (unreached nodes are absent — join
    * semantics, same stance as [[triangleStats]]). After R rounds a
    * node's hop is its true BFS distance iff ≤ R, so the census is
    * exact out to the round bound and refines monotonically with more
    * rounds — deterministic and unrolled-CTE-replayable (the q216
    * stance: integer min is associative and order-free). Per round: one
    * join shuffle + one min-aggregation shuffle on the node key; the
    * frontier state is (node, hop), never the corpus. The census reads
    * corpus reachability from a seed family — how much of the k-NN
    * graph sits within R semantic hops of, e.g., a curated seed set. */
  def bfsHops(g: DataFrame, seedPred: org.apache.spark.sql.Column,
              rounds: Int): DataFrame = {
    val und = g.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .unionAll(g.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val nodes = und.select(col("src").as("node")).distinct()
    var dist = nodes.filter(seedPred).select(col("node"), lit(0L).as("hop"))
    for (_ <- 1 to rounds) {
      val nb = und.join(dist.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), (col("hop") + 1).as("hop"))
      dist = dist.unionAll(nb).groupBy("node").agg(min("hop").as("hop"))
    }
    dist.groupBy("hop").agg(count(lit(1)).cast("long").as("n_nodes"))
  }

  /** 2-hop neighborhood (ball) size per node: |{v ≠ u : dist(u,v) ≤ 2}|
    * over the symmetrized graph — the local-density sizing signal
    * between q215's triangles (closure) and q224's global BFS (reach):
    * how much corpus a 2-hop graph walk from each node can touch, i.e.
    * the candidate-set size bound for the beam-search tier. One
    * self-join on the shared endpoint + one distinct + one count per
    * node; fan-out is bounded by degree² (a k-NN graph's degree is
    * capped by the build, so the intermediate is ≤ cap² per node,
    * never corpus-quadratic). */
  def twoHopBallSizes(g: DataFrame): DataFrame = {
    val und = g.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .unionAll(g.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val twoHop = und.as("e1")
      .join(und.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("src"), col("e2.dst").as("dst"))
    und.unionAll(twoHop)
      .filter(col("src") =!= col("dst"))
      .distinct()
      .groupBy("src").agg(count(lit(1)).cast("long").as("ball"))
  }

  /** Weakly-connected-component census via min-label propagation,
    * `rounds` FIXED rounds (not run-to-fixpoint: a fixed round count is
    * deterministic on any engine and replayable by an unrolled-CTE
    * oracle; after R rounds a node holds the min id within distance R,
    * so the census is exact once R ≥ the component diameter and a
    * refinable upper bound below it). Each round: one join shuffle +
    * one min-aggregation shuffle on the node key — the iterative-graph
    * plan with min() as the combiner, lineage `rounds` deep. */
  def wccCensus(g: DataFrame, rounds: Int): DataFrame = {
    val und = g.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .unionAll(g.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val nodes = und.select(col("src").as("node")).distinct()
    var lab = nodes.select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to rounds) {
      val nb = und.join(lab.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("lbl"))
      lab = lab.unionAll(nb).groupBy("node").agg(min("lbl").as("lbl"))
    }
    lab.groupBy(col("lbl").as("component"))
      .agg(count(lit(1)).cast("long").as("n_nodes"))
  }
}
