package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hits, PageRank}

/** The two query-shaped centralities added next to global PageRank:
  * HITS (two-role, bipartite-aware) and personalized PageRank
  * (seed-teleport). Both are judged end-to-end by DuckDB CTE oracles
  * (`graph_hits`, `graph_ppr`); these specs pin the analytic
  * properties the oracles can't see — fixed points, mass conservation,
  * seed locality — plus the superstep plan shape. */
class HitsPprSpec extends SparkSpec {
  import spark.implicits._

  test("HITS: complete bipartite graph is uniform (fixed point)") {
    val edges = (for { c <- 1 to 3; s <- 1 to 4 }
      yield (s"c$c", s"s$s")).toDF("src", "dst")
    val r = Hits.hits(edges, iters = 3).collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2)))
    r.foreach { case (n, hub, auth) =>
      if (n.startsWith("c")) {
        assert(math.abs(hub - 1.0 / 3) < 1e-12, s"hub($n)=$hub")
        assert(auth == 0.0)
      } else {
        assert(math.abs(auth - 1.0 / 4) < 1e-12, s"auth($n)=$auth")
        assert(hub == 0.0)
      }
    }
  }

  test("HITS: authority favored by strong hubs wins; L1 mass = 1") {
    // h1 points at {a1, a2}, h2..h4 point only at a1 ⇒ a1 ≫ a2, and
    // h1 (which found both) out-hubs the single-link hubs
    val edges = (Seq(("h1", "a1"), ("h1", "a2")) ++
      (2 to 4).map(i => (s"h$i", "a1"))).toDF("src", "dst")
    val r = Hits.hits(edges, iters = 4).collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2)))
      .toMap
    assert(r("a1")._2 > r("a2")._2)
    assert(r("h1")._1 > r("h2")._1)
    val hubMass = r.values.map(_._1).sum
    val authMass = r.values.map(_._2).sum
    assert(math.abs(hubMass - 1.0) < 1e-9)
    assert(math.abs(authMass - 1.0) < 1e-9)
  }

  test("PPR: mass concentrates on the seed side of the chain") {
    // chain a — b — c — d (symmetrized); seed {a}. NOT monotone in
    // distance — degree-1 `a` donates ALL its rank to `b` each round,
    // so the fixed point is b > a > c > d (verified numerically:
    // ≈ .358/.302/.238/.101). The robust claims: the seed HALF holds
    // the bulk of the mass, each seed-side node beats its mirror, and
    // the far end is last.
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val r = PageRank.personalizedPageRank(edges, seeds, iters = 24)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("a") + r("b") > 0.6)
    assert(r("a") > r("d") && r("b") > r("c")) // mirror pairs
    assert(r("c") > r("d")) // far end last
    // no dangling nodes on a symmetrized chain ⇒ mass conserved
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("PPR: seeds outside the graph are ignored; uniform-seed PPR " +
    "equals global PageRank") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    // seeding EVERY node makes the teleport vector uniform — the
    // recurrence degenerates to exactly pageRank's
    val seeds = Seq("a", "b", "c", "zzz-not-in-graph").toDF("node")
    val ppr = PageRank.personalizedPageRank(edges, seeds, iters = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val pr = PageRank.pageRank(edges, iters = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    pr.foreach { case (n, v) => assert(math.abs(ppr(n) - v) < 1e-12) }
  }

  test("PPR rejects degenerate damping (1.0 would poison ranks " +
    "with 0/0 NaN)") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      PageRank.personalizedPageRank(edges, Seq("a").toDF("node"),
        iters = 1, damping = 1.0)
    }
    intercept[IllegalArgumentException] {
      PageRank.personalizedPageRank(edges, Seq("a").toDF("node"),
        iters = 1, damping = 0.0)
    }
  }

  test("superstep joins broadcast the score vector (plan shape)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"))
      .toDF("src", "dst")
    // pinEachRound=false: the eager per-round checkpoint would
    // materialize the superstep joins before this plan is printed
    val hitsPlan = Hits.hits(edges, iters = 2, pinEachRound = false)
      .queryExecution.executedPlan.toString
    // 2 iterations × 2 half-steps, each a score⋈edges broadcast join
    assert("BroadcastHashJoin".r.findAllIn(hitsPlan).length >= 4,
      s"HITS supersteps must broadcast the score vector:\n$hitsPlan")
    val pprPlan = PageRank
      .personalizedPageRank(edges, Seq("a").toDF("node"), iters = 3)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(pprPlan).length >= 3,
      s"PPR supersteps must broadcast the rank vector:\n$pprPlan")
  }
}
