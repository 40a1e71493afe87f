package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric triangle stays uniform (fixed point)") {
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("a", "c"), ("c", "a")).toDF("src", "dst")
    val r = PageRank.pageRank(edges, iters = 4).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    // uniform start on a regular graph is the exact fixed point
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("star center outranks leaves; total mass is conserved") {
    // hub h ↔ leaves l1..l4 (symmetrized, so no dangling nodes)
    val leaves = (1 to 4).map(i => s"l$i")
    val edges = leaves.flatMap(l => Seq(("h", l), (l, "h")))
      .toDF("src", "dst")
    val r = PageRank.pageRank(edges, iters = 20).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    leaves.foreach(l => assert(r("h") > r(l)))
    // closed recurrence conserves total rank mass at 1
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // analytic limit for the symmetrized star: hub = (1+4d)/(5(1+d));
    // the hub↔leaf error alternates and decays by d² per two rounds,
    // so 20 rounds leaves ~d²⁰·e₀ ≈ 0.01
    val d = 0.85
    assert(math.abs(r("h") - (1 + 4 * d) / (5 * (1 + d))) < 0.02)
  }

  test("small rank vectors broadcast: no per-superstep edge shuffle") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val plan = PageRank.pageRank(edges, iters = 3)
      .queryExecution.executedPlan.toString
    // every superstep's ranks⋈edges must be a broadcast-hash join — a
    // shuffle join there would re-exchange the checkpointed edge list
    // (whose partitioning a checkpoint erases) once per iteration.
    // (The small nodes⋈sums LEFT join may still print as SMJ pre-AQE;
    // both its sides are rank-vector-sized, so it's not the frame that
    // matters and AQE converts it at runtime.)
    val bhjCount = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhjCount >= 3,
      s"expected >= 3 broadcast superstep joins, got $bhjCount:\n$plan")
  }
}
