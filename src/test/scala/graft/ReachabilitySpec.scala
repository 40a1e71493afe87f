package graft

import org.apache.spark.sql.functions._
import graft.operators.Reachability

class ReachabilitySpec extends SparkSpec {
  import spark.implicits._

  test("hopDistances: BFS min-depth on a path with a shortcut") {
    // a -> b -> c -> d, plus shortcut a -> d: d is 1 hop, not 3
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))
      .toDF("src", "dst")
    val srcs = Seq("a").toDF("node")
    val r = Reachability.hopDistances(edges, srcs, maxDepth = 5)
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(r === Map("a" -> 0, "b" -> 1, "d" -> 1, "c" -> 2))
  }

  test("hopDistances: depth bound, cycles, unreachable, isolated source") {
    // cycle a <-> b must not loop; e unreachable; z is an edge-less
    // source that still surfaces at depth 0; depth capped at 1
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "e"))
      .toDF("src", "dst")
    val srcs = Seq("a", "z").toDF("node")
    val r = Reachability.hopDistances(edges, srcs, maxDepth = 1)
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(r === Map("a" -> 0, "z" -> 0, "b" -> 1))
    // a source reachable from another source keeps depth 0
    val r2 = Reachability.hopDistances(edges,
        Seq("a", "b").toDF("node"), maxDepth = 3)
      .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(r2("a") === 0 && r2("b") === 0 && r2("c") === 1
      && r2("e") === 2)
    intercept[IllegalArgumentException] {
      Reachability.hopDistances(edges, srcs, maxDepth = -1)
    }
  }
}
