package graft

import graft.operators.CheapestPath

class CheapestPathSpec extends SparkSpec {
  import spark.implicits._

  test("cheapestPaths: cheap detour beats the direct edge") {
    // a -> d costs 10 direct, but a -> b -> c -> d costs 3; with only
    // 2 rounds the 3-hop detour is out of reach and direct wins
    val edges = Seq(("a", "d", 10L), ("a", "b", 1L), ("b", "c", 1L),
      ("c", "d", 1L)).toDF("src", "dst", "w")
    val srcs = Seq("a").toDF("node")
    val full = CheapestPath.cheapestPaths(edges, srcs, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
    val bounded = CheapestPath.cheapestPaths(edges, srcs, rounds = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bounded("d") === 10L && bounded("c") === 2L)
  }

  test("cheapestPaths: multi-source min, cycles, unreachable, convergence") {
    // cycle b <-> c must not loop costs downward; z is source-only;
    // e is unreachable and must be absent, not infinite
    val edges = Seq(("a", "b", 5L), ("z", "b", 1L), ("b", "c", 2L),
      ("c", "b", 2L), ("d", "e", 1L)).toDF("src", "dst", "w")
    val srcs = Seq("a", "z").toDF("node")
    val r = CheapestPath.cheapestPaths(edges, srcs, rounds = 10)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("a" -> 0L, "z" -> 0L, "b" -> 1L, "c" -> 3L))
    // converged early (graph diameter 2) — a longer run is identical
    val longer = CheapestPath.cheapestPaths(edges, srcs, rounds = 40)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(longer === r)
    // rounds = 0 returns just the sources at 0
    val none = CheapestPath.cheapestPaths(edges, srcs, rounds = 0)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(none === Map("a" -> 0L, "z" -> 0L))
    intercept[IllegalArgumentException] {
      CheapestPath.cheapestPaths(edges, srcs, rounds = -1)
    }
  }

  test("cheapestPaths: a source reached cheaper via another source stays 0") {
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val r = CheapestPath.cheapestPaths(edges,
        Seq("a", "b").toDF("node"), rounds = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("a" -> 0L, "b" -> 0L))
  }
}
