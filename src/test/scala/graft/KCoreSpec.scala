package graft

import graft.operators.KCore

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  // undirected helper: emit both directions
  private def sym(pairs: (String, String)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("kCore: triangle with a pendant — 2-core peels the tail") {
    // triangle a-b-c, pendant chain c-d-e: d and e can never keep
    // degree 2, and removing e must drag d out on the NEXT round
    // (the cascade the iteration exists for)
    val edges = sym("a" -> "b", "b" -> "c", "a" -> "c",
      "c" -> "d", "d" -> "e")
    val core = KCore.kCore(edges, k = 2, rounds = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("kCore: k above max degree empties; k=1 keeps everything") {
    val edges = sym("a" -> "b", "b" -> "c")
    assert(KCore.kCore(edges, k = 5, rounds = 3).isEmpty)
    val all = KCore.kCore(edges, k = 1, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all === Map("a" -> 1L, "b" -> 2L, "c" -> 1L))
  }

  test("kCore: bounded rounds equal the fixed point once converged") {
    // long pendant chain into a 4-clique: the chain peels one node
    // per round, so 3 rounds strand part of it while 10 rounds reach
    // the clique-only fixed point — and 10 ≡ 50 (monotone no-ops)
    val clique = for {
      a <- Seq("k1", "k2", "k3", "k4"); b <- Seq("k1", "k2", "k3", "k4")
      if a < b
    } yield (a, b)
    val chain = Seq("k1" -> "p1", "p1" -> "p2", "p2" -> "p3", "p3" -> "p4")
    val edges = sym((clique ++ chain): _*)
    val bounded = KCore.kCore(edges, k = 2, rounds = 3)
      .collect().map(_.getString(0)).toSet
    val fixed = KCore.kCore(edges, k = 2, rounds = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val longer = KCore.kCore(edges, k = 2, rounds = 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bounded.exists(_.startsWith("p"))) // chain not fully peeled yet
    assert(fixed === Map("k1" -> 3L, "k2" -> 3L, "k3" -> 3L, "k4" -> 3L))
    assert(longer === fixed)
    intercept[IllegalArgumentException] { KCore.kCore(edges, 0, 3) }
    intercept[IllegalArgumentException] { KCore.kCore(edges, 2, 0) }
  }
}
