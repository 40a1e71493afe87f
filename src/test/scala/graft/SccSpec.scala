package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Scc

/** Property tests for the forward-backward coloring SCC step
  * ([[Scc.colorScc]]): at convergence (rounds ≥ node count) the
  * output must match a reachability-closure reference — color = min
  * id reaching the node, in_scc = mutual reachability with the color
  * root — and at BOUNDED rounds the flag must stay SOUND (never claim
  * an SCC membership the closure refutes). */
class SccSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int)
      : Map[Long, (Long, Boolean)] =
    Scc.colorScc(edges.toDF("src", "dst"), rounds)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  /** Floyd–Warshall reachability closure over the edge endpoints. */
  private def closure(edges: Seq[(Long, Long)])
      : (Seq[Long], (Long, Long) => Boolean) = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.size
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    (nodes, (a, b) => reach(idx(a))(idx(b)))
  }

  private def randomEdges(trial: Int): Seq[(Long, Long)] = {
    val g = for {
      a <- Gen.chooseNum(0L, 14L)
      b <- Gen.chooseNum(0L, 14L) if a != b
    } yield (a, b)
    (0 until 40).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(trial * 997L + i))).distinct
  }

  test("at convergence the output equals the closure reference") {
    (0 until 6).foreach { trial =>
      val edges = randomEdges(trial)
      val (nodes, reach) = closure(edges)
      val got = run(edges, rounds = nodes.size)
      assert(got.keySet === nodes.toSet)
      nodes.foreach { v =>
        val wantColor = (v +: nodes.filter(u => reach(u, v))).min
        val (gc, gf) = got(v)
        assert(gc === wantColor, s"color of $v, trial $trial")
        val wantScc = wantColor == v || reach(v, wantColor)
        assert(gf === wantScc, s"in_scc of $v, trial $trial")
      }
    }
  }

  test("bounded rounds never overclaim membership (flag soundness)") {
    (0 until 6).foreach { trial =>
      val edges = randomEdges(trial + 100)
      val (_, reach) = closure(edges)
      run(edges, rounds = 2).foreach { case (v, (c, f)) =>
        if (f) assert(c == v || (reach(c, v) && reach(v, c)),
          s"node $v flagged into SCC of $c without mutual reach, " +
            s"trial $trial")
      }
    }
  }

  test("planted shapes: 2-cycle merges, chain does not, rounds=0 is " +
      "the identity coloring") {
    // 1 ⇄ 2 is an SCC; 3 → 4 → 5 is acyclic; 2 → 3 bridges them
    val edges = Seq[(Long, Long)](
      (1L, 2L), (2L, 1L), (3L, 4L), (4L, 5L), (2L, 3L))
    val got = run(edges, rounds = 5)
    assert(got(1L) === ((1L, true)) && got(2L) === ((1L, true)))
    // chain nodes are colored by 1 (it reaches them) but are NOT in
    // its SCC — the honest unflagged remainder the full algorithm
    // would recurse on
    Seq(3L, 4L, 5L).foreach { v =>
      assert(got(v)._1 === 1L && !got(v)._2, s"chain node $v")
    }
    val r0 = run(edges, rounds = 0)
    assert(r0.forall { case (v, (c, f)) => c == v && f })
  }
}
