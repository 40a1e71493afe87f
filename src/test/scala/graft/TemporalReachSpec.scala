package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.TemporalReach

/** Earliest-arrival temporal reachability ([[TemporalReach]]): at
  * convergence (rounds ≥ node count — time-respecting earliest-arrival
  * paths never need to revisit a node, see operator scaladoc) the
  * output must equal an in-memory fixed-point reference; planted
  * shapes pin the defining semantics — a chain whose second edge
  * departs before the first arrives is NOT a path. */
class TemporalReachSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      start: Long, rounds: Int): Map[Long, Long] =
    TemporalReach.earliestArrival(
        edges.toDF("src", "dst", "ts"),
        seeds.toDF("node"), lit(start), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Fixed-point in-memory reference of the min-arrival DP. */
  private def ref(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      start: Long): Map[Long, Long] = {
    var arr = seeds.map(_ -> start).toMap
    var changed = true
    while (changed) {
      changed = false
      val next = edges.flatMap { case (s, d, t) =>
        arr.get(s).filter(t >= _).map(_ => d -> t)
      }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val merged = (arr.keySet ++ next.keySet).map { n =>
        n -> math.min(arr.getOrElse(n, Long.MaxValue),
          next.getOrElse(n, Long.MaxValue))
      }.toMap
      if (merged != arr) { arr = merged; changed = true }
    }
    arr
  }

  test("at convergence the output equals the fixed-point reference") {
    val g = for {
      a <- Gen.chooseNum(0L, 11L)
      b <- Gen.chooseNum(0L, 11L) if a != b
      t <- Gen.chooseNum(1L, 9L)
    } yield (a, b, t)
    (0 until 6).foreach { trial =>
      val edges = (0 until 35).flatMap(i =>
        g.apply(Gen.Parameters.default, Seed(trial * 131L + i))).distinct
      val seeds = Seq(0L, 1L)
      val n = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
      val got = run(edges, seeds, start = 0L, rounds = n + 1)
      assert(got === ref(edges, seeds, start = 0L), s"trial $trial")
    }
  }

  test("time must not run backwards along a path") {
    // 1 -(t=5)-> 2 -(t=3)-> 3 : node 3 unreachable (3 < 5);
    // adding 2 -(t=7)-> 3 reaches it at 7, not 3
    val seeds = Seq(1L)
    val g1 = run(Seq((1L, 2L, 5L), (2L, 3L, 3L)), seeds, 0L, rounds = 4)
    assert(g1 === Map(1L -> 0L, 2L -> 5L))
    val g2 = run(Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 3L, 7L)),
      seeds, 0L, rounds = 4)
    assert(g2(3L) === 7L, "late edge is the only valid continuation")
    // a seed's own clock gates its FIRST edge too
    val g3 = run(Seq((1L, 2L, 5L)), seeds, start = 6L, rounds = 2)
    assert(!g3.contains(2L), "edge departing before start was taken")
  }

  test("earlier indirect beats later direct; rounds are monotone") {
    // direct 1->4 at t=9; indirect 1->2->4 arriving t=4
    val edges = Seq((1L, 4L, 9L), (1L, 2L, 2L), (2L, 4L, 4L))
    assert(run(edges, Seq(1L), 0L, rounds = 1)(4L) === 9L)
    assert(run(edges, Seq(1L), 0L, rounds = 2)(4L) === 4L)
  }
}
