package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Hits, PageRank}

/** Property tests for the two query-shaped centralities: the
  * distributed superstep loops must equal brute-force in-memory power
  * iterations on arbitrary random graphs — join plans, pin placement,
  * and broadcast dispatch are implementation freedom; the recurrences
  * are not. Same direct-generator pattern as GraphPropertySpec. */
class HitsPprPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long = 13L): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  // random directed simple graph on nodes 0..n-1
  private val digraph: Gen[(Int, Set[(Int, Int)])] = for {
    n <- Gen.choose(3, 12)
    density <- Gen.choose(15, 60)
    all = for { a <- 0 until n; b <- 0 until n if a != b } yield (a, b)
    picks <- Gen.listOfN(all.size, Gen.choose(0, 99))
  } yield (n, all.zip(picks).filter(_._2 < density).map(_._1).toSet)

  /** reference HITS: h₀ = 1 on sources; per round auth = Eᵀh then
    * L1-normalize, hub = E·auth then L1-normalize — plain collections,
    * exactly the recurrence `Hits.hits` distributes. */
  private def refHits(edges: Set[(Int, Int)],
      iters: Int): (Map[Int, Double], Map[Int, Double]) = {
    val srcs = edges.map(_._1)
    var hub = srcs.map(_ -> 1.0).toMap
    var auth = Map.empty[Int, Double]
    def l1(m: Map[Int, Double]) = { val t = m.values.sum; m.map { case (k, v) => k -> v / t } }
    for (_ <- 1 to iters) {
      auth = l1(edges.toSeq.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => hub.getOrElse(e._1, 0.0)).sum })
      hub = l1(edges.toSeq.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => auth.getOrElse(e._2, 0.0)).sum })
    }
    (hub, auth)
  }

  /** reference PPR: r₀ = 1/|S| on seeds; r' = (1−d)·π + d·Pᵀr with
    * column-stochastic P over out-degrees — no dangling redistribution,
    * matching `personalizedPageRank`'s documented simplification. */
  private def refPpr(edges: Set[(Int, Int)], seeds: Set[Int],
      iters: Int, d: Double): Map[Int, Double] = {
    val nodes = edges.flatMap(e => Set(e._1, e._2))
    val s = seeds.intersect(nodes)
    val outdeg = edges.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size }
    val tele = nodes.map(v =>
      v -> (if (s(v)) (1.0 - d) / s.size else 0.0)).toMap
    var r = tele.map { case (k, v) => k -> v / (1.0 - d) }
    for (_ <- 1 to iters) {
      val mass = edges.toSeq.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => r(e._1) / outdeg(e._1)).sum }
      r = nodes.map(v => v -> (tele(v) + d * mass.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("hits equals the in-memory L1 power iteration on random digraphs") {
    for (((n, es), i) <- samples(digraph, 10).zipWithIndex
        if es.nonEmpty) {
      val iters = 1 + (i % 3)
      val got = Hits
        .hits(es.toSeq.toDF("src", "dst"), iters, pinEachRound = i % 2 == 0)
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      val (h, a) = refHits(es, iters)
      val nodes = es.flatMap(e => Set(e._1, e._2))
      assert(got.keySet === nodes, s"case $i")
      nodes.foreach { v =>
        assert(math.abs(got(v)._1 - h.getOrElse(v, 0.0)) < 1e-9,
          s"case $i hub($v): ${got(v)._1} vs ${h.getOrElse(v, 0.0)}")
        assert(math.abs(got(v)._2 - a.getOrElse(v, 0.0)) < 1e-9,
          s"case $i auth($v): ${got(v)._2} vs ${a.getOrElse(v, 0.0)}")
      }
    }
  }

  test("personalizedPageRank equals the in-memory recurrence on " +
    "random digraphs and random seed sets") {
    for (((n, es), i) <- samples(digraph, 10, seed = 31L).zipWithIndex
        if es.nonEmpty) {
      val nodes = es.flatMap(e => Set(e._1, e._2))
      val seeds = nodes.filter(_ % 3 == i % 3)
      if (seeds.nonEmpty) {
        val iters = 1 + (i % 4)
        val got = PageRank.personalizedPageRank(
            es.toSeq.toDF("src", "dst"),
            seeds.toSeq.toDF("node"), iters)
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val ref = refPpr(es, seeds, iters, 0.85)
        assert(got.keySet === nodes, s"case $i")
        nodes.foreach { v =>
          assert(math.abs(got(v) - ref(v)) < 1e-9,
            s"case $i rank($v): ${got(v)} vs ${ref(v)}")
        }
      }
    }
  }
}
