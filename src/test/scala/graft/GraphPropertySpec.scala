package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{CheapestPath, KCore}

/** Property tests for the iterative-graph operators: the distributed
  * superstep loops must equal brute-force in-memory references on
  * arbitrary random graphs — peel order, join plans, and checkpoint
  * placement are implementation freedom; the fixed points are not. */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long = 7L): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  // random undirected simple graph on nodes 0..n-1 as a set of (a,b), a<b
  private val undirected: Gen[(Int, Set[(Int, Int)])] = for {
    n <- Gen.choose(4, 14)
    density <- Gen.choose(15, 60)
    all = for { a <- 0 until n; b <- a + 1 until n } yield (a, b)
    picks <- Gen.listOfN(all.size, Gen.choose(0, 99))
  } yield (n, all.zip(picks).filter(_._2 < density).map(_._1).toSet)

  /** reference k-core: peel to the fixed point with plain collections */
  private def refKCore(und: Set[(Int, Int)], k: Int): Map[Int, Int] = {
    var edges = und
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, xs) => v -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next != edges
      edges = next
    }
    edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size }
  }

  test("kCore equals the in-memory fixed-point peel on random graphs") {
    for (((n, und), i) <- samples(undirected, 12).zipWithIndex) {
      val k = 1 + (i % 3) // k in 1..3 across cases
      val sym = und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      if (sym.nonEmpty) {
        val got = KCore.kCore(sym.toDF("src", "dst"), k, rounds = n + 2)
          .collect().map(r => r.getInt(0) -> r.getLong(1).toInt).toMap
        assert(got === refKCore(und, k), s"case $i: n=$n k=$k edges=$und")
      }
    }
  }

  // random weighted digraph + source set
  private val weighted: Gen[(Int, Seq[(Int, Int, Long)], Set[Int])] = for {
    n <- Gen.choose(3, 10)
    m <- Gen.choose(n, 4 * n)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      w <- Gen.choose(0L, 9L)
      if a != b
    } yield (a, b, w))
    nSrc <- Gen.choose(1, 2)
    srcs <- Gen.listOfN(nSrc, Gen.choose(0, n - 1))
  } yield (n, es.distinct, srcs.toSet)

  /** reference hop-bounded Bellman–Ford over plain maps */
  private def refCheapest(es: Seq[(Int, Int, Long)], srcs: Set[Int],
      rounds: Int): Map[Int, Long] = {
    var dist: Map[Int, Long] = srcs.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relaxed = es.flatMap { case (a, b, w) =>
        dist.get(a).map(d => b -> (d + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (v, ds) => v -> ds.map(_._2).min }
    }
    dist
  }

  /** reference min-label propagation: R synchronous rounds over the
    * closed neighborhood with plain maps */
  private def refLabelProp(und: Set[(Int, Int)], rounds: Int): Map[Int, Int] = {
    val sym = und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nodes = sym.map(_._1).distinct
    var labels = nodes.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      val nbrMin = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => labels(e._1)).min
      }
      labels = labels.map { case (v, l) =>
        v -> math.min(l, nbrMin.getOrElse(v, l))
      }
    }
    labels
  }

  test("labelPropagate equals the in-memory sync min-label rounds") {
    for (((n, und), i) <- samples(undirected, 12, seed = 23L).zipWithIndex) {
      val rounds = i % 5 // 0 (identity) through converged
      val sym = und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      if (sym.nonEmpty) {
        val got = graft.operators.LabelProp
          .propagate(sym.toDF("src", "dst"), rounds)
          .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
        assert(got === refLabelProp(und, rounds),
          s"case $i: n=$n rounds=$rounds edges=$und")
      }
    }
  }

  test("labelPropagate converges to connected components") {
    for (((n, und), i) <- samples(undirected, 6, seed = 41L).zipWithIndex) {
      val sym = und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      if (sym.nonEmpty) {
        // n rounds ≥ graph diameter → every label is its component min
        val got = graft.operators.LabelProp
          .propagate(sym.toDF("src", "dst"), n)
          .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
        // reference components via union-find over the edge set
        val parent = scala.collection.mutable.Map[Int, Int]()
        def find(x: Int): Int = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        und.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val comps = got.keys.map(v => v -> find(v)).toMap
        val compMin = comps.groupBy(_._2).map { case (c, vs) =>
          c -> vs.keys.min
        }
        val want = comps.map { case (v, c) => v -> compMin(c) }
        assert(got === want, s"case $i: n=$n edges=$und")
      }
    }
  }

  test("cheapestPaths equals the in-memory Bellman-Ford on random digraphs") {
    for (((n, es, srcs), i) <- samples(weighted, 12).zipWithIndex) {
      val rounds = 1 + (i % 4) // exercise non-converged AND converged runs
      if (es.nonEmpty) {
        val got = CheapestPath.cheapestPaths(
            es.toDF("src", "dst", "w"), srcs.toSeq.toDF("node"), rounds)
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        assert(got === refCheapest(es, srcs, rounds),
          s"case $i: n=$n rounds=$rounds srcs=$srcs edges=$es")
      }
    }
  }
}
