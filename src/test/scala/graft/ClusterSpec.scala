package graft

import org.apache.spark.sql.DataFrame
import graft.dedup.Cluster

/** Connected-components cluster formation over near-dup pair graphs.
  * Every scenario runs through BOTH execution paths: the driver-side
  * union-find (small-graph broadcast-style path, the default here) and
  * the distributed min-label loop (forced with smallGraphEdges = 0).
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def ccBoth(edges: DataFrame): Seq[Map[Long, Long]] =
    Seq(4L << 20, 0L).map { thresh =>
      Cluster.connectedComponents(edges, "id_a", "id_b",
        smallGraphEdges = thresh)
        .as[(Long, Long)].collect().toMap
    }

  test("transitive pairs collapse to one cluster with min-id label") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    for (got <- ccBoth(edges))
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("long chain converges across rounds (diameter > 1 iteration)") {
    val edges = (0L until 12L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    for (got <- ccBoth(edges))
      assert(got === (0L until 12L).map(_ -> 0L).toMap)
  }

  test("star contraction: 1000-hop chain converges in ~log rounds") {
    // a path graph is the worst case for plain min-label propagation
    // (rounds = diameter: 999 here, far past maxIter=25); alternating
    // large-star/small-star doubles the contracted frontier per round,
    // so the SAME cap converges with room to spare
    val n = 1000L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toSeq
      .toDF("id_a", "id_b")
    val (comp, rounds) = Cluster.connectedComponentsWithRounds(
      edges, "id_a", "id_b", maxIter = 25)
    val got = comp.as[(Long, Long)].collect().toMap
    assert(got === (0L until n).map(_ -> 0L).toMap)
    // log2(1000) ≈ 10; +1 detection round; generous margin at 15
    assert(rounds <= 15, s"expected logarithmic convergence, got $rounds")
    assert(rounds >= 2) // and it genuinely iterated
  }

  test("unconverged cap exit keeps one-row-per-node grain") {
    // maxIter=1 on a long chain cannot reach the star fixpoint: the
    // mid-contraction edge set still links some nodes to SEVERAL
    // targets. The labels may be split (warned loudly), but the output
    // GRAIN must stay one row per node — duplicated node rows with
    // conflicting comp ids would make survivors() keep documents twice.
    val n = 200L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toSeq
      .toDF("id_a", "id_b")
    val (comp, rounds) = Cluster.connectedComponentsWithRounds(
      edges, "id_a", "id_b", maxIter = 1)
    assert(rounds === 1)
    val rows = comp.as[(Long, Long)].collect()
    assert(rows.length === n.toInt,
      s"expected exactly $n node rows, got ${rows.length}")
    assert(rows.map(_._1).distinct.length === n.toInt,
      "duplicate node rows on the unconverged exit path")
    // labels still form a valid (possibly split) assignment: every comp
    // id is itself a node and comp <= node (endpoints only decrease)
    val nodeSet = rows.map(_._1).toSet
    rows.foreach { case (node, c) =>
      assert(c <= node && nodeSet.contains(c))
    }
  }

  test("property: agrees with union-find on a random graph") {
    val rng = new scala.util.Random(11L)
    val edges = (0 until 120).map(_ =>
      (rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter { case (a, b) => a != b }

    // reference union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap

    for (got <- ccBoth(edges.toDF("id_a", "id_b")))
      assert(got === expected)
  }

  test("survivors keep one doc per cluster plus all unpaired docs") {
    val docs = (1L to 8L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val edges = Seq((1L, 2L), (2L, 3L), (6L, 7L)).toDF("id_a", "id_b")
    for (thresh <- Seq(4L << 20, 0L)) {
      val comps = Cluster.connectedComponents(edges, "id_a", "id_b",
        smallGraphEdges = thresh)
      val kept = Cluster.survivors(docs, "doc_id", comps)
        .select("doc_id").as[Long].collect().toSet
      // clusters {1,2,3} -> keep 1; {6,7} -> keep 6; 4,5,8 unpaired
      assert(kept === Set(1L, 4L, 5L, 6L, 8L))
    }
  }
}
