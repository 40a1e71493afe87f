package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER formation: the step after pair detection that
  * an actual corpus dedup needs — connected components over the
  * near-dup pair graph, so transitively-linked documents (A~B, B~C)
  * collapse into one cluster with one canonical survivor (the min id),
  * even when A and C were never directly compared.
  *
  * Algorithm: distributed min-label propagation (the MapReduce
  * "hash-to-min" scheme). Each round every node adopts the smallest
  * component label among itself and its neighbors (a self-loop in the
  * edge list carries the node's own label, so a round is ONE shuffle
  * join + ONE min-aggregate); rounds = graph diameter. Near-dup graphs
  * are unions of small dense clusters (near-cliques from LSH buckets),
  * so the loop converges in 2–4 rounds regardless of corpus size.
  *
  * Scale notes:
  *  - The pair graph is orders of magnitude smaller than the corpus
  *    that produced it (only docs with a near-dup appear). Below
  *    `smallGraphEdges` the edges are collected and union-find runs on
  *    the driver — the same small-side reasoning as a broadcast join,
  *    and it replaces an iterative shuffle loop with one collect. A
  *    100 TB corpus whose pair graph exceeds the threshold takes the
  *    distributed path automatically.
  *  - Distributed path: edges are checkpointed once (they'd otherwise
  *    re-run the upstream LSH/shingle join every round), partitions are
  *    sized to edge count (not corpus size), each round persists its
  *    labels and materializes them through the convergence-fingerprint
  *    action — one job per round; labels only ever decrease, so an
  *    unchanged (count, sum) fingerprint IS the fixpoint. Lineage is
  *    linear (labels referenced once per round) and truncated with
  *    localCheckpoint every few rounds to bound plan depth on
  *    large-diameter chains.
  */
object Cluster {

  /** Connected components of an undirected edge list.
    *
    * @param smallGraphEdges below this many edges, solve on the driver
    *                        (broadcast-join-style small-side path); set 0
    *                        to force the distributed loop.
    * @return (node, comp) for every node appearing in `edges`; `comp` is
    *         the minimum node id in the component — deterministic, and
    *         directly usable as the cluster's canonical survivor id.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, smallGraphEdges: Long = 4L << 20): DataFrame = {
    // checkpoint the raw pairs once: both paths re-read them, and the
    // upstream pair generation (an LSH/shingle join, the most expensive
    // stage of the whole dedup) must not re-execute per use
    val oneWay = edges.select(col(srcCol).cast("long").as("node"),
      col(dstCol).cast("long").as("nbr"))
      .localCheckpoint()
    val edgeCount = oneWay.count() // cheap: scans checkpoint blocks
    if (edgeCount <= smallGraphEdges) driverUnionFind(oneWay)
    else distributedCC(oneWay, edgeCount, maxIter)
  }

  /** Small-graph path: one collect + path-compressed union-find. */
  private def driverUnionFind(oneWay: DataFrame): DataFrame = {
    val spark = oneWay.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    oneWay.toLocalIterator().forEachRemaining { row =>
      val (x, y) = (row.getLong(0), row.getLong(1))
      if (!parent.contains(x)) parent(x) = x
      if (!parent.contains(y)) parent(y) = y
      val (a, b) = (find(x), find(y))
      if (a < b) parent(b) = a else if (b < a) parent(a) = b
    }
    val out = parent.keysIterator.map(n => (n, find(n))).toSeq
    spark.createDataset(out).toDF("node", "comp")
  }

  /** Large-graph path: iterative min-label propagation. */
  private def distributedCC(oneWay: DataFrame, edgeCount: Long,
      maxIter: Int): DataFrame = {
    // partitions sized to the graph, not to the corpus that produced it:
    // a handful of tasks for a small pair graph, thousands for billions
    // of edges (~1M edges ≈ 16 MB per partition)
    val shuffleParts = oneWay.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val nParts = math.max(1L, math.min(shuffleParts.toLong * 32L,
      edgeCount / 1000000L + 1L)).toInt
    // symmetric edge list WITH self-loops so each node hears its own
    // label through the round's single join
    val sym = oneWay
      .union(oneWay.select(col("nbr").as("node"), col("node").as("nbr")))
      .union(oneWay.select(col("node"), col("node").as("nbr"))
        .union(oneWay.select(col("nbr").as("node"), col("nbr")))
        .distinct())
      .repartition(nParts)
      .localCheckpoint()
    var labels = sym.groupBy(col("node"))
      .agg(min(col("nbr")).as("comp"))
      .persist()
    var fingerprint = labels.agg(count(lit(1)), sum(col("comp")))
      .collect()(0).toSeq // materializes the persist in the same job
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val prev = labels
      var next = sym.join(labels.withColumnRenamed("node", "nbr")
          .withColumnRenamed("comp", "nbr_comp"), "nbr")
        .groupBy(col("node"))
        .agg(min(col("nbr_comp")).as("comp"))
      // lineage is linear in rounds; truncate periodically so pathological
      // large-diameter chains don't accumulate unbounded plan depth
      next = if ((it + 1) % 8 == 0) next.localCheckpoint() else next.persist()
      val fp = next.agg(count(lit(1)), sum(col("comp"))).collect()(0).toSeq
      prev.unpersist()
      converged = fp == fingerprint
      fingerprint = fp
      labels = next
      it += 1
    }
    if (!converged)
      // exiting via the iteration cap means the min-label flood hasn't
      // reached a fixpoint: components wider than maxIter hops carry
      // SPLIT (wrong) ids, and survivors() built on them would keep
      // documents whose cluster already has a representative. Loud by
      // design — silence here corrupts downstream dedup.
      System.err.println(
        s"[graft.dedup.Cluster] WARNING: distributedCC hit maxIter=$maxIter " +
          "before the label fixpoint; component ids are NOT converged " +
          "(graph diameter exceeds the cap). Re-run with a higher maxIter.")
    labels
  }

  /** Cluster rollup: one row per component with size and id span. */
  def clusterStats(components: DataFrame): DataFrame =
    components.groupBy(col("comp"))
      .agg(count(lit(1)).as("n_members"),
        min(col("node")).as("member_min"),
        max(col("node")).as("member_max"))

  /** End-to-end near-dup collapse: keep one survivor per cluster (the
    * min id) plus every document that never appeared in a pair. */
  def survivors(docs: DataFrame, idCol: String,
      components: DataFrame): DataFrame = {
    val losers = components.filter(col("node") =!= col("comp"))
      .select(col("node").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
