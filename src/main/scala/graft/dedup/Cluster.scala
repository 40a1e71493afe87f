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
  * component label among itself and its neighbors; rounds = graph
  * diameter. Near-dup graphs are unions of small dense clusters (near
  *-cliques from LSH buckets), so diameter is tiny and the loop
  * converges in 2–4 rounds regardless of corpus size — each round is
  * one shuffle join + one min-aggregate, both AQE-managed.
  *
  * Scale notes: lineage is truncated per round with localCheckpoint
  * (iterative plans otherwise grow exponentially); convergence is
  * detected from the same aggregate that computes the round (labels
  * only ever decrease, so an unchanged (count, sum) fingerprint IS the
  * fixpoint — no extra comparison join). For graphs with large-diameter
  * chains swap in alternating large-star/small-star rounds; for the
  * near-dup workload plain propagation does fewer shuffles.
  */
object Cluster {

  /** Connected components of an undirected edge list.
    *
    * @return (node, comp) for every node appearing in `edges`; `comp` is
    *         the minimum node id in the component — deterministic, and
    *         directly usable as the cluster's canonical survivor id.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(srcCol).as("node"), col(dstCol).as("nbr"))
      .union(edges.select(col(dstCol).as("node"), col(srcCol).as("nbr")))
    var labels = sym.groupBy(col("node"))
      .agg(least(min(col("nbr")), col("node")).as("comp"))
      .localCheckpoint()
    var fingerprint = labels.agg(count(lit(1)), sum(col("comp")))
      .collect()(0).toSeq
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // neighbor labels flow along edges; each node keeps the min of its
      // own label and everything it heard
      val next = sym.join(labels.withColumnRenamed("node", "nbr")
          .withColumnRenamed("comp", "nbr_comp"), "nbr")
        .groupBy(col("node"))
        .agg(min(col("nbr_comp")).as("heard"))
        .join(labels, "node")
        .select(col("node"), least(col("comp"), col("heard")).as("comp"))
        .localCheckpoint()
      val fp = next.agg(count(lit(1)), sum(col("comp"))).collect()(0).toSeq
      converged = fp == fingerprint
      fingerprint = fp
      labels = next
      it += 1
    }
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
