package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frontier-expansion BFS over an edge list — hop distance from a
  * source set, the third iterative-graph primitive next to connected
  * components (`dedup/Cluster.scala`) and PageRank. "What can these
  * nodes reach, and in how many steps" is the lake-side form of every
  * lineage, escalation-path, and blast-radius question, and the
  * bounded-depth variant is what replaces a recursive CTE on engines
  * (like Spark) that lack one.
  *
  * Scale shape: each superstep joins the FRONTIER (not the visited
  * set, not the graph) against edges — one hash join + one distinct +
  * one anti-join against visited, all keyed on node id. Work per
  * round is proportional to the frontier's out-edges, the textbook
  * BFS bound; the visited set only ever participates as the build
  * side of the anti-join. Loop-invariant edges and the growing
  * visited/frontier frames are `localCheckpoint`ed so superstep k
  * never re-executes supersteps 1..k−1's lineage (same move, same
  * measured rationale as `PageRank.pageRank`); on a cluster with an
  * unreliable driver use `checkpoint` to a reliable dir instead.
  *
  * Deterministic by construction — BFS level order is set algebra,
  * no tie-breaking — so the result replays as a DuckDB
  * `WITH RECURSIVE` + `min(depth)` oracle (`graph_reachability`).
  */
object Reachability {

  /** `edges`: (src, dst) directed pairs, pre-deduplicated. `sources`:
    * one `node` column. Returns (node, depth) — the minimum hop count
    * from any source, 0 for the sources themselves — for every node
    * within `maxDepth` hops. Stops early once a frontier comes back
    * empty (the `count` per round is the only driver-side value). */
  def hopDistances(edges: DataFrame, sources: DataFrame,
      maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, s"need maxDepth >= 0, got $maxDepth")
    // measured root pin; frontier/visited frames are node-grained ⊆
    // the edge frame, so its bytes price the loop (Pin.pinHinted)
    val (e, eBytes) = graft.plans.Pin.pinSized(
      edges.select(col("src"), col("dst")))
    var visited = sources.select(col("node")).distinct()
      .withColumn("depth", lit(0))
      .transform(graft.plans.Pin.pinHinted(_, eBytes))
    var frontier = visited.select(col("node"))
    var d = 1
    var exhausted = frontier.isEmpty
    while (d <= maxDepth && !exhausted) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .transform(graft.plans.Pin.pinHinted(_, eBytes))
      if (next.isEmpty) exhausted = true
      else {
        visited = visited
          .union(next.withColumn("depth", lit(d)))
          .transform(graft.plans.Pin.pinHinted(_, eBytes))
        frontier = next
        d += 1
      }
    }
    visited
  }
}
