package graft.dedup

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.cosine

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space, then look for
  * near-duplicates only WITHIN a cluster, ordered by proximity to the
  * centroid — the web-corpus recipe for pruning semantically redundant
  * training data that plain MinHash/SimHash (lexical grain) cannot see.
  *
  * This is the third embedding-dedup grain next to the brute pair scan
  * (`Dedup.embeddingNearDups`, bounded id ranges) and the LSH-bucketed
  * path (`similarity/Ann.scala`): clusters are SEMANTIC buckets, and
  * the intra-cluster comparison is windowed (each item vs its W
  * predecessors in centroid-proximity order), so the candidate count is
  * Θ(n·W) — never the Θ(n²/k) of full intra-cluster pairing, and the
  * kept item of any duplicate group is deterministically the one
  * closest to its centroid (the paper's keeper rule).
  *
  * Scale shape, stage by stage:
  *  - centroid assignment: the k centroids are collected once (k×dim
  *    doubles, the same bounded driver state as the IVF codebook in
  *    `similarity/Ann.scala`) and folded into ONE narrow projection —
  *    `array_max` over a k-literal struct array — so assignment costs
  *    zero shuffles and stays inside whole-stage codegen;
  *  - the only exchange is the hash partition on `cluster` feeding the
  *    per-cluster window sort; at corpus scale k is chosen ∝ corpus
  *    size (SemDeDup uses ~√n·c clusters) so clusters stay
  *    partition-sized — the caller owns k via the `centroids` frame;
  *  - the windowed compare is ≤ W codegen'd cosine evaluations per row
  *    against a `collect_list` frame of W predecessor vectors — linear
  *    in n, independent of cluster size.
  *
  * Determinism: every cosine is rounded to 6 dp BEFORE it is ordered
  * on or thresholded, ties break on ids — the whole pipeline replays
  * bit-identically in ANSI SQL (judged: `dedup_semantic`).
  */
object SemDedup {

  /** Maximum centroid count collected to the driver — semantic
    * clustering wants k ≪ n; a `centroids` frame bigger than this is
    * almost certainly a corpus passed by mistake. */
  val MaxCentroids = 65536

  /** `corpus`: rows with an id column and a float/double array
    * embedding column. `centroids`: a SMALL frame (cid, cvec) — e.g.
    * k-means output from `similarity/Ann.seedCodebook`/`kmeans`, or any
    * deterministic seed rows. Returns one row per corpus item:
    * (cluster, <idCol>, rk, cent_cos, semantic_dup) where `rk` is the
    * item's centroid-proximity rank inside its cluster and
    * `semantic_dup` = 1 iff some higher-ranked item within the last
    * `window` ranks has cosine ≥ `threshold` (that higher-ranked item —
    * closer to the centroid — is the keeper). */
  def semanticDedup(corpus: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, window: Int, threshold: Double): DataFrame = {
    require(window >= 1, s"need window >= 1, got $window")
    val centRows: Array[(Long, Seq[Double])] = centroids
      .select(col(centroids.columns.head).cast("long"),
        col(centroids.columns(1)).cast("array<double>"))
      .limit(MaxCentroids + 1)
      .collect()
      .map { case Row(cid: Long, cv: scala.collection.Seq[_]) =>
        (cid, cv.asInstanceOf[scala.collection.Seq[Double]].toSeq)
      }
    require(centRows.nonEmpty, "centroids frame is empty")
    require(centRows.length <= MaxCentroids,
      s"centroids frame exceeds $MaxCentroids rows — pass cluster " +
        "centers, not a corpus")

    // one struct array literal (cc, -cid, cid) per centroid; array_max
    // picks max cosine, ties to the SMALLEST cid via the negated key
    val centArray = array(centRows.map { case (cid, cv) =>
      struct(
        round(cosine(typedLit(cv), col("__v")), 6).as("cc"),
        lit(-cid).as("negcid"),
        lit(cid).as("cid"))
    }: _*)

    val assigned = corpus
      .select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__best", array_max(centArray))
      .select(col("__id"), col("__v"),
        col("__best.cid").as("cluster"),
        col("__best.cc").as("cent_cos"))

    val byCluster = Window.partitionBy(col("cluster"))
      .orderBy(col("cent_cos").desc, col("__id"))
    val prevFrame = byCluster.rowsBetween(-window, -1)
    assigned
      .withColumn("rk", row_number().over(byCluster).cast("long"))
      .withColumn("__prev", collect_list(col("__v")).over(prevFrame))
      .withColumn("semantic_dup",
        coalesce(
          exists(col("__prev"),
            p => round(cosine(p, col("__v")), 6) >= threshold),
          lit(false)).cast("int"))
      .select(col("cluster"), col("__id").as(idCol), col("rk"),
        col("cent_cos"), col("semantic_dup"))
  }
}
