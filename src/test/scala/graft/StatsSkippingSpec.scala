package graft

import org.apache.spark.sql.functions._
import graft.sources.StatsSkipping

/** File-level data skipping (`sources/StatsSkipping.scala`): pruning
  * correctness (≡ full scan + filter), effectiveness on a clustered
  * layout, and the hidden-manifest invariant. */
class StatsSkippingSpec extends SparkSpec {

  private def clustered(): String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft_skip_spec").toString + "/t"
    val li = Tables.load(spark, sf001, "lineitem")
    StatsSkipping.writeClustered(li, path, "l_orderkey", nFiles = 8,
      manifestCols = Seq("l_orderkey"))
    path
  }

  test("prunedRead ≡ full scan + filter, and skips files") {
    val path = clustered()
    val (kept, total) = StatsSkipping.pruneFiles(spark, path,
      "l_orderkey", 100L, 900L)
    assert(total === 8)
    assert(kept.size < total, "narrow key range should not touch all files")
    val pruned = StatsSkipping.prunedRead(spark, path, "l_orderkey",
      100L, 900L)
    val full = spark.read.parquet(path)
      .filter(col("l_orderkey") >= 100L && col("l_orderkey") <= 900L)
    assert(pruned.count() === full.count())
    assert(pruned.exceptAll(full).count() === 0L)
    assert(full.exceptAll(pruned).count() === 0L)
  }

  test("empty prune result yields an empty frame with the data schema") {
    val path = clustered()
    val none = StatsSkipping.prunedRead(spark, path, "l_orderkey",
      -500L, -100L)
    assert(none.count() === 0L)
    assert(none.columns.contains("l_quantity"))
  }

  test("manifest directory is invisible to plain directory scans") {
    val path = clustered()
    // underscore-prefixed paths are hidden to Spark's file listing, so
    // the manifest can live INSIDE the table directory
    val rows = spark.read.parquet(path).count()
    assert(rows === Tables.load(spark, sf001, "lineitem").count())
    assert(spark.read.parquet(StatsSkipping.manifestPath(path))
      .columns.toSet === Set("file", "n_rows", "l_orderkey_min",
        "l_orderkey_max"))
  }
}
