package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping on plain Parquet — the Delta `OPTIMIZE ZORDER BY` twin.
  *
  * A lake table can only be range-clustered on ONE leading sort key;
  * queries filtering the second dimension then read every file. The
  * z-curve interleaves the bit representations of all clustering
  * columns, so files (and Parquet row groups within them) get tight
  * min/max bounding boxes on EVERY dimension at once: a predicate box
  * on any subset of the dimensions overlaps — and therefore scans —
  * only O(perimeter) of the files instead of all of them. At 100 TB
  * this is the difference between footer-pruning 97% of a scan and
  * reading the whole table; the skipping itself is free (Parquet
  * column statistics + pushed filters, no index structure).
  *
  * Shape: one min/max aggregate (single row to the driver) to scale
  * each column into bucket space, then `repartitionByRange` on the
  * interleaved key — Spark samples range boundaries, so the write is
  * one exchange. The z-value is a pure bitwise expression
  * (shift/and/or), fully inside whole-stage codegen.
  */
object ZOrder {

  /** Equi-width bucket id of `c` in [0, 2^bits), given column bounds.
    * Clamps (and null-zeroes) so out-of-range values stay legal. */
  private def bucket(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val buckets = 1 << bits
    val scaled = floor((c - lo).cast("double") / (hi - lo + lit(1e-9)) *
      lit(buckets))
    least(greatest(coalesce(scaled, lit(0)), lit(0)), lit(buckets - 1))
      .cast("long")
  }

  /** Interleave the low `bits` bits of each bucket id (column-major:
    * bit i of column j lands at position i*n + j). */
  private def interleave(bucketIds: Seq[Column], bits: Int): Column = {
    val n = bucketIds.size
    val terms = for {
      i <- 0 until bits
      (b, j) <- bucketIds.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The z-value column for `cols` over `df`'s own min/max range.
    * `bits` per dimension (default 16 ⇒ 65k buckets/dim). */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    val bounds = df.agg(
      array(cols.flatMap(c =>
        Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))): _*)
        .as("b"))
      .head().getSeq[Double](0)
    val ids = cols.zipWithIndex.map { case (c, j) =>
      bucket(col(c), lit(bounds(2 * j)), lit(bounds(2 * j + 1)), bits)
    }
    interleave(ids, bits)
  }

  /** Rewrite `df` to `path` clustered on the z-curve of `cols`,
    * targeting `numFiles` output files. Returns the row count
    * (observed during the write — no second pass). */
  def write(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bits: Int = 16): Long = {
    val z = zvalue(df, cols, bits)
    val obs = new org.apache.spark.sql.Observation()
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      // observe ABOVE the range exchange: repartitionByRange runs a
      // sampling pass over its child, which would double-count below
      .observe(obs, count(lit(1)).as("n"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    obs.get("n").asInstanceOf[Long]
  }
}
