package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join via bin bucketing.
  *
  * Extension beyond the reference (SURVEY.md §2.4 J3: the reference has
  * no general join operator at all; its closest shapes are the value
  * threshold filters in test_system_integration.py:283-285). Interval
  * joins are what its time-series surface needs the moment two
  * measurements are correlated by overlapping time windows.
  *
  * A naive `point BETWEEN lo AND hi` join is a broadcast-nested-loop /
  * cartesian plan: |points|×|intervals| comparisons. Binning converts it
  * to an equi-join: each interval is replicated to the fixed-width bins
  * it overlaps, each point hashes to exactly one bin, the join key is
  * the bin id, and the exact containment predicate filters within the
  * bin. Cost: |points| + Σ(interval width/binWidth) shuffled rows — the
  * standard trick for genomic/temporal interval joins at scale.
  *
  * Pick `binWidth` near the median interval width: too small replicates
  * intervals; too large degrades to a few giant buckets (skew — AQE
  * skew-join splits them if it happens).
  */
object RangeJoin {

  /** Join `points` to every interval in `intervals` containing the
    * point (inclusive both ends). All columns from both sides survive.
    *
    * Each (point, interval) match appears exactly once — a point falls
    * in one bin, so no post-join dedup is needed.
    */
  def binnedContainment(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binOf(c: Column): Column = floor(c / lit(binWidth)).cast("long")

    val p = points.withColumn("__bin", binOf(col(pointCol)))
    // a binWidth far below the interval widths would replicate every
    // interval thousands of times — fail loudly instead of OOMing a task
    val binSpan = binOf(col(hiCol)) - binOf(col(loCol)) + 1L
    val guarded = when(binSpan > maxBinsPerInterval,
      raise_error(concat(lit(s"interval spans more than " +
        s"$maxBinsPerInterval bins of width $binWidth at ["),
        col(loCol), lit(", "), col(hiCol), lit("] — raise binWidth"))))
      .otherwise(sequence(binOf(col(loCol)), binOf(col(hiCol))))
    val iv = intervals.withColumn("__bin", explode(guarded))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
