package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group feature normalization for training-data prep: z-score
  * scaling and quantile clipping (winsorization) — the two standard
  * "tame the numeric column" passes before a feature lands in a
  * training set.
  *
  * Scale shape: z-score is one keyed window exchange (the aggregate
  * moments and the projection share it); winsorization reuses the
  * spillable grouped-percentile path and joins the per-group bounds
  * back — the bounds side is group-cardinality rows, so Catalyst
  * broadcasts it and the data side stays a scan.
  */
object Features {

  /** Per-group z-score: (v − μ_g) / σ_g, population σ. Groups with
    * zero variance (σ = 0) yield null — the column carries no signal
    * there, and silently emitting 0 would hide that. One exchange on
    * the group key serves both window aggregates and the projection. */
  def zscore(df: DataFrame, groupCol: String, valueCol: String,
      outCol: String = "z"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
    val v = col(valueCol).cast("double")
    val sigma = stddev_pop(v).over(w)
    df.withColumn(outCol,
      when(sigma =!= 0.0, (v - avg(v).over(w)) / sigma))
  }

  /** Per-group winsorization: clip values into the exact
    * [p(loP), p(hiP)] band of their group. Exact percentiles come from
    * the spillable window-rank path (`Scale.exactPercentiles`) with
    * `quantile_cont` interpolation, so the clip bounds are
    * engine-portable; rows sitting exactly on a bound are unchanged by
    * construction (clipping to your own value is the identity). */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      loP: Double, hiP: Double,
      outCol: String = "clipped"): DataFrame = {
    require(0.0 <= loP && loP < hiP && hiP <= 1.0,
      s"need 0 <= loP < hiP <= 1, got ($loP, $hiP)")
    val bounds = graft.plans.Scale.exactPercentiles(df, groupCol, valueCol,
      Seq("__lo" -> loP, "__hi" -> hiP))
    val v = col(valueCol).cast("double")
    df.join(bounds, Seq(groupCol))
      .withColumn(outCol, least(greatest(v, col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Equal-frequency discretization: bin a numeric column into
    * `nBins` quantile buckets with EXACT interpolated boundaries —
    * the feature-engineering binning that `ntile` only approximates
    * (ntile's cut points depend on row order among ties; boundary
    * binning depends only on values). Boundaries come from the
    * scan-shaped exact-quantile path (`Scale.exactGlobalQuantiles` —
    * no global sort, see its scaladoc) and are ROUNDED to `roundTo`
    * before comparison so an oracle replaying `quantile_cont` bins
    * ties identically. A row lands in bin b = #(boundaries ≤ v),
    * b ∈ [0, nBins−1]; null values get bin null.
    *
    * Scale: the boundary row is a 1-row broadcast; binning is a pure
    * projection over the scan — the discretized column costs nothing
    * beyond the quantile probe jobs. */
  /** Robust per-group outlier flagging by MEDIAN absolute deviation —
    * the outlier detector that survives its own outliers (a z-score's
    * mean and σ are dragged by the very points being hunted; the
    * median and MAD have a 50% breakdown point — Hampel's rule). A
    * row is an outlier when |v − median| > `cut` · MAD; MAD = 0
    * groups (constant-valued) flag nothing, and NULL values pass
    * through unflagged.
    *
    * Scale: two exact-median jobs on the windowed-rank path
    * (`Scale.exactPercentiles` — per-group sort bounded by group size)
    * with the per-group scalars joined back null-safely; the flag
    * itself is a pure projection. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      cut: Double = 3.5, outCol: String = "is_outlier",
      roundTo: Int = 6): DataFrame = {
    require(Seq("__med", "__dev", "__mad").forall(!df.columns.contains(_)),
      "columns __med/__dev/__mad are reserved")
    val v = col(valueCol).cast("double")
    val med = graft.plans.Scale.exactPercentiles(df, groupCol, valueCol,
      Seq("__med" -> 0.5)).withColumnRenamed(groupCol, "__g1")
    val withMed = df.join(broadcast(med), col(groupCol) <=> col("__g1"))
      .drop("__g1")
      .withColumn("__dev", abs(v - col("__med")))
    val mad = graft.plans.Scale.exactPercentiles(withMed, groupCol,
      "__dev", Seq("__mad" -> 0.5)).withColumnRenamed(groupCol, "__g2")
    withMed.join(broadcast(mad), col(groupCol) <=> col("__g2"))
      .drop("__g2")
      .withColumn(outCol, when(v.isNotNull,
        col("__dev") > lit(cut) * col("__mad")))
      .withColumn("median", round(col("__med"), roundTo))
      .withColumn("mad", round(col("__mad"), roundTo))
      .drop("__med", "__dev", "__mad")
  }

  def quantileBins(df: DataFrame, valueCol: String, nBins: Int,
      binCol: String = "bin", roundTo: Int = 6): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val ps = (1 until nBins).map(i => s"__q$i" -> i.toDouble / nBins)
    val bounds = graft.plans.Scale.exactGlobalQuantiles(df, valueCol, ps)
    val v = col(valueCol).cast("double")
    val bin = ps.map { case (name, _) =>
      when(v >= round(col(name), roundTo), 1).otherwise(0) }
      .reduce(_ + _)
    df.crossJoin(broadcast(bounds))
      .withColumn(binCol, when(v.isNotNull, bin))
      .drop(ps.map(_._1): _*)
  }
}
