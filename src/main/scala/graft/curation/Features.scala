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
