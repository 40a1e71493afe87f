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
}
