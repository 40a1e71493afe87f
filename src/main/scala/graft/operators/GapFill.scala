package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling: densify a sparse (bucket, series) rollup
  * onto a complete calendar spine, zero-filling additive columns and
  * carrying observations forward — the operation behind every
  * "plot this daily metric without holes" and "as-of state per day"
  * query (the reference's time-series surface returns only buckets
  * that HAVE points — `influx_connector.py:142-189` — leaving gap
  * semantics to the caller).
  *
  * Scale shape: the spine is days × distinct keys — calendar-bounded
  * and key-bounded, broadcast to the rollup join (never the raw
  * events); the carry-forward is one keyed window over the densified
  * grid. Input is the already-aggregated rollup, so the whole
  * operation is aggregate-cardinality regardless of raw data size.
  */
object GapFill {

  /** @param daily        rollup with one row per present (day, key)
    * @param dayCol       day column, 'yyyy-MM-dd' strings
    * @param keyCol       series key column
    * @param from, to     inclusive calendar bounds of the spine
    * @param zeroFill     additive columns: absent bucket = 0
    * @param carryForward observation columns: absent bucket = last
    *                     seen value (null before the first one)
    */
  def fillDaily(daily: DataFrame, dayCol: String, keyCol: String,
      from: String, to: String, zeroFill: Seq[String],
      carryForward: Seq[String]): DataFrame = {
    val spark = daily.sparkSession
    val days = spark.range(1)
      .select(explode(expr(
        s"sequence(to_date('$from'), to_date('$to'), interval 1 day)"))
        .as("__d"))
      .select(date_format(col("__d"), "yyyy-MM-dd").as(dayCol))
    val spine = days.crossJoin(broadcast(daily.select(col(keyCol)).distinct()))
    val joined = spine.join(daily, Seq(dayCol, keyCol), "left")
    val zeroed = zeroFill.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L))))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carryForward.foldLeft(zeroed)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Linear interpolation onto the daily spine — the re-gridding step
    * for downsampled/irregular series (sensor readings, sparse
    * sampling), where carry-forward ([[fillDaily]]) would staircase:
    * each absent day gets `prev + (next−prev)·Δ/span` between its
    * nearest observations; one-sided gaps (before the first / after
    * the last observation) fall back to the nearest value, so the
    * output is total on the spine.
    *
    * Scale shape: identical to [[fillDaily]] — the spine is
    * calendar × key bounded, the input is the daily rollup, and both
    * direction scans are two frames over ONE keyed window exchange
    * (`IGNORE NULLS` running last/first; no self-join on time).
    * The interpolation arithmetic is a fixed-shape expression —
    * `prev + (next−prev)·(Δ/span)` in that order — so any
    * IEEE-compliant engine reproduces it bit-for-bit pre-rounding. */
  def interpolateDaily(daily: DataFrame, dayCol: String, keyCol: String,
      from: String, to: String, valueCol: String,
      roundTo: Int = 4): DataFrame = {
    val spark = daily.sparkSession
    val days = spark.range(1)
      .select(explode(expr(
        s"sequence(to_date('$from'), to_date('$to'), interval 1 day)"))
        .as("__d"))
      .select(date_format(col("__d"), "yyyy-MM-dd").as(dayCol))
    val spine = days.crossJoin(broadcast(daily.select(col(keyCol)).distinct()))
    val grid = spine.join(daily, Seq(dayCol, keyCol), "left")
    val v = col(valueCol)
    val obsDay = when(v.isNotNull, col(dayCol))
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val prevD = last(obsDay, ignoreNulls = true).over(wPrev)
    val nextV = first(v, ignoreNulls = true).over(wNext)
    val nextD = first(obsDay, ignoreNulls = true).over(wNext)
    grid
      .withColumn("__pv", prevV).withColumn("__pd", prevD)
      .withColumn("__nv", nextV).withColumn("__nd", nextD)
      .withColumn("interpolated", v.isNull) // BEFORE valueCol overwrite
      .withColumn(valueCol, round(
        when(v.isNotNull, v)
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              (datediff(to_date(col(dayCol)), to_date(col("__pd")))
                .cast("double") /
               datediff(to_date(col("__nd")), to_date(col("__pd")))
                .cast("double")))
          .otherwise(coalesce(col("__pv"), col("__nv"))), roundTo))
      .drop("__pv", "__pd", "__nv", "__nd")
  }
}
