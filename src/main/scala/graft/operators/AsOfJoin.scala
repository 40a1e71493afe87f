package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (most-recent-at-or-before) join — the time-series lookup the
  * reference's InfluxDB surface implies but never implements (nearest
  * measurement for a probe timestamp; cf. influx_connector.py:142-189
  * range scans).
  *
  * Implementation is the union-stream form, not a range join: both
  * sides merge into one event stream per key, one shuffle + sort, and a
  * running `last(..., ignoreNulls)` carries the latest build-side row
  * forward to each probe row. A `l.ts >= r.ts` range join would expand
  * to |probe|×|build-per-key| intermediate rows before picking the max;
  * this stays linear in input size at any scale, and AQE handles skewed
  * keys like any other sort exchange.
  *
  * All carry columns travel together in ONE struct, so every carried
  * value comes from the same build row and a build row whose carry
  * column is genuinely NULL carries that NULL (it is not confused with
  * the probe-side "no value here" sentinel — the struct itself is the
  * sentinel). Build rows tied on (key, ts) are totally ordered by the
  * carry struct as a final sort key, so the winning row is deterministic
  * across runs and partitionings.
  */
object AsOfJoin {

  /** Backward-inclusive as-of join.
    *
    * @param probe     left side; all its columns are preserved
    * @param build     right side; must contain `keyCols`, `tsCol`, and
    *                  `carryCols`
    * @param keyCols   equi-join keys
    * @param tsCol     event-time column (same name both sides)
    * @param carryCols build columns carried to each probe row: the values
    *                  of the build row with the greatest ts <= probe ts
    *                  (all null when no such row)
    */
  def backward(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
      tsCol: String, carryCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    require(carryCols.nonEmpty, "carryCols must be non-empty")
    require(!carryCols.exists(probeCols.contains),
      s"carry columns ${carryCols.mkString(",")} collide with probe columns")
    require(!probeCols.contains("__side") && !probeCols.contains("__carry"),
      "probe columns __side / __carry are reserved")
    (keyCols :+ tsCol).foreach { c =>
      require(probeCols.contains(c), s"probe side is missing column $c")
      require(build.columns.contains(c), s"build side is missing column $c")
    }

    val carryType = StructType(carryCols.map(c =>
      StructField(c, build.schema(c).dataType, nullable = true)))

    // __side orders build (0) before probe (1) at equal timestamps —
    // backward-INCLUSIVE: a build row at exactly the probe ts matches
    val probeSide = probe.select(
      probeCols.map(col) :+ lit(null).cast(carryType).as("__carry")
        :+ lit(1).as("__side"): _*)
    val buildSide = build.select(
      probeCols.map(c =>
        if (keyCols.contains(c) || c == tsCol) col(c)
        else lit(null).cast(probe.schema(c).dataType).as(c)) :+
        struct(carryCols.map(col): _*).cast(carryType).as("__carry") :+
        lit(0).as("__side"): _*)

    // final __carry sort key: deterministic winner among build rows tied
    // on (key, ts); probe rows all carry NULL there so it never reorders
    // them relative to anything that matters
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__carry").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = probeSide.unionByName(buildSide)
      .withColumn("__carried", last(col("__carry"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(probeCols.map(col) ++
        carryCols.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /** Forward-inclusive as-of join: carries the build row with the
    * SMALLEST ts >= probe ts (the "next reading at or after" lookup).
    * Same union-stream shape as [[backward]] — one shuffle, one sort —
    * with the frame flipped to [current, unbounded following] and the
    * tie order flipped so an equal-ts build row sorts after its probe
    * row and is therefore visible to the inclusive forward frame.
    */
  def forward(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
      tsCol: String, carryCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    checkArgs(probe, build, keyCols, tsCol, carryCols)
    val carryType = StructType(carryCols.map(c =>
      StructField(c, build.schema(c).dataType, nullable = true)))
    // probe (0) before build (1) at equal timestamps — the probe's
    // forward frame starts at itself, so the tied build row must follow
    val probeSide = probe.select(
      probeCols.map(col) :+ lit(null).cast(carryType).as("__carry")
        :+ lit(0).as("__side"): _*)
    val buildSide = build.select(
      probeCols.map(c =>
        if (keyCols.contains(c) || c == tsCol) col(c)
        else lit(null).cast(probe.schema(c).dataType).as(c)) :+
        struct(carryCols.map(col): _*).cast(carryType).as("__carry") :+
        lit(1).as("__side"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__carry").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = probeSide.unionByName(buildSide)
      .withColumn("__carried", first(col("__carry"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 0)
      .select(probeCols.map(col) ++
        carryCols.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /** Nearest as-of join: carries whichever build row is closest in time
    * to the probe, looking BOTH directions; exact ties (including an
    * equal-ts build row) resolve backward. Both direction carries come
    * from the SAME single sort — two window frames over one exchange —
    * so this costs the same one shuffle as either directed variant.
    */
  def nearest(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
      tsCol: String, carryCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    checkArgs(probe, build, keyCols, tsCol, carryCols)
    // build ts rides inside the carry struct so the chosen distance and
    // the chosen values are guaranteed to come from the same build row
    val carryType = StructType(
      StructField("__bts", build.schema(tsCol).dataType, nullable = true) +:
        carryCols.map(c =>
          StructField(c, build.schema(c).dataType, nullable = true)))
    // build (0) before probe (1) at equal ts: the backward frame (which
    // ends at the probe) sees the tied row, the strictly-after forward
    // frame does not — and backward wins distance-0 ties anyway
    val probeSide = probe.select(
      probeCols.map(col) :+ lit(null).cast(carryType).as("__carry")
        :+ lit(1).as("__side"): _*)
    val buildSide = build.select(
      probeCols.map(c =>
        if (keyCols.contains(c) || c == tsCol) col(c)
        else lit(null).cast(probe.schema(c).dataType).as(c)) :+
        struct(col(tsCol).as("__bts") +: carryCols.map(col): _*)
          .cast(carryType).as("__carry") :+
        lit(0).as("__side"): _*)
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__carry").asc)
    val back = last(col("__carry"), ignoreNulls = true)
      .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first(col("__carry"), ignoreNulls = true)
      .over(ord.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val backDist = col(tsCol).cast("double") - col("__bk.__bts").cast("double")
    val fwdDist = col("__fw.__bts").cast("double") - col(tsCol).cast("double")
    val carried = probeSide.unionByName(buildSide)
      .withColumn("__bk", back).withColumn("__fw", fwd)
      .withColumn("__chosen",
        when(col("__bk").isNotNull &&
          (col("__fw").isNull || backDist <= fwdDist), col("__bk"))
          .otherwise(col("__fw")))
    carried.filter(col("__side") === 1)
      .select(probeCols.map(col) ++
        carryCols.map(c => col(s"__chosen.$c").as(c)): _*)
  }

  private def checkArgs(probe: DataFrame, build: DataFrame,
      keyCols: Seq[String], tsCol: String, carryCols: Seq[String]): Unit = {
    val probeCols = probe.columns.toSeq
    require(carryCols.nonEmpty, "carryCols must be non-empty")
    require(!carryCols.exists(probeCols.contains),
      s"carry columns ${carryCols.mkString(",")} collide with probe columns")
    require(!probeCols.contains("__side") && !probeCols.contains("__carry"),
      "probe columns __side / __carry are reserved")
    (keyCols :+ tsCol).foreach { c =>
      require(probeCols.contains(c), s"probe side is missing column $c")
      require(build.columns.contains(c), s"build side is missing column $c")
    }
  }
}
