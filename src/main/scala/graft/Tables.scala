package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Lake-table registry over the plain-Parquet lake layout.
  *
  * The reference (`/root/reference/`) spreads its data model across
  * PostgreSQL tables, MongoDB collections and InfluxDB measurements
  * (SURVEY.md §1.1); here every logical table is a Parquet-backed lake
  * table read through the vectorized Parquet reader, so Catalyst gets
  * column pruning + predicate/partition pruning for free.
  *
  * Scale stance (100 TB): table paths are directories in production
  * (date/source partitioned); the testdata ships single files, and
  * `spark.read.parquet` handles both. No data is ever collected to the
  * driver here — registration is lazy plan construction only.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables whose size is a CONSTANT of the data model (5
    * regions, 25 nations) — safe to broadcast at any scale factor, so
    * [[load]] attaches the hint. supplier/part are deliberately absent:
    * they grow linearly with SF and would overwhelm executors as
    * broadcast sides at 100 TB; their joins are AQE's call. */
  val smallDims: Set[String] = Set("region", "nation")

  /** Event-time columns whose PHYSICAL parquet layout is a generator
    * detail we must not depend on. Observed layouts across testdata
    * generations: TIMESTAMP(NANOS) (read as long ns + truncate to µs —
    * the same truncation DuckDB applies), TIMESTAMP(MICROS)
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ — reinterpreted in
    * the session zone, which the engine pins to UTC), and plain
    * µs-LTZ. All three normalize to session-UTC `TimestampType`, so
    * every downstream cast/epoch/window sees one type regardless of
    * which generator wrote the lake. */
  private val eventTimeColumns: Map[String, Seq[String]] =
    Map("events" -> Seq("ts"))

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Analyzed-plan cache: lake tables are immutable inputs, so the
    * relation (file listing + parquet footer schema) is resolved once
    * per (session, table) instead of once per query — the same reuse a
    * catalog table gets from its shared FileIndex. Plans only; no data
    * is cached (each query still scans). */
  private val planCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    planCache.getOrElseUpdate((spark, path(sfDir, name)),
      loadUncached(spark, sfDir, name))

  private def loadUncached(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    val tsCols = eventTimeColumns.getOrElse(name, Nil)
    if (tsCols.nonEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(sfDir, name))
    val fixed = tsCols.foldLeft(raw)((d, c) => normalizeEventTime(d, c))
    if (smallDims.contains(name)) broadcast(fixed) else fixed
  }

  /** Normalize one event-time column to session-UTC `TimestampType`
    * whatever the reader produced (see [[eventTimeColumns]]). */
  private[graft] def normalizeEventTime(d: DataFrame, c: String): DataFrame =
    d.schema.fields.find(_.name == c).map(_.dataType) match {
      // integer `div`, not `/`: epoch-ns exceeds double's 2^53 mantissa,
      // so float division would corrupt the low microsecond digits.
      case Some(LongType) =>
        d.withColumn(c, expr(s"timestamp_micros(`$c` div 1000)"))
      // NTZ → LTZ is a pure reinterpretation under the engine's pinned
      // UTC session zone: same wall-clock digits, same epoch micros.
      case Some(TimestampNTZType) =>
        d.withColumn(c, col(c).cast(TimestampType))
      case _ => d
  }

  /** Register every table as a temp view (schema-on-read catalog,
    * the Spark analogue of the reference's schema discovery surface —
    * SURVEY.md §2.1 S8). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
