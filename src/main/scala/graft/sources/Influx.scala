package graft.sources

import org.apache.spark.sql.types._

/** S3's PRODUCTION mapping — the InfluxDB/Flux option seam, in the
  * [[JdbcSource]] style.
  *
  * The reference builds a Flux query from (measurement, range, fields,
  * tags) and flattens the result into long-format rows
  * `(time, measurement, field, value, tag…)`
  * (`influx_connector.py:142-189`). This seam compiles the SAME
  * artifact deterministically: [[flux]] is the query a deployment
  * hands to the Influx query API, [[resultSchema]] is the long-format
  * schema contract its rows satisfy — the exact shape
  * `Sources.timeRange` + `Sources.toLong`/`toWide` (the S3 dev
  * surface) operate on, so everything downstream of ingestion is
  * already built and judged against lake tables of that shape.
  *
  * No InfluxDB (and no Spark Influx connector jar) exists in this
  * sandbox, so the seam is exercised at the compilation level:
  * SourcesSpec asserts the exact Flux text, clause order, and schema,
  * exactly as it does for the JDBC and Mongo option maps.
  */
final case class InfluxSource(
    url: String,
    org: String,
    bucket: String,
    measurement: String,
    start: String = "-1h",
    stop: String = "now()",
    fields: Seq[String] = Nil,
    tags: Map[String, String] = Map.empty) {

  require(url.startsWith("http://") || url.startsWith("https://"),
    s"not an influx url: $url")
  require(bucket.nonEmpty && measurement.nonEmpty,
    "bucket and measurement are required")
  // the same grammar Sources.rangeBound accepts on the dev surface:
  // relative -N[smhdw], now(), or an ISO timestamp. The ISO tail is
  // restricted to timestamp characters — an open-ended `.*` would let
  // a crafted bound close the time(v: "...") string literal and
  // append Flux, the exact hole the identifier checks below close.
  private val rangeSpec =
    "^(-\\d+[smhdw]|now\\(\\)|\\d{4}-\\d{2}-\\d{2}([T ][0-9:.]+Z?)?)$".r
  require(rangeSpec.matches(start.trim), s"bad range start: $start")
  require(rangeSpec.matches(stop.trim), s"bad range stop: $stop")
  // measurement/field/tag-VALUE strings are quote-wrapped in the Flux
  // text, so refusing the quote/backslash/newline metacharacters is
  // sufficient there — trusted static configuration, same contract as
  // JdbcSource, metachars refused outright as defense in depth
  private def rejectFluxMeta(kind: String, s: String): Unit =
    require(!s.exists(c => c == '"' || c == '\\' || c == '\n'),
      s"$kind contains Flux metacharacters: $s")
  rejectFluxMeta("measurement", measurement)
  fields.foreach(rejectFluxMeta("field", _))
  // tag KEYS are interpolated BARE (`r.$k`), where the metacharacter
  // check is not enough: `host == r._field or r.x` carries no quote yet
  // rewrites the filter. Bare interpolation demands a bare identifier.
  private val fluxIdent = "^[A-Za-z_][A-Za-z0-9_]*$".r
  tags.foreach { case (k, v) =>
    require(fluxIdent.matches(k), s"tag key is not a Flux identifier: $k")
    rejectFluxMeta("tag value", v)
  }

  /** The ISO form is passed to Flux as `time(v: "...")`; relative and
    * now() specs pass through bare. */
  private def fluxTime(spec: String): String = spec.trim match {
    case s if s.startsWith("-") || s == "now()" => s
    case iso => "time(v: \"" + iso.replace(" ", "T") + "\")"
  }

  /** The compiled Flux query — clause for clause the reference's
    * builder (`influx_connector.py:148-163`): range, measurement
    * filter, OR-joined field filter, one chained filter per tag (tag
    * keys sorted so the artifact is deterministic). */
  def flux: String = {
    val sb = new StringBuilder
    sb ++= s"""from(bucket: "$bucket")\n"""
    sb ++= s"  |> range(start: ${fluxTime(start)}, stop: ${fluxTime(stop)})\n"
    sb ++= s"""  |> filter(fn: (r) => r._measurement == "$measurement")"""
    if (fields.nonEmpty) {
      val or = fields.map(f => s"""r._field == "$f"""").mkString(" or ")
      sb ++= s"\n  |> filter(fn: (r) => $or)"
    }
    tags.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb ++= s"""\n  |> filter(fn: (r) => r.$k == "$v")"""
    }
    sb.result()
  }

  /** The long-format schema contract of the flattened result
    * (`influx_connector.py:168-185`): fixed columns + one string
    * column per tag key, in sorted order — `Sources.toWide` pivots
    * this shape back to wide. */
  def resultSchema: StructType = StructType(
    Seq(
      StructField("time", TimestampType, nullable = false),
      StructField("measurement", StringType, nullable = false),
      StructField("field", StringType, nullable = false),
      StructField("value", DoubleType, nullable = true)) ++
      tags.keys.toSeq.sorted.map(k =>
        StructField(k, StringType, nullable = true)))
}
