package graft.sources

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** InfluxDB LINE PROTOCOL — the public text wire format the reference's
  * Influx loader actually writes points through
  * (`influx_connector.py:82-111`: measurement + tags + fields + time
  * per point) and its query side reads back. [[InfluxSource]] makes the
  * QUERY artifact (Flux) real; this module makes the DATA artifact
  * real: a full serializer and a total parser for
  *
  * {{{ measurement,tag1=v1,tag2=v2 f1=1i,f2=2.5,f3="s",f4=true 1700000000000000000 }}}
  *
  * Escaping follows the published grammar — measurement escapes comma
  * and space; tag keys/values and field keys escape comma, equals and
  * space; string field values are double-quoted with `"` and `\`
  * escaped; integers carry the `i` suffix; booleans are bare
  * `true`/`false`; timestamps are nanoseconds since epoch. Backslash
  * itself is also escaped (`\` → `\\`) so the mapping is BIJECTIVE:
  * serialize∘parse ≡ identity for every value (the published grammar
  * leaves lone-backslash handling ambiguous; emitting the escaped form
  * stays parseable by Influx and removes the ambiguity). Newlines are
  * refused in bare (non-quoted) positions — they would break the
  * one-point-per-line framing on a real wire.
  *
  * Scale shape: serialization is a stateless per-row projection
  * (`Dataset.map`, whole-stage-friendly typed pipeline, no shuffle);
  * parsing is a per-line `flatMap` that SKIPS malformed lines instead
  * of throwing — the one-bad-record contract every file source here
  * honors (`Sources.quarantine`). Both run embarrassingly parallel
  * over partitions at any corpus size.
  */
object LineProtocol {

  /** Parsed point: fields split by DECODED TYPE so the frame is fully
    * typed without a per-field cast layer — `fields_long` holds `i`-
    * suffixed integers, `fields_double` bare numerics, `fields_bool`
    * booleans, `fields_str` unquoted strings. `time` is null when the
    * line carries no timestamp (Influx then assigns server time). */
  final case class Point(
      measurement: String,
      tags: Map[String, String],
      fields_long: Map[String, Long],
      fields_double: Map[String, Double],
      fields_bool: Map[String, Boolean],
      fields_str: Map[String, String],
      time: Timestamp)

  private def hasNewline(s: String): Boolean =
    s != null && s.exists(c => c == '\n' || c == '\r')

  private def rejectNewline(kind: String, s: String): Unit =
    require(!hasNewline(s),
      s"$kind cannot contain a newline (breaks line framing): $s")

  /** Escape for bare positions. `forMeasurement` skips `=` (legal bare
    * in a measurement name). */
  private def esc(s: String, forMeasurement: Boolean): String = {
    val sb = new StringBuilder(s.length + 4)
    s.foreach {
      case '\\' => sb ++= "\\\\"
      case ',' => sb ++= "\\,"
      case ' ' => sb ++= "\\ "
      case '=' if !forMeasurement => sb ++= "\\="
      case c => sb += c
    }
    sb.result()
  }

  private[sources] def escMeasurement(s: String): String = {
    rejectNewline("measurement", s); esc(s, forMeasurement = true)
  }
  private[sources] def escKey(s: String): String = {
    rejectNewline("tag/field key", s); esc(s, forMeasurement = false)
  }
  private[sources] def escTagValue(s: String): String = escKey(s)

  /** String field values live inside double quotes: only `"` and `\`
    * escape there (per the published grammar). */
  private[sources] def quoteFieldValue(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb += '"'
    s.foreach {
      case '\\' => sb ++= "\\\\"
      case '"' => sb ++= "\\\""
      case c => sb += c
    }
    sb += '"'
    sb.result()
  }

  private def tsToNanos(ts: Timestamp): Long = {
    val i = ts.toInstant
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000000L),
      i.getNano.toLong)
  }

  private def nanosToTs(ns: Long): Timestamp = Timestamp.from(
    Instant.ofEpochSecond(Math.floorDiv(ns, 1000000000L),
      Math.floorMod(ns, 1000000000L)))

  /** Serialize one point from already-typed parts. Rows with no
    * non-null field yield None (a point must carry ≥ 1 field), and so
    * do rows carrying a NEWLINE anywhere a line-framed wire cannot
    * hold one (measurement, tag keys/values, field keys, string field
    * values) — the module's one-bad-record skip-don't-throw contract;
    * a single such row must not fail the whole serialize job. (The
    * explicitly-called escape helpers keep their throwing check.)
    * Tags with null values are omitted; tag/field ordering is
    * sorted-by-key so the artifact is deterministic. */
  def serializePoint(measurement: String,
      tags: Seq[(String, String)], fields: Seq[(String, Any)],
      time: Option[Timestamp]): Option[String] = {
    val live = fields.filter(_._2 != null)
    if (live.isEmpty || measurement == null) return None
    if (hasNewline(measurement) ||
      tags.exists { case (k, v) =>
        v != null && (hasNewline(k) || hasNewline(v)) } ||
      live.exists { case (k, v) =>
        hasNewline(k) || (v match {
          case s: String => hasNewline(s)
          case _: Long | _: Int | _: Short | _: Byte | _: Double |
              _: Float | _: Boolean => false
          case other => hasNewline(other.toString)
        })
      }) return None
    val sb = new StringBuilder
    sb ++= escMeasurement(measurement)
    tags.filter(_._2 != null).sortBy(_._1).foreach { case (k, v) =>
      sb += ','
      sb ++= escKey(k); sb += '='; sb ++= escTagValue(v)
    }
    sb += ' '
    sb ++= live.sortBy(_._1).map { case (k, v) =>
      val value = v match {
        case l: Long => s"${l}i"
        case i: Int => s"${i}i"
        case s: Short => s"${s}i"
        case b: Byte => s"${b}i"
        case d: Double => d.toString
        case f: Float => f.toDouble.toString
        case d: java.math.BigDecimal => d.doubleValue.toString
        case b: Boolean => b.toString
        case s: String => quoteFieldValue(s) // newline-free (pre-checked)
        case other => quoteFieldValue(other.toString)
      }
      s"${escKey(k)}=$value"
    }.mkString(",")
    time.foreach { t => sb += ' '; sb ++= tsToNanos(t).toString }
    Some(sb.result())
  }

  /** Serialize a frame to line-protocol text, one point per row —
    * the wire form of `Sinks.pointsFrame`'s (tags, fields, time)
    * split. `fieldFields` defaults to every non-tag non-time column
    * (line protocol carries typed fields, so strings and booleans
    * ride along, unlike the numeric-only long-format default). */
  def serialize(df: DataFrame, measurement: String, timeField: String,
      tagFields: Seq[String], fieldFields: Seq[String] = Nil): Dataset[String] = {
    val fields =
      if (fieldFields.nonEmpty) fieldFields
      else df.columns.toSeq.filterNot(tagFields.contains)
        .filterNot(_ == timeField)
    val proj = df.select(
      (col(timeField).cast(TimestampType).as("__t") +:
        tagFields.map(t => col(t).cast(StringType))) ++
        fields.map(col): _*)
    val fieldTypes: Seq[(String, DataType)] =
      fields.map(f => f -> df.schema(f).dataType)
    val nTags = tagFields.size
    import proj.sparkSession.implicits._
    proj.map { row =>
      val time = Option(row.getAs[Timestamp](0))
      val tags = tagFields.zipWithIndex.map { case (t, i) =>
        t -> row.getAs[String](1 + i)
      }
      val fvals = fieldTypes.zipWithIndex.map { case ((f, _), i) =>
        f -> row.get(1 + nTags + i)
      }
      serializePoint(measurement, tags, fvals, time).getOrElse("")
    }.filter(_.nonEmpty)
  }

  /** Total single-line parser: None on anything malformed (empty line,
    * missing fields, bad numeric, unterminated quote) — skip, don't
    * throw. */
  def parsePoint(line: String): Option[Point] = {
    if (line == null || line.isEmpty || line.startsWith("#")) return None
    val n = line.length
    var i = 0
    // read a bare token up to any unescaped char in `stop`, unescaping
    def bare(stop: Set[Char]): Option[String] = {
      val sb = new StringBuilder
      var done = false
      while (!done && i < n) {
        val c = line.charAt(i)
        if (c == '\\' && i + 1 < n) { sb += line.charAt(i + 1); i += 2 }
        else if (stop(c)) done = true
        else { sb += c; i += 1 }
      }
      if (sb.isEmpty) None else Some(sb.result())
    }
    val meas = bare(Set(',', ' ')).getOrElse(return None)
    // tags
    val tags = Map.newBuilder[String, String]
    while (i < n && line.charAt(i) == ',') {
      i += 1
      val k = bare(Set('=')).getOrElse(return None)
      if (i >= n || line.charAt(i) != '=') return None
      i += 1
      val v = bare(Set(',', ' ')).getOrElse(return None)
      tags += k -> v
    }
    if (i >= n || line.charAt(i) != ' ') return None
    i += 1
    // fields
    val fl = Map.newBuilder[String, Long]
    val fd = Map.newBuilder[String, Double]
    val fb = Map.newBuilder[String, Boolean]
    val fs = Map.newBuilder[String, String]
    var more = true
    var any = false
    while (more) {
      val k = bare(Set('=')).getOrElse(return None)
      if (i >= n || line.charAt(i) != '=') return None
      i += 1
      if (i < n && line.charAt(i) == '"') {
        // quoted string value: only \" and \\ escape inside
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (!closed) {
          if (i >= n) return None // unterminated
          val c = line.charAt(i)
          if (c == '\\' && i + 1 < n) { sb += line.charAt(i + 1); i += 2 }
          else if (c == '"') { closed = true; i += 1 }
          else { sb += c; i += 1 }
        }
        fs += k -> sb.result()
      } else {
        val raw = bare(Set(',', ' ')).getOrElse(return None)
        raw match {
          case "true" | "t" | "T" | "TRUE" | "True" => fb += k -> true
          case "false" | "f" | "F" | "FALSE" | "False" => fb += k -> false
          case r if r.endsWith("i") || r.endsWith("u") =>
            fl += k -> (try r.dropRight(1).toLong
            catch { case _: NumberFormatException => return None })
          case r =>
            fd += k -> (try r.toDouble
            catch { case _: NumberFormatException => return None })
        }
      }
      any = true
      if (i < n && line.charAt(i) == ',') i += 1 else more = false
    }
    if (!any) return None
    // optional timestamp
    var time: Timestamp = null
    if (i < n) {
      if (line.charAt(i) != ' ') return None
      i += 1
      val rest = line.substring(i).trim
      if (rest.nonEmpty)
        time = try nanosToTs(rest.toLong)
        catch { case _: NumberFormatException => return None }
    }
    Some(Point(meas, tags.result(), fl.result(), fd.result(),
      fb.result(), fs.result(), time))
  }

  /** Parse a frame of line-protocol text into typed [[Point]] rows;
    * malformed lines are dropped (quarantine the complement upstream
    * if they must be kept). */
  def parse(lines: Dataset[String]): DataFrame = {
    import lines.sparkSession.implicits._
    lines.flatMap(parsePoint _).toDF()
  }
}
