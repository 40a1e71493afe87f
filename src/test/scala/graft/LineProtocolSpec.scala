package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.LineProtocol

/** Influx line protocol: serialize∘parse ≡ identity across the nasty
  * corners of the escaping grammar — commas/spaces/equals in tags and
  * keys, quotes/backslashes in string fields, all four field types,
  * nanosecond timestamps — plus totality of the parser on malformed
  * input (skip, don't throw). Same direct-generator pattern as
  * PropertySpec (the scalatest/scalacheck bridge isn't in the offline
  * cache). */
class LineProtocolSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long = 11L): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  // strings over a hostile alphabet: every metacharacter of the
  // grammar, plus letters and a non-ASCII char (newlines excluded —
  // they break line framing and the serializer refuses them)
  private val nasty: Gen[String] = Gen.choose(1, 12).flatMap(len =>
    Gen.listOfN(len,
      Gen.oneOf(',', ' ', '=', '"', '\\', 'a', 'Z', '7', 'é', '_'))
      .map(_.mkString))

  private case class Pt(meas: String, tags: Map[String, String],
      longs: Map[String, Long], dbls: Map[String, Double],
      bools: Map[String, Boolean], strs: Map[String, String],
      ns: Long)

  private def keyed[V](vg: Gen[V], max: Int): Gen[Map[String, V]] =
    Gen.choose(0, max).flatMap(k =>
      Gen.listOfN(k, Gen.zip(nasty, vg)).map(_.toMap))

  private val ptGen: Gen[Pt] = for {
    meas <- nasty
    tags <- keyed(nasty, 3)
    longs <- keyed(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2), 3)
    dbls <- keyed(Gen.oneOf(Gen.choose(-1e9, 1e9),
      Gen.oneOf(0.0, -0.0, 1e-300, 1.7976931348623157e308)), 3)
    bools <- keyed(Gen.oneOf(true, false), 2)
    strs <- keyed(nasty, 3)
    // one point must carry >= 1 field
    if longs.nonEmpty || dbls.nonEmpty || bools.nonEmpty || strs.nonEmpty
    // keys must be unique ACROSS the type maps (a real schema is)
    if (longs.keySet ++ dbls.keySet ++ bools.keySet ++ strs.keySet).size ==
      longs.size + dbls.size + bools.size + strs.size
    // ±: pre-1970 exercises floorDiv; cap at ±150 years (Long holds
    // ±292 years of nanoseconds)
    ns <- Gen.choose(-150L * 365 * 86400 * 1000000000L,
      150L * 365 * 86400 * 1000000000L)
  } yield Pt(meas, tags, longs, dbls, bools, strs,
    ns / 1000 * 1000) // µs-aligned: Timestamp carries µs, ns would drop

  test("serialize ∘ parse ≡ identity over hostile tags, keys, string " +
    "values, all field types, and signed ns timestamps") {
    for (p <- samples(ptGen, 120)) {
      val ts = {
        val sec = Math.floorDiv(p.ns, 1000000000L)
        val nano = Math.floorMod(p.ns, 1000000000L)
        Timestamp.from(java.time.Instant.ofEpochSecond(sec, nano))
      }
      val fields: Seq[(String, Any)] =
        p.longs.toSeq ++ p.dbls.toSeq ++ p.bools.toSeq ++ p.strs.toSeq
      val line = LineProtocol.serializePoint(p.meas, p.tags.toSeq,
        fields, Some(ts)).get
      val back = LineProtocol.parsePoint(line).getOrElse(
        fail(s"unparseable: $line"))
      assert(back.measurement == p.meas, line)
      assert(back.tags == p.tags, line)
      assert(back.fields_long == p.longs, line)
      assert(back.fields_bool == p.bools, line)
      assert(back.fields_str == p.strs, line)
      assert(back.fields_double.keySet == p.dbls.keySet, line)
      back.fields_double.foreach { case (k, v) =>
        val want = p.dbls(k)
        assert(v == want || (v.isNaN && want.isNaN), s"$k in $line")
      }
      assert(back.time == ts, line)
    }
  }

  test("parser is total: arbitrary garbage and truncations of valid " +
    "lines never throw, they skip") {
    val garbage = samples(Gen.choose(0, 40).flatMap(l =>
      Gen.listOfN(l, Gen.oneOf(',', ' ', '=', '"', '\\', 'x', '1', 'i'))
        .map(_.mkString)), 200)
    garbage.foreach(g => LineProtocol.parsePoint(g)) // must not throw
    val valid = LineProtocol.serializePoint("m",
      Seq("t" -> "v,v v=v"), Seq("f" -> "a\"b\\c", "n" -> 42L),
      Some(Timestamp.valueOf("2024-01-01 00:00:00"))).get
    (0 to valid.length).foreach(i =>
      LineProtocol.parsePoint(valid.take(i))) // every prefix is safe
  }

  test("grammar fixtures: the documented shapes parse to the " +
    "documented values") {
    val p = LineProtocol.parsePoint(
      """weather,location=us\,midwest,season=sum\ mer """ +
        """temp=82i,ratio=0.5,ok=true,desc="say \"hi\" \\ bye" """ +
        "1465839830100400200").get
    assert(p.measurement == "weather")
    assert(p.tags == Map("location" -> "us,midwest",
      "season" -> "sum mer"))
    assert(p.fields_long == Map("temp" -> 82L))
    assert(p.fields_double == Map("ratio" -> 0.5))
    assert(p.fields_bool == Map("ok" -> true))
    assert(p.fields_str == Map("desc" -> "say \"hi\" \\ bye"))
    assert(p.time != null)
    // no timestamp → null time (server-assigned upstream)
    assert(LineProtocol.parsePoint("m f=1i").get.time == null)
    // missing fields → skip
    assert(LineProtocol.parsePoint("m,t=v").isEmpty)
    assert(LineProtocol.parsePoint("").isEmpty)
  }

  test("frame-level round trip on the events table (the judged " +
    "s18_line_protocol shape) preserves every value and the µs " +
    "timestamp precision") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, sf0001, "events")
    val lines = LineProtocol.serialize(ev, "events", "ts",
      Seq("event_type"))
    val back = LineProtocol.parse(lines)
      .select(col("fields_long")("event_id").as("event_id"),
        col("time").as("ts"), col("fields_long")("user_id").as("user_id"),
        col("tags")("event_type").as("event_type"),
        col("fields_double")("value").as("value"),
        col("fields_str")("props").as("props"))
      .orderBy(col("event_id"))
    val want = ev.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id"))
    assert(back.collect().map(_.toString).toSeq ===
      want.collect().map(_.toString).toSeq)
    assert(back.count() == ev.count())
  }

  test("a newline-bearing value skips THAT row, never the job — the " +
    "one-bad-record contract holds on the serialize side too") {
    // row-level kernel: None (not a throw) for a newline anywhere a
    // line-framed wire cannot hold one
    assert(LineProtocol.serializePoint("m", Nil,
      Seq("f" -> "bad\nvalue"), None).isEmpty)
    assert(LineProtocol.serializePoint("m\r", Nil,
      Seq("f" -> 1L), None).isEmpty)
    assert(LineProtocol.serializePoint("m", Seq("t" -> "a\nb"),
      Seq("f" -> 1L), None).isEmpty)
    assert(LineProtocol.serializePoint("m", Nil,
      Seq("k\ney" -> 1L), None).isEmpty)
    // a null tag value is OMITTED, so a newline in its key is moot
    assert(LineProtocol.serializePoint("m", Seq("t\nx" -> null),
      Seq("f" -> 1L), None).isDefined)
    // frame level: one poisoned row among good ones must not fail the
    // job (the old require threw inside the executor-side map)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "ok", 1.5, java.sql.Timestamp.valueOf("2024-01-01 00:00:01")),
      (2L, "poison\npill", 2.5,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:02")),
      (3L, "fine", 3.5,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:03")))
      .toDF("id", "s", "v", "ts")
    val lines = LineProtocol.serialize(df, "m", "ts", Seq.empty).collect()
    assert(lines.length == 2, lines.mkString("|"))
    val ids = LineProtocol.parse(spark.createDataset(lines.toSeq))
      .select(col("fields_long")("id")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
  }
}
