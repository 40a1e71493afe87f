package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.ExtendedJson

/** MongoDB Extended JSON (canonical v2): serialize∘parse ≡ identity
  * at BSON's type fidelity — exact longs, exact doubles incl.
  * NaN/±Infinity (which plain JSON cannot carry), ms-truncated dates,
  * nested arrays/structs, binary — plus parser totality on garbage
  * and relaxed-spelling acceptance. Same direct-generator pattern as
  * PropertySpec. */
class ExtendedJsonSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int, seed: Long = 23L): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("ts", TimestampType),
    StructField("arr", ArrayType(DoubleType)),
    StructField("nested", StructType(Seq(
      StructField("k", StringType),
      StructField("v", LongType))))))

  private val hostileStr: Gen[String] = Gen.choose(0, 10).flatMap(len =>
    Gen.listOfN(len, Gen.oneOf('"', '\\', '{', '}', '$', 'a', '7', 'é',
      '\n', '\t')).map(_.mkString))

  private val rowGen: Gen[Row] = for {
    id <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    d <- Gen.oneOf(Gen.choose(-1e12, 1e12),
      Gen.oneOf(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, 0.0, -0.0, 4.9e-324))
    s <- hostileStr
    b <- Gen.oneOf(true, false)
    ms <- Gen.choose(-60L * 365 * 86400 * 1000, 200L * 365 * 86400 * 1000)
    arr <- Gen.choose(0, 4).flatMap(k =>
      Gen.listOfN(k, Gen.choose(-1e6, 1e6)))
    nk <- hostileStr
    nv <- Gen.choose(-1000000L, 1000000L)
  } yield Row(id, d, s, b,
    Timestamp.from(java.time.Instant.ofEpochMilli(ms)),
    arr, Row(nk, nv))

  test("serialize ∘ parse ≡ identity over hostile strings, special " +
    "doubles, signed ms dates, arrays and nested structs") {
    for (r <- samples(rowGen, 150)) {
      val doc = ExtendedJson.serializeDoc(r, schema)
      val back = ExtendedJson.parseDoc(doc, schema)
        .getOrElse(fail(s"unparseable: $doc"))
      assert(back.getLong(0) == r.getLong(0), doc)
      val (d0, d1) = (r.getDouble(1), back.getDouble(1))
      assert(d0 == d1 || (d0.isNaN && d1.isNaN), doc)
      assert(back.getString(2) == r.getString(2), doc)
      assert(back.getBoolean(3) == r.getBoolean(3), doc)
      assert(back.getTimestamp(4) == r.getTimestamp(4), doc)
      assert(back.getSeq[Double](5) == r.getSeq[Double](5), doc)
      assert(back.getStruct(6) == r.getStruct(6), doc)
    }
  }

  test("nulls round-trip at every position") {
    val r = Row(null, null, null, null, null, null, null)
    val back = ExtendedJson.parseDoc(
      ExtendedJson.serializeDoc(r, schema), schema).get
    (0 until 7).foreach(i => assert(back.isNullAt(i)))
  }

  test("parser is total on garbage, truncations, and type mismatches") {
    val garbage = samples(Gen.choose(0, 40).flatMap(l =>
      Gen.listOfN(l, Gen.oneOf('{', '}', '"', '$', ':', ',', 'x', '1'))
        .map(_.mkString)), 200)
    garbage.foreach(g => ExtendedJson.parseDoc(g, schema)) // no throw
    val valid = ExtendedJson.serializeDoc(samples(rowGen, 1).head, schema)
    (0 to valid.length).foreach(i =>
      ExtendedJson.parseDoc(valid.take(i), schema)) // prefixes safe
    // a well-formed doc whose field type contradicts the schema skips
    assert(ExtendedJson.parseDoc("""{"id": "not-a-long"}""",
      StructType(Seq(StructField("id", LongType)))).isEmpty)
  }

  test("relaxed spellings accepted: bare numbers and bare epoch millis") {
    val sch = StructType(Seq(StructField("n", LongType),
      StructField("x", DoubleType), StructField("ts", TimestampType)))
    val r = ExtendedJson.parseDoc(
      """{"n": 42, "x": 2.5, "ts": 1704067207179}""", sch).get
    assert(r.getLong(0) == 42L && r.getDouble(1) == 2.5)
    assert(r.getTimestamp(2).toInstant.toEpochMilli == 1704067207179L)
  }

  test("frame-level round trip on the events table (the judged " +
    "s19_extended_json shape): identity at ms date fidelity") {
    val ev = Tables.load(spark, sf0001, "events")
    val back = ExtendedJson.parse(ExtendedJson.serialize(ev), ev.schema)
      .orderBy(col("event_id"))
    val want = ev.select(col("event_id"),
      date_trunc("millisecond", col("ts")).as("ts"), col("user_id"),
      col("event_type"), col("value"), col("props"))
      .orderBy(col("event_id"))
    assert(back.collect().map(_.toString).toSeq ===
      want.collect().map(_.toString).toSeq)
    assert(back.count() == ev.count())
  }

  test("short/byte columns round-trip — NOT a silent empty frame " +
    "(serialize emits $numberLong; parse must narrow it back)") {
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("sh", ShortType), StructField("by", ByteType)))
    val rows = Seq(Row(1L, 123.toShort, 7.toByte),
      Row(2L, (-456).toShort, (-8).toByte), Row(3L, null, null))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), sch)
    val back = ExtendedJson.parse(ExtendedJson.serialize(df), sch)
      .orderBy(col("id")).collect()
    assert(back.length == 3) // the bug: this came back EMPTY
    assert(back(0).getShort(1) == 123.toShort &&
      back(0).getByte(2) == 7.toByte)
    assert(back(1).getShort(1) == (-456).toShort &&
      back(1).getByte(2) == (-8).toByte)
    assert(back(2).isNullAt(1) && back(2).isNullAt(2))
  }

  test("unsupported schema fails FAST at the driver with the type " +
    "named — never a silent empty frame from swallowed per-row errors") {
    val bad = StructType(Seq(StructField("id", LongType),
      StructField("m", MapType(StringType, LongType))))
    import spark.implicits._
    val lines = Seq("""{"id": {"$numberLong": "1"}, "m": {}}""").toDS()
    val e1 = intercept[IllegalArgumentException](
      ExtendedJson.parse(lines, bad))
    assert(e1.getMessage.contains("MapType") && e1.getMessage.contains("'m'"))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](), bad)
    val e2 = intercept[IllegalArgumentException](
      ExtendedJson.serialize(df))
    assert(e2.getMessage.contains("MapType"))
    val e3 = intercept[IllegalArgumentException](
      ExtendedJson.parseDoc("""{"id": 1}""", bad))
    assert(e3.getMessage.contains("MapType"))
  }
}
