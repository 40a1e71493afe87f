package graft

import org.apache.spark.sql.functions._
import graft.functions.scalars._

/** Type-detection oracle + scalar semantics
  * (tests/unit/test_etl_pipeline.py:316-325, common_utils.py). */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  private def detect(vs: String*): Seq[String] =
    vs.toDF("v").select(detectStringType(col("v")).as("t"))
      .as[String].collect().toSeq

  test("type detection oracle (test_etl_pipeline.py:318-325)") {
    assert(detect("john@example.com") == Seq("email"))
    assert(detect("(555) 123-4567") == Seq("phone"))
    assert(detect("2023-01-01") == Seq("date"))
    assert(detect("https://example.com") == Seq("url"))
    assert(detect("hello world") == Seq("string"))
  }

  test("numeric/boolean/null detection by schema type (common_utils.py:24-52)") {
    val df = Seq((42L, 3.14, true)).toDF("i", "f", "b")
    val r = df.select(
      detectType(col("i"), org.apache.spark.sql.types.LongType),
      detectType(col("f"), org.apache.spark.sql.types.DoubleType),
      detectType(col("b"), org.apache.spark.sql.types.BooleanType)).head()
    assert(r.getString(0) == "integer" && r.getString(1) == "float" &&
      r.getString(2) == "boolean")
  }

  test("phone detector bounds 10-15 digits (common_utils.py:61-67)") {
    assert(detect("123456789") == Seq("string"))     // 9 digits
    assert(detect("+1-234-567-8901-2345") == Seq("phone")) // 15
    assert(detect("1234567890123456") == Seq("string"))    // 16
  }

  test("multi-format date parse (common_utils.py:70-84)") {
    val ok = Seq("2023-01-01", "2023/01/01", "01-02-2023", "01/02/2023",
      "2023-01-01 10:00:00", "2023-01-01T10:00:00", "2023-01-01T10:00:00Z")
    val parsed = ok.toDF("v").select(isDate(col("v"))).as[Boolean].collect()
    assert(parsed.forall(identity))
    assert(detect("13/13/2023") == Seq("string")) // no format matches
  }

  test("url detector (common_utils.py:86-97)") {
    assert(detect("http://localhost:8080/x") == Seq("url"))
    assert(detect("https://10.0.0.1/path?q=1") == Seq("url"))
    assert(detect("ftp://example.com") == Seq("string"))
  }

  test("sanitize strips control chars (common_utils.py:417-428)") {
    val out = Seq("  abc  ").toDF("v")
      .select(sanitize(col("v"))).as[String].head()
    assert(out == "abc")
  }

  test("json validity (common_utils.py:408-414)") {
    val r = Seq("""{"k": 1}""", "not json", "[1,2]").toDF("v")
      .select(isValidJson(col("v"))).as[Boolean].collect()
    assert(r.toSeq == Seq(true, false, true))
  }

  test("timeAgo buckets (common_utils.py:317-331)") {
    val r = Seq(30, 120, 7200, 172800).toDF("s")
      .select(timeAgo(col("s"))).as[String].collect()
    assert(r.toSeq == Seq("30 seconds ago", "2 minutes ago", "2 hours ago",
      "2 days ago"))
  }

  test("recordHashJson sorted-key stability (common_utils.py:176-186)") {
    val df = Seq((1L, "a")).toDF("z", "a")
    val h1 = df.select(recordHashJson(df, Seq("z", "a")).as("h")).as[String].head()
    val h2 = df.select(recordHashJson(df, Seq("a", "z")).as("h")).as[String].head()
    assert(h1 == h2)
  }

  test("scrubPii redacts emails, SSNs, and phones to typed markers") {
    val out = Seq(
      "mail a.b-c@sub.ex.co phone 555-123-4567 ssn 987-65-4321",
      "ssn-like inside email stays safe: a-123-45-6789b@x.com",
      "no pii here 12-34").toDF("s")
      .select(scrubPii($"s").as("r")).as[String].collect()
    assert(out(0) == "mail [EMAIL] phone [PHONE] ssn [ID]")
    assert(out(1) == "ssn-like inside email stays safe: [EMAIL]")
    assert(out(2) == "no pii here 12-34")
  }
}
