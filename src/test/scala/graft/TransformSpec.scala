package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.transform._

/** Pins the reference's own test assertions (FIXTURES.md §B;
  * tests/unit/test_etl_pipeline.py + test_system_integration.py). */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  private def users = Seq(
    ("  John Doe  ", "JOHN@TEST.COM", "(555) 123-4567", "30", "active"),
    ("Jane", "jane@test.com", "5551234567", "25.5", "inactive")
  ).toDF("name", "email", "phone", "age", "status")

  test("cleaning: trim / lower email / coerce age / title status (test_etl_pipeline.py:104-107)") {
    val out = Cleaning(coerce = Map("age" -> "double"), stamp = Stamp.off)(users)
    val r = out.orderBy("email").collect()
    assert(r(1).getAs[String]("name") == "John Doe")
    assert(r(1).getAs[String]("email") == "john@test.com")
    assert(r(1).getAs[Double]("age") == 30.0)
    assert(r(1).getAs[String]("status") == "Active")
    assert(r(0).getAs[String]("status") == "Inactive")
  }

  test("cleaning: inferCoercions picks long for integral, double for mixed") {
    val df = Seq(("30", "1.5"), ("42", "2")).toDF("a", "b")
    val m = Cleaning.inferCoercions(df)
    assert(m == Map("a" -> "long", "b" -> "double"))
  }

  test("cleaning: phone normalization 10/11/other digits (data_transformers.py:72-83)") {
    val df = Seq("(555) 123-4567", "15551234567", "12345").toDF("phone")
    val out = Cleaning(stamp = Stamp.off)(df).as[String].collect()
    assert(out.contains("(555) 123-4567"))
    assert(out.contains("+1 (555) 123-4567"))
    assert(out.contains("12345")) // unstandardizable → original
  }

  test("cleaning: empty string and NaN become null (data_transformers.py:39-41)") {
    val df = Seq(("", 1.0), ("x", Double.NaN)).toDF("s", "d")
    val out = Cleaning(stamp = Stamp.off)(df).collect()
    assert(out.exists(r => r.isNullAt(0) && r.getDouble(1) == 1.0))
    assert(out.exists(r => r.getString(0) == "x" && r.isNullAt(1)))
  }

  test("cleaning: _cleaned_at stamped when on") {
    val out = Cleaning()(users)
    assert(out.columns.contains("_cleaned_at"))
    assert(out.select("_cleaned_at").head().getString(0) != null)
  }

  test("validation: invalid email + age>150 flagged (test_etl_pipeline.py:125-128)") {
    val rules = Map(
      "email" -> FieldRule(required = true, typ = Some("email")),
      "age" -> FieldRule(min = Some(0), max = Some(150)))
    val df = Seq(("invalid-email", 200L), ("ok@test.com", 30L))
      .toDF("email", "age")
    val out = Validation(rules, Stamp.off)(df).orderBy("age").collect()
    val bad = out(1)
    assert(!bad.getAs[Boolean]("_is_valid"))
    val errs = bad.getAs[scala.collection.Seq[String]]("_validation_errors")
    assert(errs.contains("email is not a valid email"))
    assert(errs.contains("age exceeds maximum value 150"))
    assert(out(0).getAs[Boolean]("_is_valid"))
  }

  test("validation: required fires on null and empty string") {
    val df = Seq(Some(""), Some("x@y.com"), None).map(Tuple1(_)).toDF("email")
    val rules = Map("email" -> FieldRule(required = true, typ = Some("email")))
    val out = Validation(rules, Stamp.off)(df).collect()
    assert(out.count(!_.getAs[Boolean]("_is_valid")) == 2)
  }

  test("validation: date rule accepts iso with Z (data_transformers.py:143-149)") {
    val df = Seq("2023-01-01T10:00:00Z", "not-a-date", "2023-06-15")
      .toDF("created_at")
    val rules = Map("created_at" -> FieldRule(typ = Some("date")))
    val out = Validation(rules, Stamp.off)(df).collect()
    assert(out.count(_.getAs[Boolean]("_is_valid")) == 2)
  }

  test("enrichment: age, postal code, record hash (data_transformers.py:152-185)") {
    val df = Seq(
      ("a@b.com", "555", "Jo", "1990-06-15", "1 Main St, Springfield 12345-6789"))
      .toDF("email", "phone", "name", "birth_date", "address")
    val out = Enrichment(Stamp.off, asOfDate = Some("2023-06-15"))(df).head()
    assert(out.getAs[Long]("calculated_age") == 33L)
    assert(out.getAs[String]("extracted_postal_code") == "12345-6789")
    assert(out.getAs[String]("_record_hash") != null)
  }

  test("enrichment: hash equal iff key fields equal") {
    val df = Seq(("a@b.com", "1", "Jo", "x"), ("a@b.com", "1", "Jo", "y"),
      ("c@d.com", "1", "Jo", "x")).toDF("email", "phone", "name", "other")
    val hashes = Enrichment(Stamp.off)(df).select("_record_hash")
      .as[String].collect()
    assert(hashes(0) == hashes(1) && hashes(0) != hashes(2))
  }

  test("normalization: standard renames don't clobber (data_transformers.py:196-225)") {
    val df = Seq((1L, "Jo", "2020-01-01")).toDF("id", "name", "created")
    val out = Normalization()(df)
    assert(out.columns.toSet == Set("record_id", "full_name", "created_at"))
    val df2 = Seq((1L, 2L)).toDF("id", "record_id")
    assert(Normalization()(df2).columns.toSet == Set("id", "record_id"))
    val df3 = Seq((1L, "x")).toDF("user_id", "email_address")
    val out3 = Normalization(Map("user_id" -> "uid"))(df3)
    assert(out3.columns.toSet == Set("uid", "email"))
  }

  test("aggregation: count/sum/avg/min/max with {field}_{fn} names (data_transformers.py:227-288)") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("k", "v")
    val out = Aggregation(Seq("k"), Seq("v" -> "sum", "v" -> "avg",
      "v" -> "min", "v" -> "max", "v" -> "count"))(df)
      .orderBy("k").collect()
    assert(out(0).getAs[Double]("v_sum") == 4.0)
    assert(out(0).getAs[Double]("v_avg") == 2.0)
    assert(out(0).getAs[Long]("_record_count") == 2L)
    assert(out(1).getAs[Double]("v_min") == 5.0)
  }

  test("pipeline: chained transformers + plan-failure isolation (data_transformers.py:290-311)") {
    val p = Pipeline(Seq(
      Cleaning(stamp = Stamp.off),
      new Transformer {
        val name = "Broken"
        def apply(df: org.apache.spark.sql.DataFrame) =
          throw new RuntimeException("boom")
      },
      Validation(Map("email" -> FieldRule(typ = Some("email"))), Stamp.off)))
    val (out, errs) = p.run(users)
    assert(errs == Seq("Broken: boom"))
    assert(out.columns.contains("_is_valid"))
    assert(out.count() == 2)
  }

  test("record-level error isolation: failing rows keep values, gain errors, never drop (data_transformers.py:297-311)") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "25", 5.0), (2L, "xx", 0.0), (3L, "30", 0.0))
      .toDF("id", "age_str", "div")
    val stages = Seq(
      IsolatedStage("Clean", lit("bad int"),
        fails = col("age_str").try_cast("long").isNull,
        outputs = Map("age" -> col("age_str").try_cast("long"),
          // second output reads the PRE-stage row (the Python
          // transform(dict) contract), not the first output
          "age_len" -> length(col("age_str")))),
      IsolatedStage("Enrich", lit("div by zero"),
        fails = col("div") === 0.0,
        outputs = Map("ratio" -> (lit(10.0) / col("div")),
          // a stage may REWRITE an existing column; failing rows keep
          // the pre-stage value
          "age" -> (col("age") + 100L))))
    val out = ErrorIsolation.run(df, stages)
      .orderBy("id").collect()
    // row 1: both stages apply
    assert(out(0).getAs[Long]("age") == 125L &&
      out(0).getAs[Double]("ratio") == 2.0 &&
      out(0).getSeq[String](out(0).fieldIndex("_transformation_errors"))
        .isEmpty)
    // row 2: both fail — age null (dict key never added), ratio null,
    // both errors in order
    assert(out(1).isNullAt(out(1).fieldIndex("age")) &&
      out(1).isNullAt(out(1).fieldIndex("ratio")))
    assert(out(1).getSeq[String](out(1).fieldIndex("_transformation_errors"))
      == Seq("Clean: bad int", "Enrich: div by zero"))
    // row 3: stage 1 applies (age 30), stage 2 fails — age KEEPS the
    // stage-1 value (not +100), one error
    assert(out(2).getAs[Long]("age") == 30L &&
      out(2).isNullAt(out(2).fieldIndex("ratio")))
    assert(out(2).getSeq[String](out(2).fieldIndex("_transformation_errors"))
      == Seq("Enrich: div by zero"))
    // never drops: 3 in, 3 out; stage counts roll up
    val counts = ErrorIsolation.stageCounts(
      ErrorIsolation.run(df, stages), stages).head()
    assert(counts.getAs[Long]("rows_out") == 3L &&
      counts.getAs[Long]("rows_clean") == 1L &&
      counts.getAs[Long]("err_clean") == 1L &&
      counts.getAs[Long]("err_enrich") == 2L)
    // a pre-seeded _transformation_errors column is appended to, not
    // reset (re-entrant chains)
    val seeded = df.withColumn("_transformation_errors",
      array(lit("Prior: upstream")))
    val reRun = ErrorIsolation.run(seeded, stages.take(1))
      .orderBy("id").collect()
    assert(reRun(1).getSeq[String](
      reRun(1).fieldIndex("_transformation_errors"))
      == Seq("Prior: upstream", "Clean: bad int"))
  }
}
