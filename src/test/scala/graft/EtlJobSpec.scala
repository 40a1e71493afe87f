package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.etl._
import graft.sinks.Sinks
import graft.transform.{FieldRule, Stamp}

/** Workflow E2E mirroring test_system_integration.py:93-194: extract →
  * clean → validate → filter valid → load → verify output. */
class EtlJobSpec extends SparkSpec {
  import spark.implicits._

  test("full ETL: extract→clean→validate→route→verify (api/main.py:224-280)") {
    val dir = Files.createTempDirectory("graft_etl").toString
    // 4 records, 1 invalid (FIXTURES.md §B mixed batch)
    val src = Seq(
      ("  John Doe  ", "JOHN@TEST.COM", "30", "users"),
      ("Jane", "jane@test.com", "25", "users"),
      ("Bob", "bob@test.com", "40", "users"),
      ("", "invalid-email", "200", "users"))
      .toDF("name", "email", "age", "_source")

    val job = EtlJob(
      source = _ => src,
      transformations = Seq("cleaning", "validation"),
      validationRules = Map(
        "email" -> FieldRule(required = true, typ = Some("email")),
        "age" -> FieldRule(min = Some(0), max = Some(150))),
      routes = Seq(Sinks.Route("users_out", col("_is_valid"),
        d => Sinks.load(d.drop("_validation_errors"), s"$dir/users_out"))),
      stamp = Stamp.off)

    val result = job.run(spark)
    assert(result.stageErrors.isEmpty)
    assert(result.loadResults("users_out").count == 3) // invalid filtered
    val out = spark.read.parquet(s"$dir/users_out")
    assert(out.count() == 3)
    val john = out.where($"email" === "john@test.com").head()
    assert(john.getAs[String]("name") == "John Doe")
  }

  test("validation rules fire after cleaning coercion (age '200' string)") {
    // reference cleaning coerces '200'→200 so the range rule catches it
    val src = Seq(("a@b.com", "200")).toDF("email", "age")
    val cleaned = graft.transform.Cleaning(
      coerce = Map("age" -> "long"), stamp = Stamp.off)(src)
    val validated = graft.transform.Validation(
      Map("age" -> FieldRule(max = Some(150))), Stamp.off)(cleaned)
    assert(!validated.head().getAs[Boolean]("_is_valid"))
  }

  test("quality report measures rates instead of placeholders (dag:323-356)") {
    val r = EtlResult(95, Seq("cleaning"), Nil,
      Map("archive" -> Sinks.LoadResult("archive", "success", 95)))
    val report = QualityReport.build(spark, "run1",
      Map("postgres" -> 100L), r, durationSec = 60.0)
    val row = report.head()
    assert(row.getAs[Double]("success_rate") == 0.95)
    assert(row.getAs[Double]("records_per_minute") == 95.0)
    assert(row.getAs[Long]("records_loaded") == 95L)
  }

  test("unknown transformation isolated, not fatal (data_transformers.py:290-311)") {
    val job = EtlJob(source = _ => Seq((1L, "x")).toDF("id", "v"),
      transformations = Seq("cleaning", "nonexistent"), stamp = Stamp.off)
    intercept[IllegalArgumentException](job.run(spark))
  }
}
