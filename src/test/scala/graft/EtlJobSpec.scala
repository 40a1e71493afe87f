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

  test("DAG shape: 3 parallel sources → unionByName → transform → routed load (dag:43-397)") {
    val dir = Files.createTempDirectory("graft_dag").toString
    // three heterogeneous extracts, schemas only partially overlapping —
    // the DAG's staging-file concat is a UNION ALL by name, missing
    // columns nulled (multi_source_ingestion_dag.py:203-237)
    val pg = Seq((1L, "alice@x.com", 120.5), (2L, "bob@x.com", 99.0))
      .toDF("id", "email", "amount")
      .withColumn("_source", lit("postgres_transactions"))
    val mongo = Seq((10L, "click", "s1"), (11L, "view", "s2"))
      .toDF("id", "event_type", "session")
      .withColumn("_source", lit("mongo_events"))
    val api = Seq((20L, "carol@x.com", "NYC")).toDF("id", "email", "city")
      .withColumn("_source", lit("api_users"))
    val unioned = Seq(pg, mongo, api).reduce(
      _.unionByName(_, allowMissingColumns = true))

    val job = EtlJob(
      source = _ => unioned,
      transformations = Seq("cleaning"),
      routes = Sinks.standardRoutes(dir),
      stamp = Stamp.off)
    val result = job.run(spark)

    // routing per multi_source_ingestion_dag.py:267-305
    assert(result.loadResults("financial_data").count == 2)   // transactions
    assert(result.loadResults("processed_events").count == 2) // events
    assert(result.loadResults("user_data_wh").count == 1)     // users → both
    assert(result.loadResults("user_data_doc").count == 1)
    assert(result.loadResults("archive").count == 5)          // everything
    val archived = spark.read.parquet(s"$dir/archive")
    assert(archived.columns.toSet ==
      Set("id", "email", "amount", "_source", "event_type", "session", "city"))
    // missing columns nulled, not dropped
    assert(archived.where($"_source" === "mongo_events" &&
      $"email".isNull).count() == 2)

    val report = QualityReport.build(spark, "dag_run",
      Map("postgres" -> 2L, "mongo" -> 2L, "api" -> 1L), result, 30.0)
    assert(report.head().getAs[Double]("success_rate") == 1.0)
    assert(report.head().getAs[Long]("records_loaded") == 11L) // 2+2+1+1+5
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

  test("incremental rollup: N bookmark-gated folds equal the one-shot aggregate") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_incr_spec")
      .toString + "/rollup"
    val events = Tables.load(spark, sf0001, "events")
    // three cycles at uneven split points
    val b1 = graft.etl.Incremental.dailyEventRollup(spark,
      events.filter(col("ts") < lit("2024-01-08")), dir, None)
    val b2 = graft.etl.Incremental.dailyEventRollup(spark,
      events.filter(col("ts") < lit("2024-01-21")), dir, b1)
    val b3 = graft.etl.Incremental.dailyEventRollup(spark, events, dir, b2)
    // an empty pull keeps the bookmark and changes nothing
    val b4 = graft.etl.Incremental.dailyEventRollup(spark, events, dir, b3)
    assert(b4.isEmpty, "empty pull must return no new bookmark")
    val rolled = spark.read.parquet(dir)
      .orderBy("day", "event_type").collect()
    val oneShot = events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .orderBy("day", "event_type").collect()
    assert(rolled.length == oneShot.length)
    rolled.zip(oneShot).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) &&
        a.getString(1) == b.getString(1) && a.getLong(2) == b.getLong(2))
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-6)
    }
    // schema drift is loud, not silent
    intercept[IllegalArgumentException] {
      graft.etl.Incremental.mergeAdditive(spark, dir,
        Seq(("x", 1L)).toDF("day", "wrong_col"), Seq("day"))
    }
  }

  test("mergeable MV: min/max/sum folds reconstruct the one-shot aggregate") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_mvm_spec")
      .toString + "/rollup"
    val orders = Tables.load(spark, sf0001, "orders")
    def partial(cond: org.apache.spark.sql.Column) = orders.filter(cond)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    val merges = Seq("n" -> "sum", "total" -> "sum",
      "lo" -> "min", "hi" -> "max")
    // uneven thirds, folded out of date order — merge fns commute
    graft.etl.Incremental.mergeMergeable(spark, dir,
      partial(col("o_orderdate") >= "1999-01-01"), Seq("o_orderstatus"),
      merges)
    graft.etl.Incremental.mergeMergeable(spark, dir,
      partial(col("o_orderdate") < "1997-01-01"), Seq("o_orderstatus"),
      merges)
    graft.etl.Incremental.mergeMergeable(spark, dir,
      partial(col("o_orderdate") >= "1997-01-01" &&
        col("o_orderdate") < "1999-01-01"), Seq("o_orderstatus"), merges)
    val rolled = spark.read.parquet(dir).orderBy("o_orderstatus").collect()
    val oneShot = partial(lit(true)).orderBy("o_orderstatus").collect()
    assert(rolled.length == oneShot.length && rolled.nonEmpty)
    rolled.zip(oneShot).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getLong(1) == b.getLong(1))
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-6)
      assert(a.getDouble(3) == b.getDouble(3)) // min: exact, order-free
      assert(a.getDouble(4) == b.getDouble(4)) // max: exact, order-free
    }
    // unknown merge functions are loud
    intercept[IllegalArgumentException] {
      graft.etl.Incremental.mergeMergeable(spark, dir,
        partial(lit(true)), Seq("o_orderstatus"), Seq("n" -> "avg"))
    }
  }

  test("versioned rollup snapshots: time travel to any maintenance state") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_vr").toString
    val rollup = s"$base/rollup"
    val versions = s"$base/versions"
    val events = Tables.load(spark, sf0001, "events")
    // cycle 1 → snapshot v0; cycle 2 → snapshot v1
    val b1 = graft.etl.Incremental.dailyEventRollup(spark,
      events.filter(col("ts") < lit("2024-01-15")), rollup, None)
    graft.sinks.Sinks.Versioned.write(spark.read.parquet(rollup), versions)
    graft.etl.Incremental.dailyEventRollup(spark, events, rollup, b1)
    graft.sinks.Sinks.Versioned.write(spark.read.parquet(rollup), versions)
    // v0 is exactly the mid-maintenance state (reproducible training
    // inputs: "the rollup as it stood after the Jan-14 load")
    val v0 = graft.sinks.Sinks.Versioned.read(spark, versions, Some(0L))
    val expectedMid = events.filter(col("ts") < lit("2024-01-15"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type")).agg(count(lit(1)).as("n"))
    assert(v0.count() == expectedMid.count())
    assert(v0.agg(sum(col("n"))).head().getLong(0) ==
      expectedMid.agg(sum(col("n"))).head().getLong(0))
    // latest is the fully-maintained state
    val latest = graft.sinks.Sinks.Versioned.read(spark, versions)
    assert(latest.agg(sum(col("n"))).head().getLong(0) == events.count())
  }

  test("backfill repairs only the named range — untouched days stay as-is") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_bf_spec")
      .toString + "/rollup"
    val events = Tables.load(spark, sf0001, "events")
    graft.etl.Incremental.dailyEventRollup(spark, events, dir, None)
    def dayAgg(from: String, to: String) = events
      .filter(date_format(col("ts"), "yyyy-MM-dd").between(from, to))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    // corrupt TWO ranges
    graft.etl.Incremental.mergeAdditive(spark, dir,
      dayAgg("2024-01-05", "2024-01-06"), Seq("day", "event_type"))
    graft.etl.Incremental.mergeAdditive(spark, dir,
      dayAgg("2024-01-20", "2024-01-21"), Seq("day", "event_type"))
    // repair only the first
    graft.etl.Incremental.backfillDailyRollup(spark, events, dir,
      "2024-01-05", "2024-01-06")
    val rolled = spark.read.parquet(dir)
    val truth = events.groupBy(
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val got = rolled.select("day", "event_type", "n").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got.foreach { case ((day, et), n) =>
      if (day >= "2024-01-20" && day <= "2024-01-21")
        assert(n == 2 * truth((day, et)), s"$day should STILL be corrupted")
      else
        assert(n == truth((day, et)), s"$day should be correct")
    }
  }

  test("mergeJoinMv: delta algebra equals the full join for any split") {
    import spark.implicits._
    val a = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "av")
    val b = Seq((1, 10), (1, 11), (2, 20), (3, 30), (3, 31))
      .toDF("k", "bv")
    val full = a.join(b, Seq("k"))
    for (aCut <- Seq(1, 2); bCut <- Seq(10, 30)) {
      val (aOld, aD) = (a.filter($"k" <= aCut), a.filter($"k" > aCut))
      val (bOld, bD) = (b.filter($"bv" <= bCut), b.filter($"bv" > bCut))
      val mv = aOld.join(bOld, Seq("k"))
      val got = graft.etl.Incremental
        .mergeJoinMv(mv, aOld, bOld, aD, bD, Seq("k"))
      assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty,
        s"split aCut=$aCut bCut=$bCut")
    }
    intercept[IllegalArgumentException] {
      graft.etl.Incremental.mergeJoinMv(full, a, b, a, b, Seq.empty)
    }
  }

  test("wire-codec ETL sources: a lineprotocol file scan extracts the " +
    "typed point frame through the same config-driven Sources.file " +
    "the runner uses; extendedjson demands its schema") {
    import graft.sources.{LineProtocol, Sources}
    val tmp = Files.createTempDirectory("graft_etl_lp")
    val src = Seq(
      (1L, "click", 1.5, java.sql.Timestamp.valueOf("2024-03-01 00:00:01")),
      (2L, "view", 0.5, java.sql.Timestamp.valueOf("2024-03-01 00:00:02")),
      (3L, "click", 9.5, java.sql.Timestamp.valueOf("2024-03-01 00:00:03")))
      .toDF("id", "kind", "v", "ts")
    val stage = tmp.resolve("stage").toString
    LineProtocol.serialize(src, "m", "ts", Seq("kind"))
      .write.text(stage)
    val out = tmp.resolve("out").toString
    val job = EtlJob(
      // the wire scan IS the extraction; flatten the typed point maps
      // into validation-ready columns inside the source stage
      source = sp => Sources.file(sp, stage, Some("lineprotocol"))
        .select(col("fields_long")("id").as("id"),
          col("tags")("kind").as("kind"),
          col("fields_double")("v").as("v"),
          col("time").as("ts"))
        .withColumn("_source", lit("points")),
      transformations = Seq("validation"),
      validationRules = Map("v" -> FieldRule(min = Some(1))),
      routes = Seq(Sinks.Route("valid", col("_is_valid"),
        d => Sinks.load(d.drop("_validation_errors"), s"$out/valid"))),
      stamp = Stamp.off)
    val r = job.run(spark)
    assert(r.stageErrors.isEmpty)
    assert(r.loadResults("valid").count == 2) // v=0.5 fails the rule
    val ids = spark.read.parquet(s"$out/valid").select(col("id"))
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L))
    // the BSON wire is schema-driven: scanning without one is a
    // config error named at the source, not a downstream mystery
    val e = intercept[IllegalArgumentException] {
      Sources.file(spark, stage, Some("extendedjson"))
    }
    assert(e.getMessage.contains("schema"))
  }
}
