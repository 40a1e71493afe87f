package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.service.QueryService

/** E2E spec for the interactive service surface (`src/api/main.py`:
  * health 63-70, status 72-91, query 154-221, upload 224-280, ETL
  * trigger 224-271). */
class ServiceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val svc = new QueryService(spark, sf0001)

  test("health and per-table status report the lake as reachable") {
    assert(svc.health("status") == "healthy")
    val st = svc.status
    assert(st.size == Tables.all.size && st.values.forall(identity))
  }

  test("query: raw WHERE + limit reach the scan; envelope counts match") {
    val r = svc.query("customer", Some("c_custkey <= 10"), limit = 100)
    val expected = Tables.load(spark, sf0001, "customer")
      .filter(col("c_custkey") <= 10).count()
    assert(r.status == "success" && r.count == expected && expected > 0)
    // limit is part of the plan, not a driver-side truncation
    val limited = svc.query("customer", None, limit = 7)
    assert(limited.count == 7)
    // the WHERE string compiles to a pushed filter, not a post-scan one
    val planned = svc.query("customer", Some("c_custkey <= 10"), 100)
      .data.queryExecution.executedPlan.toString
    assert(planned.contains("PushedFilters") &&
      planned.contains("c_custkey"), planned)
  }

  test("queryCollection: filter-dict conjunction, JSON string variant") {
    val direct = svc.queryCollection("orders",
      Map("o_orderstatus" -> "F", "o_orderpriority" -> "1-URGENT"), 1000)
    val viaJson = svc.queryCollectionJson("orders",
      """{"o_orderstatus": "F", "o_orderpriority": "1-URGENT"}""", 1000)
    assert(direct.count > 0 && direct.count == viaJson.count)
  }

  test("queryRange: relative bounds with injected now, field projection") {
    val now = to_timestamp(lit("2024-01-20 00:00:00"))
    val r = svc.queryRange("events", "ts", start = "-7d", stop = "now()",
      fields = Seq("user_id", "value"), now = now)
    assert(r.data.columns.toSeq == Seq("ts", "user_id", "value"))
    val manual = Tables.load(spark, sf0001, "events")
      .filter(col("ts") >= now - expr("INTERVAL 7 DAY") && col("ts") < now)
      .count()
    assert(manual > 0 && r.count == manual)
  }

  test("sql: arbitrary text over registered lake views") {
    val r = svc.sql(
      "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
    assert(r.records.head("n").asInstanceOf[Long] ==
      Tables.load(spark, sf0001, "lineitem").count())
  }

  test("records: envelope materializes the bounded page as maps") {
    val recs = svc.query("region", None, limit = 10).records
    assert(recs.size == 5)
    assert(recs.head.keySet.contains("r_name"))
  }

  test("explain: pushed filters are visible before execution") {
    val plan = svc.explain(
      "SELECT c_name FROM customer WHERE c_custkey = 42")
    assert(plan.contains("PushedFilters") && plan.contains("c_custkey"))
  }

  test("upload + etl trigger round-trip through the lake") {
    val dir = Files.createTempDirectory("graft_svc").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val up = svc.upload(df, s"$dir/t")
    assert(up("status") == "success" && up("records_loaded") == 2L)

    val (status, result) = svc.runEtl(graft.etl.EtlJob(
      source = s => s.read.parquet(s"$dir/t"),
      transformations = Seq("cleaning")))
    assert(status == "success" && result.recordsProcessed == 2L)
  }
}
