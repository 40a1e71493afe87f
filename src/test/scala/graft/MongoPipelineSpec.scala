package graft

import org.apache.spark.sql.functions._
import graft.sources.{MongoPipeline, QueryApi}
import graft.sources.MongoPipeline._

/** Aggregation-pipeline compiler + interactive query layer
  * (mongo_connector.py:225-240, src/api/main.py:154-221). */
class MongoPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.load(spark, sf0001, "events")

  test("$match + $group + $sort + $limit compile to filter/agg/orderBy/limit") {
    val out = MongoPipeline.compile(events, Seq(
      Match.eq("event_type" -> "purchase"),
      Group(Seq("user_id"), Seq(("n", "count", ""), ("avg_v", "avg", "value"))),
      Sort(Seq("n" -> false, "user_id" -> true)),
      Limit(5)))
    val rows = out.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("n")).toSeq ==
      rows.map(_.getAs[Long]("n")).sortBy(-_).toSeq)
    // equals direct computation
    val direct = events.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"user_id").limit(5)
      .select("user_id").as[Long].collect().toSeq
    assert(rows.map(_.getAs[Long]("user_id")).toSeq == direct)
  }

  test("$project + $skip + $unwind") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("c"))).toDF("id", "tags")
    val out = MongoPipeline.compile(df, Seq(
      Unwind("tags"), Sort(Seq("id" -> true, "tags" -> true)),
      Project(Seq("tags")), Skip(1)))
    assert(out.as[String].collect().toSeq == Seq("b", "c"))
    intercept[IllegalArgumentException] {
      MongoPipeline.compile(df, Seq(Group(Seq("id"), Seq(("x", "median", "id")))))
    }
  }

  test("$push accumulator collects per group") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    val out = MongoPipeline.compile(df, Seq(
      Group(Seq("k"), Seq(("vs", "push", "v"), ("mx", "max", "v"))),
      Sort(Seq("k" -> true))))
    val r = out.collect()
    assert(r(0).getAs[scala.collection.Seq[Long]]("vs").sorted == Seq(1L, 2L))
    assert(r(1).getAs[Long]("mx") == 3L)
  }

  test("query API: sql passthrough parses WHERE and limits (main.py:154-176)") {
    val out = QueryApi.sqlQuery(spark, sf0001, "orders",
      Some("o_totalprice > 100000 AND o_orderstatus = 'F'"), limit = 10)
    val rows = out.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Double]("o_totalprice") > 100000))
  }

  test("query API: find + range endpoints") {
    val f = QueryApi.findQuery(spark, sf0001, "events",
      Map("event_type" -> "signup"), limit = 7)
    assert(f.count() <= 7)
    val r = QueryApi.rangeQuery(spark, sf0001, "events", "ts",
      "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    assert(r.count() > 0)
  }
}
