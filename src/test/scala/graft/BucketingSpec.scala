package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.Bucketing

/** Bucketed co-located joins: the layout must eliminate the shuffle —
  * that's its entire reason to exist — so these tests assert on the
  * physical plan, not just results. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("matching bucketed tables join with zero Exchange") {
    val dir = Files.createTempDirectory("bucketing").toString
    val orders = Tables.load(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = Tables.load(spark, sf001, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(orders, "bs_orders", "o_orderkey", 8,
      sortCols = Seq("o_orderkey"), path = Some(s"$dir/bs_orders"))
    Bucketing.writeBucketed(lineitem, "bs_lineitem", "o_orderkey", 8,
      sortCols = Seq("o_orderkey"), path = Some(s"$dir/bs_lineitem"))
    try withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = Bucketing.bucketedJoin(spark, "bs_orders", "bs_lineitem",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"expected shuffle-free join:\n$plan")
      // and the answer matches the plain (shuffled) join
      val expected = orders.join(lineitem, Seq("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bs_orders")
      spark.sql("DROP TABLE IF EXISTS bs_lineitem")
    }
  }

  test("groupBy on the bucket key aggregates without an Exchange") {
    val dir = Files.createTempDirectory("bucketing").toString
    val orders = Tables.load(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(orders, "bs_orders_agg", "o_orderkey", 4,
      path = Some(s"$dir/bs_orders_agg"))
    try {
      val agg = Bucketing.readBucketed(spark, "bs_orders_agg")
        .groupBy("o_orderkey").agg(sum("o_totalprice").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free agg:\n$plan")
      assert(agg.count() === orders.select("o_orderkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS bs_orders_agg")
  }

  test("one-side-bucketed join shuffles only the unbucketed side") {
    val dir = Files.createTempDirectory("bucketing").toString
    val orders = Tables.load(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(orders, "bs_orders_one", "o_orderkey", 4,
      sortCols = Seq("o_orderkey"), path = Some(s"$dir/bs_orders_one"))
    val plain = Tables.load(spark, sf001, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    try withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false",
      // let the planner pick the bucketed side's layout (4 buckets)
      // instead of shuffling BOTH sides to shuffle.partitions
      "spark.sql.shuffle.partitions" -> "4") {
      val joined = spark.table("bs_orders_one").join(plain, Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected exactly 1 shuffle:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS bs_orders_one")
  }
}
