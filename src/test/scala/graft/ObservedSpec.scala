package graft

import org.apache.spark.sql.functions._
import graft.etl.Observed

/** Contract of the `Dataset.observe` metrics helper: values equal a
  * direct aggregate, they ride the caller's single action (a write),
  * declared order is preserved, and misuse fails loudly. */
class ObservedSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    ("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0), ("c", 10.0)
  ).toDF("k", "v")

  test("metrics equal the direct aggregate and ride a noop write") {
    val (inst, obs) = Observed.attach(sample, "obs_eq",
      Seq(count(lit(1)).as("n"),
        sum(col("v")).as("total"),
        sum(when(col("v") > 2.5, 1L).otherwise(0L)).as("n_big")))
    inst.write.format("noop").mode("overwrite").save()
    val row = Observed.metricsDf(spark, obs, Seq("n", "total", "n_big"))
      .collect().head
    assert(row.getLong(0) === 5L)
    assert(row.getDouble(1) === 20.0)
    assert(row.getLong(2) === 3L)
  }

  test("declared name order is preserved in the output schema") {
    val (inst, obs) = Observed.attach(sample, "obs_order",
      Seq(sum(col("v")).as("total"), count(lit(1)).as("n")))
    inst.write.format("noop").mode("overwrite").save()
    val df = Observed.metricsDf(spark, obs, Seq("n", "total"))
    assert(df.columns.toSeq === Seq("n", "total"))
    assert(df.collect().head.getLong(0) === 5L)
  }

  test("unknown metric name fails loudly, not with a null row") {
    val (inst, obs) = Observed.attach(sample, "obs_missing",
      Seq(count(lit(1)).as("n")))
    inst.write.format("noop").mode("overwrite").save()
    val e = intercept[IllegalArgumentException] {
      Observed.metricsDf(spark, obs, Seq("n", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("empty metric list is rejected at attach time") {
    intercept[IllegalArgumentException] {
      Observed.attach(sample, "obs_empty", Seq.empty)
    }
  }
}
