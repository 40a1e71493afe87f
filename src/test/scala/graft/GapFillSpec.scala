package graft

import org.apache.spark.sql.functions._
import graft.operators.GapFill

/** Time-series densification: spine completeness, zero-fill vs
  * carry-forward semantics, and the broadcast (non-cartesian) spine
  * plan. */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private val daily = Seq(
    ("2024-01-01", "a", 2L, 10.0),
    ("2024-01-03", "a", 1L, 30.0),
    ("2024-01-02", "b", 5L, 50.0)
  ).toDF("day", "k", "n", "avg_v")

  test("grid is complete; counts zero-fill; observations carry forward") {
    val filled = GapFill.fillDaily(daily, "day", "k",
        "2024-01-01", "2024-01-04", Seq("n"), Seq("avg_v"))
      .orderBy("k", "day").collect()
    assert(filled.length == 8) // 4 days x 2 keys
    val a = filled.filter(_.getString(1) == "a")
    assert(a.map(_.getLong(2)).toSeq == Seq(2L, 0L, 1L, 0L))
    assert(a.map(_.getDouble(3)).toSeq == Seq(10.0, 10.0, 30.0, 30.0))
    // key b: null carry BEFORE its first observation, carried after
    val b = filled.filter(_.getString(1) == "b")
    assert(b(0).isNullAt(3) && b(1).getDouble(3) == 50.0 &&
      b(3).getDouble(3) == 50.0)
    assert(b.map(_.getLong(2)).toSeq == Seq(0L, 5L, 0L, 0L))
  }

  test("spine join broadcasts the key side — no cartesian product") {
    val plan = GapFill.fillDaily(daily, "day", "k",
      "2024-01-01", "2024-01-04", Seq("n"), Seq("avg_v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
