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

  test("interpolateDaily: interior linear, head backfill, tail carry") {
    import spark.implicits._
    // series A: observed day 1 (v=10) and day 4 (v=40) -> days 2,3
    // interpolate to 20, 30; day 5 tail carries 40; series B observed
    // only day 3 (v=7) -> head days backfill 7, tail days carry 7
    val daily = Seq(
      ("2024-01-01", "A", 10.0), ("2024-01-04", "A", 40.0),
      ("2024-01-03", "B", 7.0)).toDF("day", "k", "v")
    val out = graft.operators.GapFill.interpolateDaily(
        daily, "day", "k", "2024-01-01", "2024-01-05", "v")
      .orderBy($"k", $"day")
      .collect().map(r => (r.getString(1), r.getString(0),
        r.getDouble(2), r.getBoolean(3)))
    assert(out.filter(_._1 == "A").toSeq === Seq(
      ("A", "2024-01-01", 10.0, false), ("A", "2024-01-02", 20.0, true),
      ("A", "2024-01-03", 30.0, true), ("A", "2024-01-04", 40.0, false),
      ("A", "2024-01-05", 40.0, true)))
    assert(out.filter(_._1 == "B").toSeq === Seq(
      ("B", "2024-01-01", 7.0, true), ("B", "2024-01-02", 7.0, true),
      ("B", "2024-01-03", 7.0, false), ("B", "2024-01-04", 7.0, true),
      ("B", "2024-01-05", 7.0, true)))
  }
}
