package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** Semantic pins for the SCD2 change-history builder. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // key 1: A → A (repeat, collapses) → B → B (collapses) → A (reopens)
  // key 2: single state, tied timestamps broken by the tie column
  private lazy val log = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10L, Some("A")),
    (1L, ts("2024-01-02 00:00:00"), 11L, Some("A")),
    (1L, ts("2024-01-03 00:00:00"), 12L, Some("B")),
    (1L, ts("2024-01-04 00:00:00"), 13L, Some("B")),
    (1L, ts("2024-01-05 00:00:00"), 14L, Some("A")),
    (2L, ts("2024-01-01 00:00:00"), 21L, Some("X")),
    (2L, ts("2024-01-01 00:00:00"), 20L, Some("Y"))
  ).toDF("k", "ts", "id", "state")

  private lazy val hist =
    Scd2.fromChangeLog(log, "k", "ts", "id", Seq("state"))

  test("consecutive identical states collapse; changes reopen versions") {
    val k1 = hist.filter($"k" === 1)
      .select($"version", $"state", $"valid_from", $"valid_to", $"is_current")
      .orderBy($"version").collect().toSeq
    assert(k1 === Seq(
      Row(1, "A", ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"), false),
      Row(2, "B", ts("2024-01-03 00:00:00"), ts("2024-01-05 00:00:00"), false),
      Row(3, "A", ts("2024-01-05 00:00:00"), ts(Scd2.OpenEnded), true)))
  }

  test("equal timestamps order by the tie column deterministically") {
    val k2 = hist.filter($"k" === 2)
      .select($"version", $"state").orderBy($"version").collect().toSeq
    // id 20 (Y) precedes id 21 (X) at the same instant
    assert(k2 === Seq(Row(1, "Y"), Row(2, "X")))
  }

  test("NULL attribute values are respected, not carried over") {
    val nlog = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Option("A")),
      (1L, ts("2024-01-02 00:00:00"), 2L, Option.empty[String]),
      (1L, ts("2024-01-03 00:00:00"), 3L, Option.empty[String]),
      (1L, ts("2024-01-04 00:00:00"), 4L, Option("A"))
    ).toDF("k", "ts", "id", "state")
    val out = Scd2.fromChangeLog(nlog, "k", "ts", "id", Seq("state"))
      .select($"version", $"state").orderBy($"version").collect().toSeq
    // A → NULL opens a version; NULL → NULL collapses; NULL → A reopens
    assert(out === Seq(Row(1, "A"), Row(2, null), Row(3, "A")))
  }

  test("history validity ranges tile each key's timeline without gaps") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"version")
    val gaps = hist
      .withColumn("next_from", lead($"valid_from", 1).over(w))
      .filter($"next_from".isNotNull && !($"valid_to" <=> $"next_from"))
    assert(gaps.count() === 0)
    // exactly one current row per key
    val cur = hist.filter($"is_current").groupBy($"k").count()
      .filter($"count" =!= 1)
    assert(cur.count() === 0)
  }

  test("the whole history builds over a single keyed exchange") {
    val p = hist.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle:\n$p")
  }
}
