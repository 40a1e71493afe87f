package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.operators.AsOfJoin

/** Semantic pins for the union-stream as-of join. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (2L, ts("2024-01-01 10:02:00"), 200.0)
  ).toDF("user_id", "ts", "px")
    .select(col("user_id"), col("ts"), col("px"))

  private lazy val trades = Seq(
    (10L, 1L, ts("2024-01-01 10:03:00")), // after first quote
    (11L, 1L, ts("2024-01-01 10:05:00")), // exactly at second quote
    (12L, 1L, ts("2024-01-01 09:59:00")), // before any quote
    (13L, 2L, ts("2024-01-01 11:00:00")), // user 2
    (14L, 3L, ts("2024-01-01 10:00:00"))  // user with no quotes
  ).toDF("trade_id", "user_id", "ts")

  test("backward as-of picks latest at-or-before per key; null when none") {
    val out = AsOfJoin.backward(trades, quotes,
        keyCols = Seq("user_id"), tsCol = "ts", carryCols = Seq("px"))
      .orderBy("trade_id")
      .select("trade_id", "px").collect().toSeq
    assert(out === Seq(
      Row(10L, 100.0), // 10:03 → quote at 10:00
      Row(11L, 101.0), // inclusive: quote exactly at trade ts
      Row(12L, null),  // no quote yet
      Row(13L, 200.0),
      Row(14L, null))) // key never quoted
  }

  test("probe columns pass through untouched and row count is |probe|") {
    val out = AsOfJoin.backward(trades, quotes,
      keyCols = Seq("user_id"), tsCol = "ts", carryCols = Seq("px"))
    assert(out.columns.toSeq === Seq("trade_id", "user_id", "ts", "px"))
    assert(out.count() === trades.count())
  }

  test("a NULL carry value in the matched build row is carried, not leaked") {
    val builds = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(100.0), Option("a")),
      (1L, ts("2024-01-01 10:02:00"), Option.empty[Double], Option("b"))
    ).toDF("user_id", "ts", "px", "tag")
    val probes = Seq((10L, 1L, ts("2024-01-01 10:03:00")))
      .toDF("trade_id", "user_id", "ts")
    val out = AsOfJoin.backward(probes, builds,
        keyCols = Seq("user_id"), tsCol = "ts", carryCols = Seq("px", "tag"))
      .select("px", "tag").collect().toSeq
    // both values come from the 10:02 row: px is its genuine NULL (no
    // leak of 100.0 from 10:00), tag is "b"
    assert(out === Seq(Row(null, "b")))
  }

  test("build rows tied on (key, ts) resolve deterministically to max carry") {
    val builds = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0),
      (1L, ts("2024-01-01 10:00:00"), 9.0),
      (1L, ts("2024-01-01 10:00:00"), 1.0)
    ).toDF("user_id", "ts", "px")
    val probes = Seq((10L, 1L, ts("2024-01-01 10:01:00")))
      .toDF("trade_id", "user_id", "ts")
    val out = AsOfJoin.backward(probes, builds,
        keyCols = Seq("user_id"), tsCol = "ts", carryCols = Seq("px"))
      .select("px").collect().toSeq
    assert(out === Seq(Row(9.0)))
  }

  test("property: agrees with naive per-probe max-build lookup on random data") {
    val rng = new scala.util.Random(7L)
    // small key/ts domains force heavy collisions, duplicate build
    // (key, ts) pairs, and empty-build keys
    val probeRows = (0 until 120).map(i =>
      (i.toLong, (rng.nextInt(6) + 1).toLong,
        ts(f"2024-01-01 10:${rng.nextInt(50)}%02d:00")))
    val buildRows = (0 until 60).map(i =>
      ((rng.nextInt(8) + 1).toLong,
        ts(f"2024-01-01 10:${rng.nextInt(50)}%02d:00"), i * 1.5))
    val probes = probeRows.toDF("trade_id", "user_id", "ts")
    val builds = buildRows.toDF("user_id", "ts", "px")

    val got = AsOfJoin.backward(probes, builds,
        keyCols = Seq("user_id"), tsCol = "ts", carryCols = Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    // tie-break contract: among build rows at the max qualifying ts, the
    // greatest carry struct (here: max px) wins
    val byKey = buildRows.groupBy(_._1)
    val expected = probeRows.map { case (tid, k, t) =>
      tid -> byKey.getOrElse(k, Seq.empty)
        .filter(!_._2.after(t))
        .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
    }.toMap
    assert(got === expected)
  }

  test("plan has exactly one exchange (single shuffle, no range join)") {
    val out = AsOfJoin.backward(trades, quotes,
      keyCols = Seq("user_id"), tsCol = "ts", carryCols = Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 shuffle, plan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
