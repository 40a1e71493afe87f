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

  test("forward as-of picks earliest at-or-after per key; null when none") {
    val out = AsOfJoin.forward(trades, quotes,
        keyCols = Seq("user_id"), tsCol = "ts", carryCols = Seq("px"))
      .orderBy("trade_id")
      .select("trade_id", "px").collect().toSeq
    assert(out === Seq(
      Row(10L, 101.0), // 10:03 → next quote at 10:05
      Row(11L, 101.0), // inclusive: quote exactly at trade ts
      Row(12L, 100.0), // 09:59 → first quote at 10:00
      Row(13L, null),  // 11:00 is after user 2's only quote
      Row(14L, null))) // key never quoted
  }

  test("nearest as-of picks the closer side; exact ties resolve backward") {
    val builds = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0)
    ).toDF("user_id", "ts", "px")
    val probes = Seq(
      (10L, 1L, ts("2024-01-01 10:02:00")), // 2 min back vs 8 min fwd
      (11L, 1L, ts("2024-01-01 10:08:00")), // 8 min back vs 2 min fwd
      (12L, 1L, ts("2024-01-01 10:05:00")), // equidistant → backward
      (13L, 1L, ts("2024-01-01 10:10:00")), // distance 0 both → backward
      (14L, 2L, ts("2024-01-01 10:00:00"))  // no build rows at all
    ).toDF("trade_id", "user_id", "ts")
    val out = AsOfJoin.nearest(probes, builds,
        keyCols = Seq("user_id"), tsCol = "ts", carryCols = Seq("px"))
      .orderBy("trade_id").select("trade_id", "px").collect().toSeq
    assert(out === Seq(Row(10L, 1.0), Row(11L, 2.0), Row(12L, 1.0),
      Row(13L, 2.0), Row(14L, null)))
  }

  test("property: forward and nearest agree with naive lookups") {
    val rng = new scala.util.Random(11L)
    val probeRows = (0 until 120).map(i =>
      (i.toLong, (rng.nextInt(6) + 1).toLong,
        ts(f"2024-01-01 10:${rng.nextInt(50)}%02d:00")))
    // distinct (key, ts) build pairs: directed tie-break (max vs min
    // carry struct) is pinned by the dedicated tests above
    val buildRows = rng.shuffle((0 until 60).map(i =>
      ((i % 8 + 1).toLong,
        ts(f"2024-01-01 10:${i % 50}%02d:00"), i * 1.5)).toList)
    val probes = probeRows.toDF("trade_id", "user_id", "ts")
    val builds = buildRows.toDF("user_id", "ts", "px")
    val byKey = buildRows.groupBy(_._1)

    val gotFwd = AsOfJoin.forward(probes, builds,
        keyCols = Seq("user_id"), tsCol = "ts", carryCols = Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val expFwd = probeRows.map { case (tid, k, t) =>
      tid -> byKey.getOrElse(k, Seq.empty)
        .filter(!_._2.before(t))
        .sortBy(_._2.getTime).headOption.map(_._3)
    }.toMap
    assert(gotFwd === expFwd)

    val gotNear = AsOfJoin.nearest(probes, builds,
        keyCols = Seq("user_id"), tsCol = "ts", carryCols = Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val expNear = probeRows.map { case (tid, k, t) =>
      val cands = byKey.getOrElse(k, Seq.empty)
      val bk = cands.filter(!_._2.after(t)).sortBy(_._2.getTime).lastOption
      val fw = cands.filter(!_._2.before(t)).sortBy(_._2.getTime).headOption
      val chosen = (bk, fw) match {
        case (Some(b), Some(f)) =>
          if (t.getTime - b._2.getTime <= f._2.getTime - t.getTime) Some(b)
          else Some(f)
        case (b, f) => b.orElse(f)
      }
      tid -> chosen.map(_._3)
    }.toMap
    assert(gotNear === expNear)
  }

  test("nearest plan still has exactly one exchange") {
    val out = AsOfJoin.nearest(trades, quotes,
      keyCols = Seq("user_id"), tsCol = "ts", carryCols = Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 shuffle, plan:\n$plan")
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
