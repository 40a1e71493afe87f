package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.TopKPerGroup

/** Semantics + plan shape of the custom TopKPerGroup physical operator
  * ([[org.apache.spark.sql.graftx.TopKPerGroup]]): equals the window
  * row_number form on real and crafted data, plans as
  * partial → exchange → final with NO sort operator, and respects the
  * caller's total ordering. */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("equals window row_number <= k on real data, any partitioning") {
    val ev = spark.read.parquet(s"$sf001/events.parquet")
      .filter($"value".isNotNull)
      .select($"event_type", $"event_id", $"value")
    val expected = ev
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type")
          .orderBy($"value".desc, $"event_id")))
      .filter($"rk" <= 7).drop("rk")
    for (parts <- Seq(1, 7)) {
      val got = TopKPerGroup(ev.repartition(parts), Seq($"event_type"),
        Seq($"value".desc, $"event_id"), 7)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"parts=$parts: mismatch vs window form")
    }
  }

  test("crafted ties + k larger than a group; ascending order") {
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0), ("a", 4L, 1.0),
      ("b", 9L, 2.0)).toDF("g", "id", "v")
    val got = TopKPerGroup(df, Seq($"g"), Seq($"v", $"id"), 2)
      .orderBy($"g", $"v", $"id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // asc order: ties on v broken by id; group b has < k rows
    assert(got.toSeq === Seq(("a", 4L, 1.0), ("a", 1L, 5.0), ("b", 9L, 2.0)))
  }

  test("plan: partial below exchange; ONE sort, on reduced data only") {
    val ev = spark.read.parquet(s"$sf001/events.parquet")
      .filter($"value".isNotNull)
    val plan = TopKPerGroup(ev, Seq($"event_type"),
      Seq($"value".desc, $"event_id"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"), plan)
    assert(plan.contains("TopKPerGroupFinal"), plan)
    // the final pass streams over sorted input — its SortExec is the
    // spill path, and it must sit on the partial-REDUCED stream
    // (between final and exchange), never below the partial where it
    // would buffer the raw input
    val sorts = "Sort ".r.findAllMatchIn(plan).map(_.start).toList
    assert(sorts.length == 1, s"exactly one sort expected:\n$plan")
    val iPartial = plan.indexOf("TopKPerGroupPartial")
    val iFinal = plan.indexOf("TopKPerGroupFinal")
    val iEx = plan.indexOf("Exchange")
    assert(iFinal < sorts.head && sorts.head < iEx && iEx < iPartial,
      s"expected final/sort/exchange/partial order in:\n$plan")
  }

  test("state cap: forced flush regime equals the unbounded regime") {
    import org.apache.spark.sql.graftx.{TopKPerGroupExec, TopKPerGroupStrategy}
    val ev = spark.read.parquet(s"$sf001/events.parquet")
      .filter($"value".isNotNull)
      .select($"event_type", $"event_id", $"value")
    val expected = ev
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type")
          .orderBy($"value".desc, $"event_id")))
      .filter($"rk" <= 7).drop("rk")
    // 8 state rows with k=7: the second group in any partition trips
    // the cap — the partial pass flushes constantly, the worst case
    spark.conf.set(TopKPerGroupStrategy.MAX_STATE_ROWS_KEY, "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan
    try {                                                 // for metrics
      val df = TopKPerGroup(ev, Seq($"event_type"),
        Seq($"value".desc, $"event_id"), 7)
      assert(df.exceptAll(expected).isEmpty &&
        expected.exceptAll(df).isEmpty,
        "flush regime must produce the exact top-k")
      df.collect()
      val partial = df.queryExecution.executedPlan.collect {
        case t: TopKPerGroupExec if t.partial => t
      }.head
      assert(partial.maxStateRows == 8L)
      assert(partial.metrics("numStateFlushes").value > 0,
        "cap never fired — the fallback regime was not exercised")
      assert(partial.metrics("peakStateRows").value > 0)
    } finally {
      spark.conf.unset(TopKPerGroupStrategy.MAX_STATE_ROWS_KEY)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("state cap binds on existing-heap growth (round-robin arrival)") {
    import org.apache.spark.sql.graftx.{TopKPerGroupExec, TopKPerGroupStrategy}
    // 12 groups, k=5, cap=16: all 12 heaps are created in the first
    // round-robin pass (12 one-row heaps, under the creation check);
    // passes 2..5 then grow EXISTING heaps only. Without a cap check on
    // that path, state climbs to 60 rows — 3.75x the advertised bound;
    // with it, peakStateRows must never exceed the cap.
    val rows = for (r <- 0 until 5; g <- 0 until 12)
      yield (f"g$g%02d", (r * 12 + g).toLong, ((g * 7 + r * 13) % 29).toDouble)
    val df1p = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1)).toDF("g", "id", "v")
    val expected = df1p
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"v".desc, $"id")))
      .filter($"rk" <= 5).drop("rk")
    spark.conf.set(TopKPerGroupStrategy.MAX_STATE_ROWS_KEY, "16")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = TopKPerGroup(df1p, Seq($"g"), Seq($"v".desc, $"id"), 5)
      assert(out.exceptAll(expected).isEmpty &&
        expected.exceptAll(out).isEmpty,
        "capped regime must still produce the exact top-k")
      out.collect()
      val partial = out.queryExecution.executedPlan.collect {
        case t: TopKPerGroupExec if t.partial => t
      }.head
      val peak = partial.metrics("peakStateRows").value
      assert(peak <= 16L,
        s"peak state $peak exceeds the advertised cap of 16")
      assert(partial.metrics("numStateFlushes").value > 0,
        "growth-path cap never fired")
    } finally {
      spark.conf.unset(TopKPerGroupStrategy.MAX_STATE_ROWS_KEY)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("guards: k >= 1, non-empty grouping") {
    val df = Seq(("a", 1)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      TopKPerGroup(df, Seq($"g"), Seq($"v"), 0)
    }
    intercept[IllegalArgumentException] {
      TopKPerGroup(df, Seq.empty, Seq($"v"), 1)
    }
  }
}
