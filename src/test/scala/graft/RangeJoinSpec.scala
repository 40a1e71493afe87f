package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Binned range join: exact agreement with the naive theta join,
  * inclusive bounds, bin-edge behavior, and plan shape. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = (0 until 200).map(i => (i.toLong, i * 0.37))
    .toDF("pid", "x")
  private lazy val intervals = Seq(
    (0L, 0.0, 10.0),    // aligned at bin edge
    (1L, 9.99, 10.01),  // straddles a bin boundary
    (2L, 25.0, 25.0),   // degenerate single-point interval
    (3L, 50.0, 74.0),   // spans many bins
    (4L, 200.0, 300.0)  // matches nothing
  ).toDF("iid", "lo", "hi")

  test("matches the naive theta join exactly, inclusive bounds") {
    val binned = RangeJoin.binnedContainment(points, "x",
        intervals, "lo", "hi", binWidth = 5.0)
      .select("pid", "iid").orderBy("pid", "iid").collect().toSeq
    val naive = points.join(intervals,
        col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").orderBy("pid", "iid").collect().toSeq
    assert(binned === naive)
    assert(binned.nonEmpty)
  }

  test("no duplicate matches for intervals spanning many bins") {
    val out = RangeJoin.binnedContainment(points, "x",
      intervals, "lo", "hi", binWidth = 1.0)
    assert(out.groupBy("pid", "iid").count().filter(col("count") > 1)
      .count() === 0)
  }

  test("negative domains bin correctly") {
    val negPts = Seq((1L, -7.5), (2L, -0.1), (3L, 0.0)).toDF("pid", "x")
    val negIv = Seq((0L, -10.0, -5.0), (1L, -1.0, 1.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binnedContainment(negPts, "x", negIv,
        "lo", "hi", binWidth = 4.0)
      .select("pid", "iid").orderBy("pid", "iid").as[(Long, Long)]
      .collect().toSeq
    assert(got === Seq((1L, 0L), (2L, 1L), (3L, 1L)))
  }

  test("property: random points/intervals/binWidths agree with naive join") {
    val rng = new scala.util.Random(11L)
    val pts = (0 until 150).map(i => (i.toLong, rng.nextDouble() * 60 - 30))
      .toDF("pid", "x")
    val ivs = (0 until 25).map { i =>
      val a = rng.nextDouble() * 60 - 30
      val b = a + rng.nextDouble() * 12
      (i.toLong, a, b)
    }.toDF("iid", "lo", "hi")
    val naive = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").orderBy("pid", "iid").collect().toSeq
    for (bw <- Seq(0.5, 3.0, 7.7, 100.0)) {
      val binned = RangeJoin.binnedContainment(pts, "x", ivs, "lo", "hi", bw)
        .select("pid", "iid").orderBy("pid", "iid").collect().toSeq
      assert(binned === naive, s"binWidth=$bw")
    }
  }

  test("over-replicating binWidth fails loudly instead of exploding") {
    val e = intercept[Exception] {
      RangeJoin.binnedContainment(points, "x", intervals, "lo", "hi",
        binWidth = 0.001, maxBinsPerInterval = 100).count()
    }
    assert(e.getMessage != null)
  }

  test("plan is an equi join, not a nested loop") {
    val plan = RangeJoin.binnedContainment(points, "x",
      intervals, "lo", "hi", binWidth = 5.0).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
