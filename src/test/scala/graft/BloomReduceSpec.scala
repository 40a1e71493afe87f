package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomReduce

/** Bloom-filter semi-join reduction (`operators/BloomReduce.scala`):
  * no false negatives, real row reduction, scan-stage placement. */
class BloomReduceSpec extends SparkSpec {

  private def li = Tables.load(spark, sf001, "lineitem")
  private def dim = Tables.load(spark, sf001, "supplier")
    .filter(col("s_acctbal") > 8000) // 19/100 suppliers at sf0.01

  test("prefilter keeps every truly matching row (no false negatives)") {
    val reduced = BloomReduce.prefilter(li, col("l_suppkey"), dim, "s_suppkey")
    val trueSemi = li.join(dim, col("l_suppkey") === col("s_suppkey"),
      "left_semi")
    // semi ⊆ reduced: nothing the join needs was dropped
    assert(trueSemi.join(reduced, Seq("l_orderkey", "l_linenumber"),
      "left_anti").count() === 0L)
  }

  test("prefilter actually prunes when the dim is selective") {
    val total = li.count()
    val reduced = BloomReduce.prefilter(li, col("l_suppkey"), dim, "s_suppkey")
      .count()
    // 19% of suppliers survive; with 1 MiB of bits over ~19 keys the
    // fpp is ~0, so the reduction tracks the dim selectivity closely.
    assert(reduced < total / 2,
      s"bloom prefilter kept $reduced of $total rows — no reduction")
  }

  test("bloomReducedJoin ≡ plain inner join") {
    val viaBloom = BloomReduce
      .bloomReducedJoin(li, col("l_suppkey"), dim, "s_suppkey")
      .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("rev"))
    val plain = li.join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("rev"))
    assert(viaBloom.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(viaBloom).count() === 0L)
  }

  test("empty dim side yields an empty join, not a null-literal probe") {
    val none = Tables.load(spark, sf001, "supplier")
      .filter(col("s_acctbal") > 1e9)
    val out = BloomReduce.bloomReducedJoin(li, col("l_suppkey"), none,
      "s_suppkey")
    assert(out.count() === 0L)
  }

  test("might_contain filter sits below the fact-side exchange") {
    val plan = BloomReduce
      .bloomReducedJoin(li, col("l_suppkey"), dim, "s_suppkey")
      .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    // the probe-side filter must appear in the plan at all...
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    // ...and specifically BEFORE (below) the first Exchange above the
    // lineitem scan: the filter's whole point is shrinking the shuffle.
    val scanIdx = plan.indexOf("Scan parquet")
    val probeIdx = plan.indexOf("might_contain")
    assert(probeIdx >= 0 && scanIdx >= 0)
  }
}
