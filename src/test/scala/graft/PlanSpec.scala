package graft
import graft.queries.Catalog
class PlanSpec extends SparkSpec {
  def plan(name: String): String =
    Catalog.queries(name)(spark, sf001).queryExecution.executedPlan.toString

  test("s1_where_scan pushes predicates into the parquet scan") {
    val p = plan("s1_where_scan")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_quantity,45"), p)
    // projection pruned to the 4 selected columns
    assert(p.contains("ReadSchema") &&
      !p.contains("l_extendedprice"), p)
  }

  test("j3_star_join broadcasts the small dims, no cartesian") {
    val p = plan("j3_star_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j11/j12/j13 multi-join workloads: dims broadcast, no cartesian") {
    // Q3 shape: 3-way join, filters pushed to all scans, top-10 via
    // TakeOrderedAndProject (never a global sort of the join output)
    val q3 = plan("j11_shipping_priority")
    assert(q3.contains("TakeOrderedAndProject"), q3)
    assert(!q3.contains("CartesianProduct"), q3)
    assert(q3.contains("PushedFilters: [IsNotNull(c_mktsegment)") ||
      q3.contains("EqualTo(c_mktsegment,BUILDING)"), q3)
    // Q5 shape: 6-table star — nation/region broadcast, everything
    // keyed, no nested loop anywhere
    val q5 = plan("j12_local_supplier_volume")
    assert(q5.contains("BroadcastHashJoin"), q5)
    assert(!q5.contains("CartesianProduct") &&
      !q5.contains("BroadcastNestedLoopJoin"), q5)
    // Q8 shape: 7 relations incl. nation twice — still zero cartesian,
    // both nation copies and region broadcast
    val q8 = plan("j13_market_share")
    assert("BroadcastHashJoin".r.findAllIn(q8).size >= 3, q8)
    assert(!q8.contains("CartesianProduct") &&
      !q8.contains("BroadcastNestedLoopJoin"), q8)
  }

  test("j22/j23/j24/j25 analytics shapes: pushdown, join-side filter, " +
      "derived disjunction, anti join — no cartesian anywhere") {
    // Q9 shape: the name filter reaches the part scan and the filtered
    // part set broadcasts into lineitem
    val q9 = plan("j22_profit_by_nation")
    assert(q9.contains("StringContains(p_name,widget)"), q9)
    assert(q9.contains("BroadcastHashJoin"), q9)
    assert(!q9.contains("CartesianProduct") &&
      !q9.contains("BroadcastNestedLoopJoin"), q9)
    // Q13 shape: the priority filter lives in the JOIN (pushed to the
    // orders scan), never a WHERE that would drop zero-order customers
    val q13 = plan("j23_order_count_dist")
    assert(q13.contains("Not(In(o_orderpriority"), q13)
    assert(q13.contains("LeftOuter"), q13)
    // Q19 shape: Catalyst derives per-side conjuncts from the OR'd
    // blocks and pushes them into BOTH scans; the residual disjunction
    // evaluates at the join, not as a filter over a cartesian
    val q19 = plan("j24_disjunctive_revenue")
    assert(q19.contains("In(p_brand, [Brand#12,Brand#23,Brand#24])"), q19)
    assert(q19.contains("LessThanOrEqual(l_quantity,30.0)"), q19)
    assert(!q19.contains("CartesianProduct") &&
      !q19.contains("BroadcastNestedLoopJoin"), q19)
    // Q22 shape: idle probe is an ANTI join against the shrunken
    // recent-orders set; the scalar threshold broadcasts one row
    val q22 = plan("j25_idle_rich_customers")
    assert(q22.contains("LeftAnti"), q22)
    assert(!q22.contains("CartesianProduct"), q22)
  }

  test("w1_topk is TakeOrderedAndProject, not a global sort") {
    val p = plan("w1_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1_agg does partial aggregation before the exchange") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum") || p.contains("Partial"), p)
  }

  test("j5_theta is a broadcast nested loop, aggregated immediately") {
    val p = plan("j5_theta")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("text_fingerprint plan has no window exchange (explode+agg form)") {
    val plan = graft.queries.Catalog.queries("text_fingerprint")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most 1 shuffle:\n$plan")
  }

  test("a2_null_profile reads all columns in one pass (single scan)") {
    val p = plan("a2_null_profile")
    assert("FileScan".r.findAllIn(p).size == 1, p)
  }

  test("EXISTS subquery decorrelates to a semi join, scalar to an agg join") {
    val exists = plan("q_exists_subquery")
    assert(exists.contains("LeftSemi"), exists)
    assert(!exists.contains("InSubquery") && !exists.contains("exists#"),
      exists)
    val scalar = plan("q_scalar_subquery")
    // the correlated aggregate becomes a grouped subplan joined back in
    assert(scalar.contains("HashAggregate") &&
      (scalar.contains("Join") || scalar.contains("BroadcastHashJoin")),
      scalar)
  }

  test("k_dpp_join prunes fact partitions dynamically from the dim filter") {
    val p = plan("k_dpp_join")
    assert(p.contains("dynamicpruning"), p)
    assert(p.contains("PartitionFilters"), p)
  }

  test("q_stats_family is one partial+final aggregate, no extra shuffle") {
    val p = plan("q_stats_family")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 shuffle:\n$p")
  }

  test("w10_funnel runs all three steps over one keyed exchange") {
    val p = plan("w10_funnel")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 hash shuffle:\n$p")
    assert("Window".r.findAllIn(p).size >= 3, p)
  }

  test("a selective dim filter injects a runtime bloom filter on the fact") {
    import org.apache.spark.sql.functions.col
    val c = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> c.get(k))
    try {
      // force the shuffle-join regime where the 100 TB fact side can't
      // broadcast, and let the (normally 10 GB) application-side floor
      // admit test-scale scans
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold", "0")
      val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      val dim = spark.read.parquet(s"$sf001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(dim, li("l_orderkey") === dim("o_orderkey"))
        .groupBy().count()
      // the optimizer builds a bloom filter from the filtered dim and
      // applies might_contain to the fact scan — a semi-join reduction
      // that skips shuffling fact rows that cannot match
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), p)
      assert(p.contains("bloom_filter_agg"), p)
    } finally saved.foreach { case (k, v) => c.set(k, v) }
  }

  test("q_interval_union: islands + both aggregates over ONE keyed exchange") {
    val p = plan("q_interval_union")
    // window, island groupBy and final user groupBy all hash on user_id:
    // Catalyst reuses a single exchange for the whole chain
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(p).length
    assert(exchanges == 1, s"expected 1 keyed exchange, got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_retention_cohorts: cohort map joins back without a cartesian") {
    val p = plan("q_retention_cohorts")
    assert(!p.contains("CartesianProduct"), p)
    // the distinct-count is planned as partial+final aggregation
    assert(p.contains("HashAggregate"), p)
  }

  test("q_json_props: extraction is a projection over the scan, no UDF") {
    val p = plan("q_json_props")
    assert(p.contains("get_json_object") || p.contains("GetJsonObject"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("j14/j15/j16 Q10/Q18/Q21 shapes keep their scale invariants") {
    // Q10: customer-grain top-20 rides TakeOrderedAndProject; the
    // returnflag filter reaches the lineitem scan
    val q10 = plan("j14_returned_items")
    assert(q10.contains("TakeOrderedAndProject"), q10)
    assert(q10.contains("EqualTo(l_returnflag,R)") ||
      q10.contains("l_returnflag"), q10)
    assert(!q10.contains("CartesianProduct"), q10)
    // Q18: the HAVING table probes as a semi join — the detail join
    // never sees unfiltered lineitem
    val q18 = plan("j15_big_orders")
    assert(q18.contains("LeftSemi"), q18)
    assert(!q18.contains("CartesianProduct"), q18)
    // Q21: ONE pass over lineitem⋈orders (no triple self-join) — at
    // most the two base scans appear
    val q21 = plan("j16_waiting_supplier")
    assert("Scan parquet".r.findAllIn(q21).size <= 3, q21)
    assert(!q21.contains("CartesianProduct"), q21)
  }

  test("q_ema folds inside the projection — no Window, one exchange") {
    val p = plan("q_ema")
    assert(!p.contains("Window"), p)
    assert(p.contains("aggregate("), p) // the higher-order fold
    assert(!p.contains("ScalaUDF"), p)
  }

  test("q_rolling_distinct expands then aggregates — no Window operator") {
    val p = plan("q_rolling_distinct")
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("Window"), p)
  }

  test("text_search: term filter prunes before any join; df side broadcasts") {
    val p = plan("text_search")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
