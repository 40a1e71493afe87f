package graft

/** Fingerprint extraction for the plan-structure gate. */
class PlanGateSpec extends SparkSpec {

  test("fingerprint counts the operators that matter at scale") {
    val plan =
      """AdaptiveSparkPlan
        |+- Exchange hashpartitioning(k, 8)
        |   +- Window [sum(v)], [k], [t ASC]
        |      +- Exchange rangepartitioning(t ASC, 8)
        |         +- BroadcastExchange HashedRelationBroadcastMode
        |            +- CartesianProduct
        |               +- WindowGroupLimit [k], [r ASC], rank, 5
        |""".stripMargin
    val f = PlanGate.fingerprint(plan)
    assert(f.exchange === 2)
    assert(f.broadcast === 1)
    assert(f.cartesian === 1)
    assert(f.window === 2) // Window + WindowGroupLimit
  }

  test("fingerprint of a live plan matches its visible structure") {
    val p = queries.Catalog.queries("q1_agg")(spark, sf001)
      .queryExecution.executedPlan.toString
    val f = PlanGate.fingerprint(p)
    // partial+final hash aggregate (1 hash exchange) + the judged
    // output ORDER BY (1 range exchange) — nothing else
    assert(f.exchange === 2, p)
    assert(f.cartesian === 0)
    assert(f.window === 0)
  }
}
