package graft

import org.apache.spark.sql.functions._

/** Catalog-statistics → cost-based-optimizer pipeline: ANALYZE'd
  * row/column stats must reach the optimizer's plan estimates — the
  * machinery join reordering and broadcast selection depend on at
  * 100 TB, where "which side is small" is not knowable from file
  * sizes alone. */
class CboSpec extends SparkSpec {
  import spark.implicits._

  private def withCbo[A](body: => A): A = {
    val conf = spark.conf
    val old = Seq("spark.sql.cbo.enabled" -> conf.get("spark.sql.cbo.enabled", "false"))
    conf.set("spark.sql.cbo.enabled", "true")
    try body finally old.foreach { case (k, v) => conf.set(k, v) }
  }

  test("ANALYZE stats flow into optimizer estimates; selectivity uses column stats") {
    spark.sql("DROP TABLE IF EXISTS cbo_t")
    (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .write.mode("overwrite").saveAsTable("cbo_t")
    withCbo {
      // no stats yet: the optimizer has no row count for the table
      val before = spark.table("cbo_t")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(before.isEmpty || before.get != BigInt(1000),
        s"unexpected pre-ANALYZE rowCount: $before")
      spark.sql("ANALYZE TABLE cbo_t COMPUTE STATISTICS FOR ALL COLUMNS")
      val full = spark.table("cbo_t")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(full === Some(BigInt(1000)), s"rowCount after ANALYZE: $full")
      // k < 100 over uniform [0, 999]: min/max column stats put the
      // estimate near 100 rows, far from the 1000-row no-stats guess
      val est = spark.table("cbo_t").filter($"k" < 100)
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.isDefined && est.get >= BigInt(50) &&
        est.get <= BigInt(200), s"selectivity estimate off: $est")
    }
    spark.sql("DROP TABLE cbo_t")
  }
}
