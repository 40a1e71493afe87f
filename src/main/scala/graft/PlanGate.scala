package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** PLAN-structure regression gate — the structural twin of [[IoGate]].
  *
  * IoGate budgets measured shuffle BYTES (needs a bench run at sf0.1);
  * this gate budgets the plan SHAPE itself, which is SF-independent
  * and costs only plan compilation at sf0.01: per query, a fingerprint
  * of the operator counts that matter at 100 TB —
  *
  *   - `exchange`  : `Exchange hashpartitioning` / `rangepartitioning`
  *                   occurrences (each is a full shuffle of its input)
  *   - `broadcast` : `BroadcastExchange` (fine at any SF by definition
  *                   — the build side is bounded — so budget-tracked
  *                   but not gated)
  *   - `cartesian` : `CartesianProduct` + `BroadcastNestedLoopJoin`
  *                   (gated to NEVER appear where the budget has none)
  *   - `window`    : `Window` operators (each implies a partitioned
  *                   sort inside its exchange)
  *
  * The gate fails (exit 1) when a query GROWS its shuffle count, gains
  * a cartesian/nested-loop, or gains a window over the committed
  * `PLAN_BUDGET.json` — the exact class of silent regression where a
  * refactor stays correct and fast at test SF but re-shuffles 100 TB
  * at deploy. Broadcast-count changes print as notices only (AQE
  * legitimately flips shuffle joins to broadcast at small SF).
  *
  * Run: `sbt "runMain graft.PlanGate"`        — gate
  *      `sbt "runMain graft.PlanGate update"` — rewrite PLAN_BUDGET.json
  */
object PlanGate {
  private val BudgetFile = "PLAN_BUDGET.json"

  final case class Fp(exchange: Int, broadcast: Int, cartesian: Int,
      window: Int)

  private def count(p: String, re: String): Int =
    re.r.findAllIn(p).size

  def fingerprint(plan: String): Fp = Fp(
    exchange = count(plan, "Exchange (hash|range)partitioning"),
    broadcast = count(plan, "BroadcastExchange"),
    cartesian = count(plan, "CartesianProduct") +
      count(plan, "BroadcastNestedLoopJoin"),
    window = count(plan, "\\bWindow(GroupLimit)? \\["))

  private def fingerprints(spark: SparkSession): Map[String, Fp] = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    graft.queries.Catalog.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        scala.util.Try {
          name -> fingerprint(
            fn(spark, dir).queryExecution.executedPlan.toString)
        }.toOption // a query that cannot build is Audit/Verify's problem
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plangate")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graftx.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val current = fingerprints(spark)

    if (args.headOption.contains("update")) {
      val body = current.toSeq.sortBy(_._1).map { case (n, f) =>
        s"""  "$n": {"exchange": ${f.exchange}, "broadcast": ${f.broadcast}, "cartesian": ${f.cartesian}, "window": ${f.window}}"""
      }.mkString("{\n", ",\n", "\n}\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(BudgetFile), body)
      println(s"[plangate] wrote $BudgetFile (${current.size} queries)")
      spark.stop(); return
    }

    val budgetPath = java.nio.file.Paths.get(BudgetFile)
    require(java.nio.file.Files.exists(budgetPath),
      s"$BudgetFile missing — run `graft.PlanGate update` on a good build")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val budget = mapper.readTree(java.nio.file.Files.readString(budgetPath))
      .properties().asScala.map { e =>
        e.getKey -> Fp(e.getValue.get("exchange").asInt(),
          e.getValue.get("broadcast").asInt(),
          e.getValue.get("cartesian").asInt(),
          e.getValue.get("window").asInt())
      }.toMap
    var bad = 0
    current.toSeq.sortBy(_._1).foreach { case (name, f) =>
      budget.get(name) match {
        case None =>
          println(s"[plangate] NEW   $name (not budgeted — re-run update)")
        case Some(b) =>
          val fails = Seq(
            (f.exchange > b.exchange,
              s"shuffles ${b.exchange}→${f.exchange}"),
            (f.cartesian > b.cartesian,
              s"cartesian/nested-loop ${b.cartesian}→${f.cartesian}"),
            (f.window > b.window, s"windows ${b.window}→${f.window}"))
            .collect { case (true, msg) => msg }
          if (fails.nonEmpty) {
            bad += 1
            println(s"[plangate] FAIL  $name: ${fails.mkString(", ")}")
          } else if (f.broadcast != b.broadcast) {
            println(s"[plangate] note  $name: broadcasts " +
              s"${b.broadcast}→${f.broadcast}")
          }
      }
    }
    println(s"[plangate] done, $bad regressions")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
