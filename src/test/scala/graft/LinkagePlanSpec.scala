package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, Levenshtein}
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.graftx.{DamerauLevenshtein, JaroWinkler}
import graft.queries.RelationalQueries

/** Structural plan pins for the three ER linkage queries: the string
  * kernels (banded Levenshtein, JaroWinkler, DamerauLevenshtein) must
  * evaluate INSIDE WholeStageCodegen — asserted by walking the
  * physical-plan TREE and the expression ASTs, never by matching plan
  * strings, so Spark toString drift can't silently break the gate
  * (the j31 `isNullAwareAntiJoin` precedent). */
class LinkagePlanSpec extends SparkSpec {

  /** (total kernel-expression occurrences, occurrences whose hosting
    * plan node sits inside a WholeStageCodegen stage). A codegen stage
    * ends at InputAdapter — nodes below it belong to other stages. */
  private def kernelPlacement(df: DataFrame,
      isKernel: Expression => Boolean): (Int, Int) = {
    var total = 0
    var inside = 0
    def exprCount(p: SparkPlan): Int =
      p.expressions.map(_.collect { case e if isKernel(e) => e }.size).sum
    def walk(p: SparkPlan, in: Boolean): Unit = {
      val nowIn = p match {
        case _: WholeStageCodegenExec => true
        case _: InputAdapter => false
        case _ => in
      }
      val c = exprCount(p)
      total += c
      if (nowIn) inside += c
      p.children.foreach(walk(_, nowIn))
    }
    walk(df.queryExecution.executedPlan, in = false)
    (total, inside)
  }

  private def assertKernelCodegen(name: String, df: DataFrame,
      isKernel: Expression => Boolean): Unit = {
    // plain (non-adaptive) plan so the tree is fully materialized for
    // inspection without executing the query
    val (total, inside) = kernelPlacement(df, isKernel)
    assert(total > 0, s"$name: kernel expression not found in the plan — " +
      "the pin is vacuous:\n" + df.queryExecution.executedPlan)
    assert(inside == total,
      s"$name: ${total - inside} of $total kernel evaluations sit OUTSIDE " +
        "WholeStageCodegen (interpreted path):\n" +
        df.queryExecution.executedPlan)
  }

  private def withPlainPlans(body: => Unit): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("j19: banded Levenshtein kernel runs inside WholeStageCodegen") {
    withPlainPlans {
      assertKernelCodegen("j19_fuzzy_blocked",
        RelationalQueries.j19Scored(spark, sf0001),
        _.isInstanceOf[Levenshtein])
    }
  }

  test("j30: JaroWinkler kernel runs inside WholeStageCodegen") {
    withPlainPlans {
      assertKernelCodegen("j30_jw_linkage",
        RelationalQueries.j30Scored(spark, sf0001),
        _.isInstanceOf[JaroWinkler])
    }
  }

  test("j32: Damerau and banded-Levenshtein kernels inside codegen") {
    withPlainPlans {
      val df = RelationalQueries.queries("j32_damerau_blocked")(
        spark, sf0001)
      assertKernelCodegen("j32 damerau", df,
        _.isInstanceOf[DamerauLevenshtein])
      assertKernelCodegen("j32 banded levenshtein", df,
        _.isInstanceOf[Levenshtein])
    }
  }
}
