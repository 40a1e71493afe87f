package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Md5
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec

/** [[org.apache.spark.sql.graftx.DeferExpensiveProjection]]: expensive
  * projections move past the sort into `TakeOrderedAndProject`'s
  * post-top-k projection (late materialization — evaluated on k rows,
  * not all rows), results and schema unchanged. The rule is active via
  * the session extension registered in TestSpark. */
class DeferProjectionSpec extends SparkSpec {

  private def customers = Tables.load(spark, sf001, "customer")

  /** True iff the md5 ends up in TakeOrderedAndProject's deferred
    * projection (post-top-k) and NOT in the plan below it. */
  private def md5Deferred(df: org.apache.spark.sql.DataFrame): Boolean = {
    val topk = df.queryExecution.executedPlan.collectFirst {
      case t: TakeOrderedAndProjectExec => t
    }
    topk.exists { t =>
      t.projectList.exists(_.exists(_.isInstanceOf[Md5])) &&
        !t.child.toString.contains("md5(")
    }
  }

  test("md5 projection is deferred past the top-k") {
    val q = customers
      .select(col("c_custkey"), md5(col("c_name")).as("h"))
      .orderBy(col("c_custkey")).limit(7)
    assert(md5Deferred(q), s"\n${q.queryExecution.executedPlan}")
  }

  test("deferred plan returns the same rows, schema, and order") {
    val early = customers
      .select(col("c_custkey"), md5(col("c_name")).as("h"),
        upper(col("c_mktsegment")).as("seg"))
      .orderBy(col("c_custkey")).limit(25)
    // manual late materialization — shape the rule leaves alone
    val late = customers
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey")).limit(25)
      .select(col("c_custkey"), md5(col("c_name")).as("h"),
        upper(col("c_mktsegment")).as("seg"))
    assert(early.schema === late.schema)
    assert(early.collect().toSeq === late.collect().toSeq)
  }

  test("sort key depending on the expensive expression blocks the rewrite") {
    val q = customers
      .select(col("c_custkey"), md5(col("c_name")).as("h"))
      .orderBy(col("h")).limit(7)
    assert(!md5Deferred(q),
      s"md5 feeds the sort key; it must stay below the top-k:" +
        s"\n${q.queryExecution.executedPlan}")
    // and it still answers correctly: the minimum hash wins
    val viaAll = customers.select(md5(col("c_name")).as("h"))
      .agg(min("h")).collect()(0).getString(0)
    assert(q.collect()(0).getString(1) === viaAll)
  }

  test("stacked projects and computed cheap sort keys defer as a chain") {
    val early = customers
      .select(col("c_custkey"), col("c_name"),
        (col("c_custkey") % 97).as("bucket"))
      .select(col("c_custkey"), col("bucket"),
        md5(col("c_name")).as("h"),
        split(col("c_name"), " ").as("parts"))
      .orderBy(col("bucket"), col("c_custkey")).limit(13)
    assert(md5Deferred(early), s"\n${early.queryExecution.executedPlan}")
    val late = customers
      .select(col("c_custkey"), col("c_name"),
        (col("c_custkey") % 97).as("bucket"))
      .orderBy(col("bucket"), col("c_custkey")).limit(13)
      .select(col("c_custkey"), col("bucket"),
        md5(col("c_name")).as("h"),
        split(col("c_name"), " ").as("parts"))
    assert(early.schema === late.schema)
    assert(early.collect().toSeq === late.collect().toSeq)
  }

  test("nondeterministic projections are never deferred") {
    val q = customers
      .select(col("c_custkey"), (rand(7) + length(md5(col("c_name")))).as("r"))
      .orderBy(col("c_custkey")).limit(7)
    assert(!md5Deferred(q),
      s"rand() must stay put:\n${q.queryExecution.executedPlan}")
    assert(q.count() === 7)
  }
}
