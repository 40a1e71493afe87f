// Same package rationale as CosineSimilarity.scala: the expression
// constructors and FunctionRegistry builder types are private[sql].
package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions as SQL
  * functions, so the pure-SQL surface (`spark.sql`, the reference's
  * query-endpoint passthrough shape, src/api/main.py:154-221) can call
  * them:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "org.apache.spark.sql.graftx.GraftExtensions")
  * spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  *
  * Catalyst injection points used: `injectFunction` for the native
  * expressions, `injectOptimizerRule` for [[DeferExpensiveProjection]]
  * (late materialization of expensive projections through top-k).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "_FUNC_(a, b) - cosine similarity of two double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity takes 2 arguments")
        CosineSimilarity(args(0), args(1))
      }: Expression))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product",
        "_FUNC_(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product takes 2 arguments")
        DotProduct(args(0), args(1))
      }: Expression))
    ext.injectFunction((
      FunctionIdentifier("unaccent"),
      info("unaccent",
        "_FUNC_(s) - strip accents (NFD + drop combining marks)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "unaccent takes 1 argument")
        Unaccent(args(0))
      }: Expression))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "_FUNC_(a, b) - Jaro-Winkler similarity in [0,1] (classic " +
          "0.7 boost threshold, prefix cap 4)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaro_winkler takes 2 arguments")
        JaroWinkler(args(0), args(1))
      }: Expression))
    ext.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      info("damerau_levenshtein",
        "_FUNC_(a, b) - unrestricted Damerau-Levenshtein edit distance" +
          " (insert/delete/substitute/transpose)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "damerau_levenshtein takes 2 arguments")
        DamerauLevenshtein(args(0), args(1))
      }: Expression))
    ext.injectFunction((
      FunctionIdentifier("space_saving_topk"),
      info("space_saving_topk",
        "_FUNC_(item, capacity, k) - mergeable SpaceSaving top-k summary" +
          ": array of (item, cnt, err) structs, cnt desc"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "space_saving_topk takes 3 arguments")
        def lit(e: Expression, what: String): Int = {
          require(e.foldable, s"space_saving_topk $what must be a literal")
          e.eval(null) match {
            case i: Int => i
            case other => throw new IllegalArgumentException(
              s"space_saving_topk $what must be an int literal, got $other")
          }
        }
        SpaceSavingTopK(args.head, lit(args(1), "capacity"),
          lit(args(2), "k"))
      }: Expression))
    ext.injectOptimizerRule(_ => DeferExpensiveProjection)
    ext.injectOptimizerRule(_ => MvRewrite)
    ext.injectOptimizerRule(_ => EliminateRelyJoin)
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}

object GraftExtensions {
  /** Imperative registration onto an existing session (tests, REPLs). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity",
      args => CosineSimilarity(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      args => DotProduct(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("unaccent",
      args => Unaccent(args(0)), "scala_udf")
  }
}
