// Hosted under org.apache.spark.sql for uniformity with the other
// out-of-tree Catalyst pieces in this package (LogicalRelation and
// HadoopFsRelation live in execution.datasources).
package org.apache.spark.sql.graftx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}

/** Materialized-view registry: pairs a BASE table (identified by its
  * file-scan root paths) with a pre-aggregated SUMMARY table and the
  * grouping/measure contract the summary was built under.
  *
  * The summary layout `buildSummary` writes per measure column `c`:
  * `__sum_c`, `__cnt_c` (non-null count), `__min_c`, `__max_c`, plus
  * one `__cnt_star` — the partial-aggregate decomposition that makes
  * sum/count/min/max/count(*) losslessly re-aggregable at ANY
  * coarser grouping of the view's group columns.
  *
  * Freshness is the caller's contract (the classic MV trade):
  * re-run [[buildSummary]] after base loads; [[MvRegistry.clear]]
  * drops all registrations.
  */
object MvRegistry {

  final case class Entry(baseRoots: Set[String], groupCols: Set[String],
      measureCols: Set[String], summary: LogicalPlan)

  private val entries =
    new java.util.concurrent.CopyOnWriteArrayList[Entry]

  def register(baseDf: DataFrame, summaryDf: DataFrame,
      groupCols: Seq[String], measureCols: Seq[String]): Unit = {
    val roots = scanRoots(baseDf.queryExecution.analyzed)
    require(roots.nonEmpty, "base must be a file-backed scan")
    entries.add(Entry(roots, groupCols.toSet, measureCols.toSet,
      summaryDf.queryExecution.analyzed))
  }

  def clear(): Unit = entries.clear()

  def all: Seq[Entry] = {
    import scala.jdk.CollectionConverters._
    entries.asScala.toSeq
  }

  /** Root paths of every file relation under `plan`. */
  def scanRoots(plan: LogicalPlan): Set[String] = plan.collect {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.map(_.toString).toSet
      case _ => Set.empty[String]
    }
  }.flatten.toSet

  /** Build + write the summary parquet for (`groupCols`,
    * `measureCols`) over `base`, register it, and return the summary
    * frame. ONE aggregate job at view-build time buys every
    * subsequent matching query a summary-sized scan. */
  def buildSummary(base: DataFrame, path: String, groupCols: Seq[String],
      measureCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && measureCols.nonEmpty,
      "need group and measure columns")
    val aggs = measureCols.flatMap(c => Seq(
      sum(col(c)).as(s"__sum_$c"), count(col(c)).as(s"__cnt_$c"),
      min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))) :+
      count(lit(1)).as("__cnt_star")
    base.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(path)
    val summary = base.sparkSession.read.parquet(path)
    register(base, summary, groupCols, measureCols)
    summary
  }
}

/** Materialized-view REWRITE rule: an aggregate over a registered
  * base table is answered from its pre-aggregated summary instead —
  * the optimization every warehouse sells as "aggregate awareness",
  * here as a ~100-line Catalyst `Rule[LogicalPlan]` injected via
  * [[GraftExtensions]].
  *
  * Matches `Aggregate(G, aggs, [Project] [Filter] Scan(base))` where
  *  - every grouping expression is a bare column ⊆ the view's group
  *    columns (any COARSER grouping re-aggregates correctly — that is
  *    what the partial decomposition is for),
  *  - every aggregate is a plain (non-distinct, unfiltered)
  *    sum/count/min/max of a measure column or count(*),
  *  - the optional WHERE references group columns only (predicate
  *    subsumption: such a filter keeps or drops whole summary groups,
  *    so it replays verbatim over the summary; a measure predicate
  *    would select rows the summary already merged and rejects the
  *    rewrite),
  * and rewrites `sum(c) → sum(__sum_c)`, `count(c) → sum(__cnt_c)`,
  * `count(*) → sum(__cnt_star)`, `min(c) → min(__min_c)`,
  * `max(c) → max(__max_c)` over the summary scan. Output attribute
  * ids, names, and types are preserved exactly (the rewrite bails if
  * any re-aggregated type would drift — e.g. widening decimals), so
  * parent plans never notice.
  *
  * At 100 TB this turns every dashboard-shaped rollup from a
  * full-fact-table scan into a summary-sized one; correctness is
  * oracle-proven by `mv_rewrite` (values match DuckDB over the BASE)
  * while PlanGateSpec asserts the scan really moved to the summary.
  */
object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvRegistry.all.isEmpty) return plan
    plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }
  }

  /** Peel the optional pure-attribute Project and an optional Filter
    * off the aggregate's child. The filter is returned for
    * SUBSUMPTION: a predicate over GROUP columns only partitions
    * whole summary groups, so re-applying it verbatim over the
    * summary is exact (a predicate touching measure columns selects
    * individual base rows the summary has already merged — not
    * subsumable, the caller must reject it). */
  private def peel(plan: LogicalPlan)
      : (Option[Expression], LogicalPlan) = plan match {
    case Project(list, child)
        if list.forall(_.isInstanceOf[AttributeReference]) =>
      child match {
        case Filter(cond, grand) => (Some(cond), grand)
        case other => (None, other)
      }
    case Filter(cond, child) => (Some(cond), unproject(child))
    case other => (None, other)
  }

  /** The scan under an optional pure-attribute Project. */
  private def unproject(plan: LogicalPlan): LogicalPlan = plan match {
    case Project(list, child)
        if list.forall(_.isInstanceOf[AttributeReference]) => child
    case other => other
  }

  /** Map a base aggregate call to its summary re-aggregation, or None
    * when the function (or its argument) is outside the view's
    * contract. Count rewrites come back wrapped in `coalesce(·, 0)`:
    * `count` is non-nullable while `sum` is nullable, and the rewrite
    * must reproduce the original schema EXACTLY (the sum can't
    * actually be null — every matched group aggregates ≥ 1 summary
    * row — so the coalesce is a type-level identity). */
  private def rewriteAgg(ae: AggregateExpression, e: MvRegistry.Entry,
      sOut: Map[String, Attribute]): Option[Expression] = {
    def reSum(a: Attribute): Expression =
      Coalesce(Seq(ae.copy(aggregateFunction = Sum(a)), Literal(0L)))
    ae.aggregateFunction match {
      case Sum(c: AttributeReference, mode)
          if e.measureCols.contains(c.name) =>
        sOut.get(s"__sum_${c.name}")
          .map(a => ae.copy(aggregateFunction = Sum(a, mode)))
      case Count(Seq(c: AttributeReference))
          if e.measureCols.contains(c.name) =>
        sOut.get(s"__cnt_${c.name}").map(reSum)
      case Count(Seq(_: Literal)) | Count(Seq()) =>
        sOut.get("__cnt_star").map(reSum)
      case Min(c: AttributeReference) if e.measureCols.contains(c.name) =>
        sOut.get(s"__min_${c.name}")
          .map(a => ae.copy(aggregateFunction = Min(a)))
      case Max(c: AttributeReference) if e.measureCols.contains(c.name) =>
        sOut.get(s"__max_${c.name}")
          .map(a => ae.copy(aggregateFunction = Max(a)))
      case _ => None
    }
  }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = {
    val (filter, scan) = peel(agg.child)
    if (!scan.isInstanceOf[LogicalRelation]) return None
    val roots = MvRegistry.scanRoots(scan)
    val entry = MvRegistry.all.find { e =>
      // a filter is subsumable only when it is deterministic and
      // references the view's GROUP columns exclusively
      val filterOk = filter.forall(f => f.deterministic && f.references
        .forall(a => e.groupCols.contains(a.name)))
      e.baseRoots == roots && filterOk && matches(agg, e)
    }.getOrElse(return None)
    val sOut = entry.summary.output.map(a => a.name -> a).toMap
    val groupNames = agg.groupingExpressions.collect {
      case a: AttributeReference => a.name
    }.toSet

    val newGroup = agg.groupingExpressions.map {
      case a: AttributeReference => sOut(a.name)
    }
    // rewrite each output expression IN PLACE: embedded aggregate
    // calls re-target their summary partials, grouping refs re-bind
    // to summary attributes, everything around them (round, casts,
    // arithmetic) is preserved verbatim
    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      val t = ne.transformUp {
        case ae: AggregateExpression =>
          rewriteAgg(ae, entry, sOut).getOrElse(ae)
        case a: AttributeReference if groupNames.contains(a.name) =>
          sOut(a.name)
      }
      t match { // a bare grouping column must keep its output exprId
        case a: Attribute if a.exprId != ne.exprId =>
          Alias(a, ne.name)(exprId = ne.exprId)
        case named: NamedExpression => named
      }
    }
    // re-bind the subsumed filter onto summary attributes and keep it
    // under the aggregate, where the parquet source can push it down
    val newChild = filter match {
      case Some(cond) => Filter(cond.transformUp {
        case a: AttributeReference => sOut(a.name)
      }, entry.summary)
      case None => entry.summary
    }
    // prune the summary scan to what the rewrite references
    val needed = (newGroup ++ newAggs ++ newChild.expressions)
      .flatMap(_.references).distinct
    val rewritten = Aggregate(newGroup, newAggs,
      Project(needed, newChild))
    // the summary must answer with EXACTLY the original schema —
    // widening types (decimal re-sums) or unresolved refs mean bail
    if (rewritten.resolved &&
      rewritten.schema == agg.schema) Some(rewritten) else None
  }

  /** Structural pre-check against one registry entry: bare-column
    * grouping within the view's group set; every aggregate call a
    * plain (non-distinct, unfiltered) sum/count/min/max over a
    * measure column or count(*); every column referenced OUTSIDE an
    * aggregate call a grouping column. */
  private def matches(agg: Aggregate, e: MvRegistry.Entry): Boolean = {
    val groupsOk = agg.groupingExpressions.forall {
      case a: AttributeReference => e.groupCols.contains(a.name)
      case _ => false
    }
    val groupNames = agg.groupingExpressions.collect {
      case a: AttributeReference => a.name
    }.toSet
    def outsideRefsOk(expr: Expression): Boolean = expr match {
      case _: AggregateExpression => true // inner refs checked below
      case a: AttributeReference => groupNames.contains(a.name)
      case other => other.children.forall(outsideRefsOk)
    }
    val aggsOk = agg.aggregateExpressions.forall { ne =>
      outsideRefsOk(ne) && ne.collect {
        case ae: AggregateExpression => ae
      }.forall { ae =>
        !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
          case Sum(c: AttributeReference, _) => e.measureCols.contains(c.name)
          case Count(Seq(c: AttributeReference)) =>
            e.measureCols.contains(c.name)
          case Count(Seq(_: Literal)) | Count(Seq()) => true
          case Min(c: AttributeReference) => e.measureCols.contains(c.name)
          case Max(c: AttributeReference) => e.measureCols.contains(c.name)
          case _ => false
        })
      }
    }
    groupsOk && aggsOk
  }
}
