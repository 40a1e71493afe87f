// Hosted under org.apache.spark.sql for uniformity with the other
// out-of-tree Catalyst pieces in this package (the rule itself only
// touches public catalyst classes).
package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Late materialization for top-k queries: defer expensive projections
  * until after the limit.
  *
  * `df.select(expensive…).orderBy(cheapKey).limit(k)` plans as
  * `Limit(Sort(Project(expensive)))` — `TakeOrderedAndProject` avoids
  * the global sort but still evaluates the projection for EVERY input
  * row, even though only k survive (the physical operator defers a
  * projection only when it sits directly between the limit and the
  * sort, which `CollapseProject` often prevents by refusing to merge
  * non-cheap shared subexpressions). When the sort keys don't depend
  * expensively on the projected columns, the whole projection chain can
  * move above the limit:
  *
  * {{{
  * GlobalLimit(k, LocalLimit(k, Sort(keys, P1(P2(…(child))))))
  *   ⇒ P1(P2(…(GlobalLimit(k, LocalLimit(k,
  *        Sort(keys', Project(inputs ++ keyAliases, child)))))))
  * }}}
  *
  * where `keys'` re-derives each sort key directly over `child` (inlining
  * the chain's aliases; only allowed when the inlined key is itself
  * cheap). On a 100 TB corpus this is the difference between running a
  * regex / md5 / higher-order-function chain over every document versus
  * over the k rows a preview-style query actually returns: cost drops
  * from O(rows) to O(k) for every deferred expression, and the narrow
  * pre-limit projection additionally prunes the sorted row width.
  * Output attributes keep their exprIds, so parent plans and the result
  * schema are untouched; everything moved must be deterministic, so the
  * selected rows are too.
  *
  * `CollapseProject` cannot undo the split: its project-through-limit
  * case requires the outer list to be a pure renaming, and the deferred
  * chain never is (it computes something expensive by construction).
  */
object DeferExpensiveProjection extends Rule[LogicalPlan] {

  private val MaxChain = 8

  /** Worth deferring: per-row cost large enough to dominate a scan —
    * regex, cryptographic hash, JSON parse, interpreted higher-order
    * functions, splits/sequence materializing arrays. */
  private def isExpensive(e: Expression): Boolean = e.exists {
    case _: RegExpReplace | _: RegExpExtract | _: RegExpExtractAll |
        _: RLike | _: Like | _: MultiLikeBase => true
    case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 | _: XxHash64 => true
    case _: HigherOrderFunction => true
    case _: GetJsonObject | _: JsonToStructs | _: StructsToJson |
        _: JsonTuple | _: LengthOfJsonArray | _: JsonObjectKeys => true
    case _: StringSplit | _: Sequence | _: SortArray | _: ArraySort => true
    case _: FormatString | _: Conv | _: FromUnixTime | _: DateFormatClass => true
    case _ => false
  }

  /** Peel a chain of deterministic Projects (top-first). */
  private def peel(plan: LogicalPlan, acc: Seq[Project] = Nil)
      : (Seq[Project], LogicalPlan) = plan match {
    case p @ Project(list, child)
        if acc.size < MaxChain && list.forall(_.deterministic) =>
      peel(child, acc :+ p)
    case other => (acc, other)
  }

  /** Inline chain aliases (top-first lists) into `e` until it references
    * only the chain input's attributes. */
  private def inline(e: Expression, lists: Seq[Seq[NamedExpression]])
      : Expression =
    lists.foldLeft(e) { (cur, list) =>
      val m = AttributeMap(list.collect {
        case a: Alias => (a.toAttribute, a.child)
      })
      cur.transformUp { case a: Attribute => m.getOrElse(a, a) }
    }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case gl @ GlobalLimit(_, ll @ LocalLimit(_,
        srt @ Sort(order, true, projected: Project, _)))
        if order.forall(_.deterministic) => {
      val (chain, child) = peel(projected)
      val lists = chain.map(_.projectList)
      lazy val inlinedOrder =
        order.map(so => so.copy(child = inline(so.child, lists)))
      if (chain.isEmpty || !lists.exists(_.exists(isExpensive)) ||
          inlinedOrder.exists(so => isExpensive(so.child) ||
            !so.references.subsetOf(child.outputSet))) {
        gl
      } else {
        // narrow pre-limit row: chain inputs + re-derived sort keys
        val chainInputs = AttributeSet(lists.last.flatMap(_.references))
          .intersect(child.outputSet)
        val keyAliases = inlinedOrder.map(so =>
          Alias(so.child, "__graft_sortkey")())
        val narrow = Project(
          child.output.filter(chainInputs.contains) ++ keyAliases, child)
        val newOrder = order.zip(keyAliases).map { case (so, a) =>
          so.copy(child = a.toAttribute)
        }
        val limited = gl.copy(child = ll.copy(child =
          srt.copy(order = newOrder, child = narrow)))
        // re-stack the chain (bottom project reads chain inputs by
        // exprId; the sort-key aliases fall away at that level)
        chain.foldRight(limited: LogicalPlan)((p, c) => p.copy(child = c))
      }
    }
  }
}
