// Hosted under org.apache.spark.sql for uniformity with the other
// out-of-tree Catalyst pieces in this package (LogicalRelation and
// HadoopFsRelation live in execution.datasources).
package org.apache.spark.sql.graftx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{col, count, lit}

/** RELY-constraint registry: informational uniqueness / referential-
  * integrity declarations over file-backed tables, identified (like
  * [[MvRegistry]]) by their scan root paths.
  *
  * Spark eliminates an unused join only when uniqueness is PROVABLE
  * from the plan (e.g. the right side is an Aggregate on the join
  * key); a plain parquet relation carries no key metadata, so the
  * classic warehouse star view — fact LEFT JOIN every dimension, each
  * query projecting a handful of columns — pays for every dimension
  * it never reads. Warehouses close this with informational
  * constraints (`PRIMARY KEY ... RELY`): the user asserts the
  * property, the optimizer trusts it. This registry is that
  * assertion; [[EliminateRelyJoin]] is the optimizer side.
  *
  * TRUST CONTRACT: a declaration is not checked at query time — a
  * false one (duplicate "unique" key, dangling "foreign" key) changes
  * results, exactly as RELY does in the engines that ship it. [[audit]]
  * is the trust-but-verify query: run it after loads, drop the
  * declaration if it returns rows.
  */
object RelyKeys {

  /** `roots`: scan root paths identifying the table. */
  final case class Unique(roots: Set[String], keyCol: String)

  /** fact(`fkCol`) references dim(`pkCol`): every non-null fact key
    * matches EXACTLY one dim row, and `fkNotNull` additionally
    * asserts the fact column has no nulls (required for inner-join
    * elimination — a null key row would be dropped by the join). */
  final case class Fk(factRoots: Set[String], fkCol: String,
      dimRoots: Set[String], pkCol: String, fkNotNull: Boolean)

  private val uniques =
    new java.util.concurrent.CopyOnWriteArrayList[Unique]
  private val fks =
    new java.util.concurrent.CopyOnWriteArrayList[Fk]

  def declareUnique(dim: DataFrame, keyCol: String): Unit = {
    val roots = MvRegistry.scanRoots(dim.queryExecution.analyzed)
    require(roots.nonEmpty, "declareUnique needs a file-backed scan")
    val e = Unique(roots, keyCol)
    if (!uniques.contains(e)) uniques.add(e)
  }

  def declareForeignKey(fact: DataFrame, fkCol: String, dim: DataFrame,
      pkCol: String, fkNotNull: Boolean = true): Unit = {
    val fr = MvRegistry.scanRoots(fact.queryExecution.analyzed)
    val dr = MvRegistry.scanRoots(dim.queryExecution.analyzed)
    require(fr.nonEmpty && dr.nonEmpty,
      "declareForeignKey needs file-backed scans on both sides")
    declareUnique(dim, pkCol) // an FK target is by definition unique
    val e = Fk(fr, fkCol, dr, pkCol, fkNotNull)
    if (!fks.contains(e)) fks.add(e)
  }

  def clear(): Unit = { uniques.clear(); fks.clear() }

  def allUnique: Seq[Unique] = {
    import scala.jdk.CollectionConverters._
    uniques.asScala.toSeq
  }

  def allFk: Seq[Fk] = {
    import scala.jdk.CollectionConverters._
    fks.asScala.toSeq
  }

  /** Trust-but-verify: the rows that FALSIFY a uniqueness declaration
    * (keys appearing more than once). Empty result = declaration
    * holds. One hash aggregate — run it per load, not per query. */
  def audit(dim: DataFrame, keyCol: String): DataFrame =
    dim.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Trust-but-verify for an FK: fact keys (incl. null if `fkNotNull`
    * was declared) with no dim match. Empty result = RI holds. */
  def auditFk(fact: DataFrame, fkCol: String, dim: DataFrame,
      pkCol: String): DataFrame =
    fact.select(col(fkCol)).join(dim.select(col(pkCol)),
        col(fkCol) === col(pkCol), "left_anti")
      .groupBy(col(fkCol)).agg(count(lit(1)).as("n_rows"))
}

/** Join elimination under RELY constraints — the star-view pruning
  * rule every warehouse ships and Spark lacks for plain file tables.
  *
  * Shapes handled (via `Project`/`Aggregate` parents, the forms the
  * fixed-point optimizer normalizes to):
  *
  *  1. `fact LEFT JOIN dim ON fact.fk = dim.pk` with no dim column
  *     referenced above, `dim.pk` declared UNIQUE → the join is
  *     dropped. Sound under uniqueness alone: each fact row survives
  *     a left join exactly once when the key matches ≤ 1 dim row, and
  *     unprojected null-padding is unobservable. Extra join
  *     conjuncts and dim-side filters only REDUCE matches, so they
  *     cannot break the ≤ 1 bound. (RIGHT JOIN mirror included.)
  *  2. `fact INNER JOIN dim ON fact.fk = dim.pk` with no dim column
  *     referenced above and a declared FOREIGN KEY (RI + fk NOT
  *     NULL) → dropped. Inner joins need the stronger declaration:
  *     they also FILTER fact rows, so every fact key must be present
  *     in the dim (and non-null) for row counts to survive. Here the
  *     dim side must be the BARE declared table (a dim-side filter
  *     would re-introduce filtering the fact never sees).
  *
  * The dim side may sit under column-pruning Projects, Filters
  * (case 1 only), and SubqueryAliases; anything else (another join,
  * an aggregate, a generator) bails. At 100 TB each fired elimination
  * deletes an entire scan + broadcast/shuffle stage from every query
  * through the wide view — the reason BI layers write those views
  * against RELY-constrained tables. Oracle-judged by
  * `j35_rely_elimination` (values equal DuckDB EXECUTING the joins);
  * RelyJoinSpec asserts the joins are actually gone from the plan.
  */
object EliminateRelyJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (RelyKeys.allUnique.isEmpty && RelyKeys.allFk.isEmpty) return plan
    plan.transformUp {
      case p @ Project(_, j: Join) =>
        tryEliminate(j, p.references).map(k => p.copy(child = k))
          .getOrElse(p)
      case a @ Aggregate(_, _, j: Join, _) =>
        tryEliminate(j, a.references).map(k => a.copy(child = k))
          .getOrElse(a)
    }
  }

  /** The surviving child, if `join` can be dropped given that the
    * parent references only `refs`. */
  private def tryEliminate(join: Join,
      refs: AttributeSet): Option[LogicalPlan] = join.joinType match {
    case LeftOuter if refs.subsetOf(join.left.outputSet) =>
      val conjuncts = join.condition.toSeq.flatMap(splitAnd)
      val pinned = conjuncts.exists {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          (join.left.outputSet.contains(a) && uniqueAt(join.right, b)) ||
            (join.left.outputSet.contains(b) && uniqueAt(join.right, a))
        case _ => false
      }
      if (pinned) Some(join.left) else None
    case RightOuter if refs.subsetOf(join.right.outputSet) =>
      val conjuncts = join.condition.toSeq.flatMap(splitAnd)
      val pinned = conjuncts.exists {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          (join.right.outputSet.contains(a) && uniqueAt(join.left, b)) ||
            (join.right.outputSet.contains(b) && uniqueAt(join.left, a))
        case _ => false
      }
      if (pinned) Some(join.right) else None
    case Inner if refs.subsetOf(join.left.outputSet) &&
        innerElimOk(join.left, join.right, join.condition) =>
      Some(join.left)
    case Inner if refs.subsetOf(join.right.outputSet) &&
        innerElimOk(join.right, join.left, join.condition) =>
      Some(join.right)
    case _ => None
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Inner-join elimination soundness: the SINGLE join condition is
    * `fact.fk = dim.pk` for a declared FK with fk NOT NULL, and the
    * dim side is the bare declared table (Projects/aliases allowed —
    * they're cardinality-neutral — but no Filter: RI says every fact
    * key exists in the FULL dim, not in a filtered one). Any extra
    * conjunct could drop fact rows, so exactly one is required. */
  private def innerElimOk(fact: LogicalPlan, dim: LogicalPlan,
      cond: Option[Expression]): Boolean = cond.toSeq.flatMap(splitAnd) match {
    case Seq(EqualTo(a: AttributeReference, b: AttributeReference)) =>
      val (fkAttr, pkAttr) =
        if (fact.outputSet.contains(a)) (a, b) else (b, a)
      fact.outputSet.contains(fkAttr) && dim.outputSet.contains(pkAttr) &&
        RelyKeys.allFk.exists { f =>
          f.fkNotNull && f.fkCol == fkAttr.name && f.pkCol == pkAttr.name &&
            rootsOf(dim, pkAttr, allowFilter = false).contains(f.dimRoots) &&
            fkSafe(fact, fkAttr, f.factRoots)
        }
    case _ => false
  }

  /** Is `attr` a declared-unique key of the relation under `plan`
    * (following cardinality-safe wrappers)? */
  private def uniqueAt(plan: LogicalPlan, attr: Attribute): Boolean =
    rootsOf(plan, attr, allowFilter = true).exists(roots =>
      RelyKeys.allUnique.exists(u =>
        u.roots == roots && u.keyCol == attr.name))

  /** Scan roots of the single relation under `plan`, provided `attr`
    * flows up from it unchanged through Project(attrs)/SubqueryAlias
    * (and Filter when `allowFilter` — filters only REMOVE rows, so
    * they preserve uniqueness but break RI). */
  private def rootsOf(plan: LogicalPlan, attr: Attribute,
      allowFilter: Boolean): Option[Set[String]] = plan match {
    case Project(list, child) if list.exists {
        case a: AttributeReference => a.exprId == attr.exprId
        case _ => false
      } => rootsOf(child, attr, allowFilter)
    case Filter(_, child) if allowFilter => rootsOf(child, attr, allowFilter)
    case SubqueryAlias(_, child) => rootsOf(child, attr, allowFilter)
    case lr: LogicalRelation if lr.outputSet.contains(attr) =>
      Some(MvRegistry.scanRoots(lr)).filter(_.nonEmpty)
    case _ => None
  }

  /** The fact side of an inner elimination may carry filters and
    * other already-planned joins (a star nests as
    * `((fact ⋈ d1) ⋈ d2)`), but the fk attribute must trace to the
    * DECLARED fact relation through operators that can never
    * NULL-PAD it — an upstream outer join writing nulls into fk
    * would produce rows the eliminated inner join was about to drop.
    * Row-REMOVING operators are fine (RI over a subset still holds);
    * null-introducing sides of outer joins are not. */
  private def fkSafe(plan: LogicalPlan, attr: Attribute,
      declared: Set[String]): Boolean = plan match {
    case Project(list, child) if list.exists {
        case a: AttributeReference => a.exprId == attr.exprId
        case _ => false
      } => fkSafe(child, attr, declared)
    case Filter(_, child) => fkSafe(child, attr, declared)
    case SubqueryAlias(_, child) => fkSafe(child, attr, declared)
    case j: Join if j.left.outputSet.contains(attr) =>
      // these join types never null-pad their LEFT side
      import org.apache.spark.sql.catalyst.plans.{Cross, LeftAnti, LeftSemi}
      (j.joinType match {
        case Inner | Cross | LeftOuter | LeftSemi | LeftAnti => true
        case _ => false
      }) && fkSafe(j.left, attr, declared)
    case j: Join if j.right.outputSet.contains(attr) =>
      import org.apache.spark.sql.catalyst.plans.Cross
      (j.joinType match {
        case Inner | Cross | RightOuter => true
        case _ => false
      }) && fkSafe(j.right, attr, declared)
    case lr: LogicalRelation if lr.outputSet.contains(attr) =>
      MvRegistry.scanRoots(lr) == declared && declared.nonEmpty
    case _ => false
  }
}
