package graft.plans

import graft.source.MessageQueueTable
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StringType

/**
 * Pushes `properties['k'] = 'v'` predicates into the graft-mq reader — the
 * Spark analog of the reference consumer's broker-side SQL92 property
 * selector (reference: example/PropertyFilterExamples.java:33, the
 * MessageSelector.bySql path).
 *
 * Map-access predicates never reach a DSv2 ScanBuilder: they are not
 * expressible as DSv1 `Filter`s, and Spark's V2ExpressionBuilder does not
 * translate `GetMapValue` either (checked against 4.1: GetArrayItem is
 * handled, map access is not), so `SupportsPushDownV2Filters` would never
 * see them. Hence this optimizer rule: it matches a Filter directly over a
 * graft-mq relation, harvests property-equality conjuncts, and rewrites the
 * relation onto a table whose reader options carry them (the same
 * `propertyFilter` the user can set by hand). The reader then drops
 * non-matching messages before materializing rows.
 *
 * The predicate stays in the plan as a residual — the rewrite is a strict
 * row-count reduction at the scan, never a semantics change:
 *  - only null-safe accesses are consumed (`GetMapValue` returns null on a
 *    missing key; `ElementAt` only with failOnError=false, i.e.
 *    try_element_at or non-ANSI sessions) — a throwing access must keep its
 *    chance to throw, so it is left alone;
 *  - a key already constrained by the user's own propertyFilter option is
 *    skipped (narrowing it could widen nothing, but the option is the
 *    user's contract; the residual still enforces the predicate);
 *  - conflicting equalities on one key push one of them — the reader reads
 *    a superset of the (empty) answer and the residual decides.
 *
 * Registered by `graft.functions.GraftExtensions`
 * (spark.sql.extensions=graft.functions.GraftExtensions); injected as an
 * operator-optimization rule, which runs before V2ScanRelationPushDown
 * builds the physical scan.
 */
object PushPropertyPredicates extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, rel: DataSourceV2Relation) if f.resolved =>
      rel.table match {
        case t: MessageQueueTable =>
          val pairs = splitConjuncts(cond)
            .flatMap(propertyEq(_, rel))
            .filterNot { case (k, _) => t.opts.propertyFilter.contains(k) }
            .toMap
          if (pairs.isEmpty) f
          else Filter(cond,
            rel.copy(table = t.withPropertyFilter(t.opts.propertyFilter ++ pairs)))
        case _ => f
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def stringLit(e: Expression): Option[String] = e match {
    case Literal(v, StringType) if v != null => Some(v.toString)
    case _ => None
  }

  /** The key of a null-safe string access into this relation's `properties`
    * column, if `e` is one. */
  private def propsKey(e: Expression, rel: DataSourceV2Relation): Option[String] = e match {
    case GetMapValue(a: AttributeReference, k) if isProps(a, rel) => stringLit(k)
    case ea: ElementAt if !ea.failOnError =>
      ea.left match {
        case a: AttributeReference if isProps(a, rel) => stringLit(ea.right)
        case _ => None
      }
    case _ => None
  }

  private def isProps(a: AttributeReference, rel: DataSourceV2Relation): Boolean =
    a.name == "properties" && rel.outputSet.contains(a)

  private def propertyEq(
      e: Expression, rel: DataSourceV2Relation): Option[(String, String)] = e match {
    case EqualTo(l, r) => eqPair(l, r, rel)
    case EqualNullSafe(l, r) => eqPair(l, r, rel) // non-null literal: same rows
    case _ => None
  }

  private def eqPair(
      l: Expression, r: Expression, rel: DataSourceV2Relation): Option[(String, String)] =
    propsKey(l, rel).flatMap(k => stringLit(r).map(k -> _))
      .orElse(propsKey(r, rel).flatMap(k => stringLit(l).map(k -> _)))
}
