package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeMap, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Automatic multi-join → UNION-fusion (the second custom-rule
  * candidate SURVEY.md §4.1 names; the manual form is
  * [[graft.operators.Relational.unionFusedJoin]] after reference
  * docs/sql调优.md:59-71).
  *
  * Pattern: `UNION ALL` of two inner joins over the same fact and the
  * same dim, probing the SAME dim key with (possibly) DIFFERENT
  * fact-side keys — the reference's "one dim column matches either of
  * two fact columns" shape, which Hive runs as two jobs.
  *
  * Rewrite: union a `fact.output :+ key` projection per branch (one
  * pass over the fact) and join the dim ONCE on the unified key. At
  * scale this halves the dim-side shuffles/broadcasts and turns two
  * join stages into one; the row multiset is identical because each
  * fact row enters the union once per original branch and matches
  * exactly what that branch matched.
  *
  * The rule shares the optimizer's fixed-point batch with
  * ColumnPruning, so by the time it fires each branch's fact side is
  * usually a different pruned `Project` over the same relation —
  * branch expressions are REBASED through those project lists onto the
  * common base before comparison/fusion, and output attribute ids are
  * preserved by re-aliasing with the original exprIds.
  *
  * Opt-in via `spark.graft.unionFusedJoin.enabled` (default false),
  * mirroring [[ApproxDistinctRewrite]]. Guards are strict: inner
  * joins, one deterministic EqualTo split cleanly across the sides,
  * `sameResult` bases, semantically-equal dim keys and per-position
  * output values — anything else is left untouched.
  */
object UnionFusedJoinRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get
      .getConfString("spark.graft.unionFusedJoin.enabled", "false")
      .toBoolean

  /** A union child that is a bare inner join or a Project over one. */
  private def unwrap(p: LogicalPlan)
      : Option[(Seq[NamedExpression], Join)] = p match {
    case j: Join if j.joinType == Inner => Some((j.output, j))
    case Project(pl, j: Join) if j.joinType == Inner => Some((pl, j))
    case _ => None
  }

  /** Split a single-EqualTo condition into (leftKey, rightKey). */
  private def sides(j: Join): Option[(Expression, Expression)] =
    j.condition match {
      case Some(EqualTo(a, b)) if a.deterministic && b.deterministic =>
        if (a.references.subsetOf(j.left.outputSet) &&
            b.references.subsetOf(j.right.outputSet)) Some((a, b))
        else if (b.references.subsetOf(j.left.outputSet) &&
            a.references.subsetOf(j.right.outputSet)) Some((b, a))
        else None
      case _ => None
    }

  /** Strip one pruning/compute Project off a fact side: returns the
    * base plan plus a substitution rewriting expressions phrased in the
    * project's output into expressions over the base's output. */
  private def rebase(l: LogicalPlan)
      : Option[(LogicalPlan, Expression => Expression)] = l match {
    case Project(pl, base) if pl.forall(_.deterministic) =>
      val defs = AttributeMap(pl.collect {
        case a: Alias => a.toAttribute -> a.child
      })
      Some((base, e => e.transformUp {
        case at: Attribute => defs.getOrElse(at, at)
      }))
    case j: Join => None // don't treat a join output as a fact base
    case other => Some((other, identity[Expression] _))
  }

  private def strip(e: NamedExpression): Expression = e match {
    case Alias(c, _) => c
    case e => e
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case u @ Union(Seq(c1, c2), false, false) =>
        fuse(c1, c2).getOrElse(u)
    }

  private def fuse(c1: LogicalPlan, c2: LogicalPlan): Option[LogicalPlan] =
    for {
      (out1, j1) <- unwrap(c1)
      (out2, j2) <- unwrap(c2)
      if out1.length == out2.length
      (base1, reb1) <- rebase(j1.left)
      (base2, reb2) <- rebase(j2.left)
      if base1.sameResult(base2)
      if base1.output.map(_.dataType) == base2.output.map(_.dataType)
      if j1.right.sameResult(j2.right)
      if j1.right.output.map(_.dataType) == j2.right.output.map(_.dataType)
      (fk1, dk1) <- sides(j1)
      (fk2, dk2) <- sides(j2)
      // map branch-2 attributes into branch-1's id space (sameResult
      // plans correspond positionally — the CacheManager contract)
      b2map = AttributeMap(base2.output.zip(base1.output) ++
        j2.right.output.zip(j1.right.output))
      toB1 = (e: Expression) => e.transformUp {
        case at: Attribute => b2map.getOrElse(at, at)
      }
      fk1b = reb1(fk1)
      fk2b = toB1(reb2(fk2))
      dk2m = toB1(dk2)
      // both branches must probe the SAME dim key, with one shared
      // fact-key type (they become one union column)
      if dk2m.semanticEquals(dk1)
      if fk1b.dataType == fk2b.dataType
      if fk1b.deterministic && fk2b.deterministic
      // per-position output values must agree once branch 2 is rebased
      // and mapped — names/ids stay branch 1's, exactly as the original
      // Union's output did
      rebOut1 = out1.map(e => rebOnLeft(reb1, j1, strip(e)))
      rebOut2 = out2.map(e => toB1(rebOnLeft(reb2, j2, strip(e))))
      if rebOut1.forall(_.deterministic)
      if rebOut1.zip(rebOut2).forall { case (a, b) => a.semanticEquals(b) }
    } yield {
      val lhs = Union(Seq(
        Project(base1.output :+ Alias(fk1b, "__graft_fused_k")(), base1),
        Project(base1.output :+ Alias(fk2b, "__graft_fused_k")(), base1)))
      val kAttr = lhs.output.last
      val fused =
        Join(lhs, j1.right, Inner, Some(EqualTo(kAttr, dk1)), JoinHint.NONE)
      // restore the original union output ids (they were branch 1's)
      val outList: Seq[NamedExpression] = out1.zip(rebOut1).map {
        case (orig, at: Attribute) if at.exprId == orig.exprId => at
        case (orig, e) =>
          Alias(e, orig.name)(exprId = orig.exprId,
            qualifier = orig.qualifier)
      }
      Project(outList, fused)
    }

  /** Rebase only the fact-side references of a branch-output
    * expression; dim-side attributes pass through untouched. */
  private def rebOnLeft(reb: Expression => Expression, j: Join,
      e: Expression): Expression = e.transformUp {
    case at: Attribute if j.left.outputSet.contains(at) => reb(at)
  }
}
