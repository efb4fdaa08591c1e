package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EvalMode, Expression, NamedExpression, UnscaledValue}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.DecimalType

import graft.functions.{DecimalSum128, DecimalSum192, Unscaled192}

/** Rewrite `Sum` over `DECIMAL(p<=18, s)` inputs to the result-identical
  * [[graft.functions.DecimalSum128]] 128-bit-integer accumulator.
  *
  * This engine deliberately accumulates every double measure in DECIMAL
  * (deterministic, partition-order-free — the oracle hash-compare
  * depends on it), which makes decimal SUM the single hottest scalar
  * kernel in the suite. Spark's `Sum` buffers such a sum as
  * `DECIMAL(p+10, s)` — beyond the 18-digit compact range — so every
  * per-row accumulate takes the `java.math.BigDecimal` slow path.
  * The rewritten aggregate buffers two longs and adds unscaled values
  * with 128-bit integer math instead (see DecimalSum128's scaladoc for
  * the exact-parity argument: same dataType, same NULL-on-empty, same
  * NULL-on-precision-overflow, same final BigDecimal→double rounding).
  *
  * Shape: each eligible `Sum(c)` becomes `DecimalSum128(u)` over a
  * column `u = UnscaledValue(c)` added by one Project directly under
  * the Aggregate — the decimal cast is paid ONCE per row there
  * (deduped across sums of the same expression), while the aggregate's
  * several per-buffer references to its child read a plain long.
  *
  * Scope guards:
  *  - legacy (non-ANSI) evaluation only — ANSI Sum THROWS on overflow,
  *    ours nulls like legacy Sum (this engine always runs ansi=false);
  *  - non-DISTINCT sums only (DISTINCT routes through Expand planning);
  *  - `DECIMAL(p<=18, 0<=s<=p)` only, where unscaled values are
  *    long-backed by construction;
  *  - Aggregate nodes only (window frames recompute aggregates per
  *    frame — correct either way, but out of scope).
  *
  * On by default (it preserves results bitwise); kill switch:
  * `spark.graft.decimalSum128.enabled=false`.
  */
object DecimalSum128Rewrite extends Rule[LogicalPlan] {

  /** THREAD-CONFINED suppression for canonical-plan construction
    * ([[AggRouting]] phrases route canonicals over builtin Sum trees,
    * so it optimizes them with this rewrite off). A thread-local
    * instead of a session-conf toggle: two overlapping canonical()
    * calls mutating the shared SQLConf could interleave save/restore
    * and leave the rewrite disabled for the whole session — and any
    * query planned concurrently on another thread would silently skip
    * it too. */
  private[plans] val suppressed = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  private def enabled: Boolean =
    !suppressed.get() &&
      SQLConf.get
        .getConfString("spark.graft.decimalSum128.enabled", "true")
        .toBoolean

  private def eligible(e: Expression): Boolean = e.dataType match {
    case d: DecimalType =>
      d.precision <= 38 && d.scale >= 0 && d.scale <= d.precision
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || SQLConf.get.ansiEnabled) plan
    else plan.transform {
      case agg @ Aggregate(groupings, aggExprs, child, hint) =>
        // one unscaled-long column set per DISTINCT eligible sum input
        // (q_tpch_q1 sums l_quantity twice: one cast, two sums)
        val unscaled = mutable.LinkedHashMap.empty[Expression, Seq[Alias]]
        val newAggExprs = aggExprs.map(_.transform {
          case ae @ AggregateExpression(Sum(c, ctx), _, false, _, _)
              if ctx.evalMode == EvalMode.LEGACY && eligible(c) &&
                c.deterministic =>
            val d = c.dataType.asInstanceOf[DecimalType]
            if (d.precision <= 18) {
              // long-backed: one projected word, sign-extended in-agg
              val Seq(a) = unscaled.getOrElseUpdate(c.canonicalized,
                Seq(Alias(UnscaledValue(c), "unscaled")()))
              ae.copy(aggregateFunction =
                DecimalSum128(a.toAttribute, d.precision, d.scale))
            } else {
              // wide: three projected 64-bit words (the BigDecimal
              // extraction is paid once per row in the Project; the
              // cast subtree is shared across words by projection CSE)
              val ws = unscaled.getOrElseUpdate(c.canonicalized,
                Seq(Alias(Unscaled192(c, 2), "u_hi")(),
                  Alias(Unscaled192(c, 1), "u_mid")(),
                  Alias(Unscaled192(c, 0), "u_lo")()))
              ae.copy(aggregateFunction = DecimalSum192(
                ws(0).toAttribute, ws(1).toAttribute, ws(2).toAttribute,
                d.precision, d.scale))
            }
        }.asInstanceOf[NamedExpression])
        if (unscaled.isEmpty) agg
        else Aggregate(groupings, newAggExprs,
          Project(child.output ++ unscaled.values.flatten, child), hint)
    }
}
