package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, Literal, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan: top-k rows per group (A12 generalized —
  * "the top 3 events per user" style queries).
  *
  * Why a custom operator instead of `row_number().over(...)` + filter:
  * the Window form SORTS EVERY GROUP COMPLETELY (full `Sort` of each
  * partition, spillable, O(n log n) per group) and only then discards
  * all but k rows. This operator keeps a bounded k-element heap per
  * group — O(n log k) comparisons, memory bounded by groups×k rows per
  * partition, no sort node at all. At 100 TB with k=10 and millions of
  * rows per group, the difference is the whole sort.
  *
  * The retention bound `quota` is an EXPRESSION evaluated against each
  * group's rows (must be group-constant — a literal for the classic
  * fixed-k form, or a joined per-group quota column for data-driven
  * caps like temperature-flattened mixture sampling, where each
  * stratum's keep-count is derived from its corpus share).
  *
  * Mechanics (the (c) path from the build brief): a marker
  * [[TopKPerGroup]] logical node, planned by [[TopKPerGroupStrategy]]
  * (registered through `graft.plans.GraftExtensions`) into
  * [[TopKPerGroupExec]], whose `requiredChildDistribution` lets
  * EnsureRequirements insert the one hash shuffle on the group keys.
  */
case class TopKPerGroup(keys: Seq[Expression], order: Seq[SortOrder],
    quota: Expression, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroup = copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(keys, order, quota, child) =>
      // partial→final, exactly like partial aggregation: the map-side
      // heap reduces what the exchange carries from n rows to
      // groups×k rows per input partition (global top-k per group ==
      // top-k of the union of per-partition top-ks — true for the
      // dynamic quota too, since it is group-constant)
      TopKPerGroupExec(keys, order, quota, partial = false,
        TopKPerGroupExec(keys, order, quota, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(keys: Seq[Expression], order: Seq[SortOrder],
    quota: Expression, partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  /** Final pass: one hash exchange on the group keys (NO required
    * ordering — the heap replaces the sort). Partial pass: runs
    * wherever the data already is. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val quotaExpr = quota
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      val boundQuota = BindReferences.bindReference(quotaExpr, childOutput)
      // max-heap on the sort order: the head is the WORST retained row,
      // evicted when a better row arrives and the heap is full
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        // quota is group-constant, so evaluating per row is just a
        // column read; <= 0 drops the group entirely
        val limit = boundQuota.eval(row) match {
          case null => 0
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long =>
            math.min(l.longValue(), Int.MaxValue.toLong).toInt
          case s: java.lang.Short => s.intValue()
          case other => throw new IllegalArgumentException(
            s"quota must evaluate to an integral type, got $other")
        }
        if (limit > 0) {
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](
              limit + 1, rowOrd.reversed())
            heaps.put(key.copy(), heap)
          }
          if (heap.size < limit) {
            heap.add(row.copy())
          } else if (rowOrd.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
          }
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      val it = heaps.values().iterator()
      while (it.hasNext) {
        val heap = it.next()
        val rows = new Array[InternalRow](heap.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // best-first
        out ++= rows
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupExec = copy(child = newChild)
}

object TopKPerGroup {

  /** Library entry: top `k` rows of `df` per `keys` group under
    * `order` (best = first in the order). */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    require(k > 0)
    plan(df, keys, order, Literal(k))
  }

  /** Data-driven variant: the retention bound comes from `quota`, a
    * GROUP-CONSTANT integral column (typically joined onto the rows
    * from a per-group aggregate). Groups whose quota is <= 0 or null
    * are dropped entirely. */
  def quotaPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      quota: Column): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val quotaExpr = org.apache.spark.sql.graft.Bridge.logicalPlan(
        df.select(quota)) match {
      case p: Project => p.projectList.head match {
        case a: Alias => a.child
        case e => e
      }
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    plan(df, keys, order, quotaExpr)
  }

  private def plan(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      quota: Expression): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    // sessions built without spark.sql.extensions (e.g. an embedding
    // application's own session) still get the strategy, idempotently
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKPerGroupStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerGroupStrategy
    val planned = Bridge.logicalPlan(df)
    // resolve the user Columns by borrowing the standard analysis of a
    // Project / Sort over the same (already analyzed, id-stable) child
    val keyExprs = Bridge.logicalPlan(df.select(keys: _*)) match {
      case p: Project => p.projectList.map {
        case a: Alias => a.child
        case e => e
      }
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    val sortOrder = Bridge.logicalPlan(
        df.sortWithinPartitions(order: _*)) match {
      case s: Sort => s.order
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    Bridge.ofRows(df.sparkSession, TopKPerGroup(
      keyExprs, sortOrder, quota, planned))
  }
}
