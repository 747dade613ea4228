package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Tier-(c) custom operator (SURVEY §7.3): planner strategy + physical
  * node for the `row_number() OVER (PARTITION BY p ORDER BY o) <= k`
  * filter pattern — the first/last-N-per-group shape (W2/W3, q10/q11).
  *
  * Spark's WindowExec sorts EVERY group completely, then the filter
  * throws away all but k rows. [[TopKPerKeyExec]] instead keeps a
  * bounded, insertion-sorted buffer of k rows per key: O(n log k)
  * comparisons, memory O(keys × k) instead of a full per-partition
  * sort buffer — the same trade TakeOrderedAndProject makes for global
  * top-k, applied per key. At 100 TB, groups are often wildly larger
  * than k (every user's full click history for a keep-first-row query);
  * not materializing/sorting the other rows is the win.
  *
  * Installed by [[graft.functions.GraftExtensions]] via
  * `injectPlannerStrategy`; fires only on the exact safe shape (single
  * row_number window expression, default ROWS frame, `rn <= k` /
  * `rn = 1` / `rn < k` predicate with small literal k) and otherwise
  * falls through to Spark's planning. `TopKPerKeySpec` proves result
  * equality against WindowExec on the library's own queries.
  */
case class TopKPerKeyExec(
    partitionExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr

  // rn is born here, not read from the child
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val partExprs = partitionExprs
    val order = sortOrder
    val childOutput = child.output
    val limit = k
    val out = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ordering = new LazilyGeneratedOrdering(order, childOutput)
      // per key: insertion-sorted buffer of at most `limit` row copies
      val buffers =
        mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val buf = buffers.getOrElseUpdate(key.copy(),
          new mutable.ArrayBuffer[InternalRow](limit + 1))
        // binary search for the insertion point (stable: equal sorts
        // keep arrival order, matching row_number's non-determinism
        // contract — ranks among ties are arbitrary but consistent)
        if (buf.length < limit || ordering.compare(row, buf.last) < 0) {
          var lo = 0; var hi = buf.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ordering.compare(row, buf(mid)) < 0) hi = mid else lo = mid + 1
          }
          buf.insert(lo, row.copy())
          if (buf.length > limit) buf.remove(buf.length - 1)
        }
      }
      val proj = UnsafeProjection.create(out, childOutput :+ rnAttr)
      val rnRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      buffers.iterator.flatMap { case (_, buf) =>
        buf.iterator.zipWithIndex.map { case (row, i) =>
          rnRow.update(0, i + 1)
          proj(joined(row, rnRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Matches Filter(rn-pred, Window(row_number alias)) and plans
  * [[TopKPerKeyExec]]. */
object TopKPerKeyStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {

  private val MaxK = 128

  private def boundOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, _))
          if a.semanticEquals(rn) => Some(v)
      case LessThan(a: Attribute, Literal(v: Int, _))
          if a.semanticEquals(rn) => Some(v - 1)
      case EqualTo(a: Attribute, Literal(1, _))
          if a.semanticEquals(rn) => Some(1)
      case EqualTo(Literal(1, _), a: Attribute)
          if a.semanticEquals(rn) => Some(1)
      case GreaterThanOrEqual(Literal(v: Int, _), a: Attribute)
          if a.semanticEquals(rn) => Some(v)
      case GreaterThan(Literal(v: Int, _), a: Attribute)
          if a.semanticEquals(rn) => Some(v - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case logical.Filter(cond,
        logical.Window(Seq(alias @ Alias(
          WindowExpression(_: RowNumber, WindowSpecDefinition(ps, os,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          _)), _, _, wchild, _)) =>
      boundOf(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 && k <= MaxK =>
          // the optimizer's InferWindowGroupLimit may already have
          // wrapped the child in a (sort-requiring) WindowGroupLimit
          // prune; our heap makes both it and its sorts unnecessary
          val realChild = wchild match {
            case logical.WindowGroupLimit(_, _, _, _, gchild) => gchild
            case other => other
          }
          TopKPerKeyExec(ps, os, k, alias.toAttribute,
            planLater(realChild)) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}
