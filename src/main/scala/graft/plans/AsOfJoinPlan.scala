package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class Catalyst operator — the decision-ladder
  * (c) path (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`) for
  * semantics Spark lacks natively. Complements the compositional
  * union-and-carry formulation in `graft.ops.AsOfJoin` (same contract,
  * verified equal): this one is a co-partitioned in-partition MERGE —
  * each side shuffles once on its key, sorts by (key, ts), and a
  * single forward pass per partition carries the latest right row with
  * `rightTs <= leftTs`. No pair explosion, no window machinery;
  * planner-visible distribution/ordering requirements mean
  * EnsureRequirements inserts exactly one Exchange + Sort per side and
  * can reuse an existing layout (bucketed/pre-partitioned input joins
  * with NO shuffle at all — the 100 TB path).
  *
  * Semantics match DuckDB `ASOF JOIN` (left outer flavor): per left
  * row, the right row with the same key and the greatest ts <= left
  * ts; right side should be unique per (key, ts) (`AsOfJoin.dedupRight`).
  */
final case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                              leftKey: Attribute, leftTs: Attribute,
                              rightKey: Attribute, rightTs: Attribute)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: push left-side-only predicates through
  * [[AsOfJoinPlan]]. Catalyst's PushPredicateThroughJoin knows nothing
  * about custom nodes, so without this a `WHERE` above the as-of join
  * blocks parquet filter pushdown entirely. Left-only conjuncts are
  * safe to push (each output row is one left row, possibly enriched);
  * predicates touching right (carried) columns must stay above —
  * pushing them into the right child would change WHICH right row is
  * carried, not just filter output.
  */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (pushable, kept) = conjuncts.partition { c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet)
      }
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(
          org.apache.spark.sql.catalyst.expressions.And), j.left))
        if (kept.isEmpty) pushed
        else Filter(kept.reduce(
          org.apache.spark.sql.catalyst.expressions.And), pushed)
      }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lts, rk, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                              leftKey: Attribute, leftTs: Attribute,
                              rightKey: Attribute, rightTs: Attribute)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one shuffle per side on the join key; co-partitioned by
  // EnsureRequirements (and elided entirely when the input already has
  // a compatible hash layout)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey: Expression, left.output)
    val lts = BindReferences.bindReference(leftTs: Expression, left.output)
    val rk = BindReferences.bindReference(rightKey: Expression, right.output)
    val rts = BindReferences.bindReference(rightTs: Expression, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val nRightCols = right.output.length
    val outTypes = output.map(_.dataType).toArray

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight: InternalRow = new GenericInternalRow(nRightCols)
      val resultProj = UnsafeProjection.create(outTypes)
      var carried: InternalRow = null
      var carriedKey: Any = null
      var rCurr: InternalRow = null
      def advanceRight(): Unit =
        rCurr = if (rIter.hasNext) rIter.next() else null
      advanceRight()

      lIter.map { lRow =>
        val lKeyV = lk.eval(lRow)
        val lTsV = lts.eval(lRow)
        if (lKeyV == null) {
          // null keys never match (ASOF equality-join semantics)
          resultProj(joiner(lRow, nullRight))
        } else {
          if (carried != null && keyOrd.compare(carriedKey, lKeyV) != 0) carried = null
          var scanning = true
          while (scanning && rCurr != null) {
            val rKeyV = rk.eval(rCurr)
            if (rKeyV == null) advanceRight() // nulls sort first; skip
            else {
              val c = keyOrd.compare(rKeyV, lKeyV)
              if (c < 0) advanceRight()
              else if (c == 0) {
                val rTsV = rts.eval(rCurr)
                if (rTsV != null && lTsV != null && tsOrd.compare(rTsV, lTsV) <= 0) {
                  carried = rCurr.copy()
                  carriedKey = rk.eval(carried)
                  advanceRight()
                } else if (rTsV == null) advanceRight() // unusable right row
                else scanning = false
              } else scanning = false
            }
          }
          resultProj(joiner(lRow, if (carried != null) carried else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
