package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, RangeShuffleSpec, ShuffleSpec, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** A co-location claim and NOTHING more: rows sharing a value of `keys`
  * live in one partition, but partition placement is arbitrary — NOT the
  * result of Spark's hash function.
  *
  * This is the honest physical property of an ingest-clustered layout
  * (range-partitioned files by a natural key: orderkey ranges, time
  * shards). It satisfies `ClusteredDistribution` — aggregates, distinct
  * and window operators over the keys need no exchange — while refusing
  * every co-partitioning contract:
  *
  *  - `satisfies0` mirrors `HashPartitioning`'s subset rule for
  *    `ClusteredDistribution` only; `OrderedDistribution` and friends are
  *    rejected, so no sort elision is possible.
  *  - `createShuffleSpec` returns a [[RangeShuffleSpec]], whose
  *    `isCompatibleWith` is false against every hash spec and whose
  *    `canCreatePartitioning` is false. When this side feeds a join,
  *    `EnsureRequirements` therefore picks the OTHER side's spec and
  *    inserts a real shuffle on THIS side — correct results, never an
  *    elided join exchange on data that is co-located but not
  *    hash-placed. (The earlier design claimed `HashPartitioning` here;
  *    that elides the join shuffle and silently mis-joins.)
  */
case class ClusteredOnlyPartitioning(expressions: Seq[Expression],
    numPartitions: Int) extends Partitioning {
  override def satisfies0(required: Distribution): Boolean = required match {
    case UnspecifiedDistribution => true
    // NEVER claim AllTuples: numPartitions comes from the child's declared
    // partitioning, and a FileSourceScan declares UnknownPartitioning(0) —
    // clamping that to 1 once made this claim vacuously true, so a global
    // aggregate (count, global sum) over the clustered output skipped its
    // singleton exchange and silently returned PARTITION 0's result only
    // (caught at the 100x replica: count() = 1/100 of the truth; spec:
    // "global aggregates over groupByClustered get their exchange").
    case AllTuples => false
    case c @ ClusteredDistribution(requiredClustering, requireAllClusterKeys, _) =>
      if (requireAllClusterKeys) c.areAllClusterKeysMatched(expressions)
      else expressions.forall(x => requiredClustering.exists(_.semanticEquals(x)))
    case _ => false
  }
  override def createShuffleSpec(distribution: ClusteredDistribution): ShuffleSpec =
    RangeShuffleSpec(numPartitions, distribution)
}

/** Declares a VERIFIED physical property to Catalyst: every row of a
  * given key lives in exactly one of the child's partitions.
  *
  * Production fact tables are usually ingest-clustered (range-partitioned
  * files by their natural key — orderkey ranges, time shards), which
  * means a `GROUP BY k` over them moves data that is already co-located.
  * Spark formalizes this for V2 sources as KeyGroupedPartitioning /
  * storage-partitioned joins; for plain parquet directories the planner
  * has no channel to learn it. This node is that channel: a pass-through
  * whose `outputPartitioning` is [[ClusteredOnlyPartitioning]], so
  * `EnsureRequirements` sees `ClusteredDistribution(keys)` satisfied and
  * plans the aggregate WITHOUT its exchange — while joins downstream
  * still shuffle this side (see the partitioning's scaladoc).
  *
  * It must only be asserted after measuring the layout (see
  * [[graft.operators.ClusteredAgg]], which verifies that no key spans two
  * scan partitions and falls back to the standard plan otherwise).
  */
case class AssumeClustered(keys: Seq[Attribute], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): AssumeClustered =
    copy(child = newChild)
}

/** Whole-stage-codegen PASS-THROUGH: the node changes only the declared
  * partitioning, so it must not cost anything at runtime. Without
  * `CodegenSupport` it would sit as an iterator boundary between the
  * scan and the aggregate it exists to serve — splitting one fused
  * stage into two and materializing every row at the seam.
  */
case class AssumeClusteredExec(keys: Seq[Expression], child: SparkPlan)
    extends UnaryExecNode
    with org.apache.spark.sql.execution.CodegenSupport {
  override def output: Seq[Attribute] = child.output
  // child numPartitions passes through UNCLAMPED: 0 = "unknown" is the
  // honest value for a file scan, and must stay 0 so no requiredNumPartitions
  // check can ever match vacuously (see ClusteredOnlyPartitioning.AllTuples)
  override def outputPartitioning: Partitioning =
    ClusteredOnlyPartitioning(keys, child.outputPartitioning.numPartitions)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport].inputRDDs()
  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext): String =
    child.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport]
      .produce(ctx, this)
  // Forward to the parent THROUGH consume(), never parent.doConsume
  // directly: consume() owns the bookkeeping this node must not skip —
  // materializing the child's loop-local input variables and deciding
  // when the parent's consume path is split into a separate Java method.
  // Bypassing it generated split functions that referenced the scan's
  // loop locals out of scope (janino: `Unknown variable
  // "columnartorow_value_1"` / local redefinition), and Spark silently
  // ran the whole span interpreted. Same shape as Spark's own
  // pass-through node (execution/debug's DebugExec.doConsume).
  override def doConsume(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      input: Seq[org.apache.spark.sql.catalyst.expressions.codegen.ExprCode],
      row: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): String =
    consume(ctx, input)
  override protected def withNewChildInternal(newChild: SparkPlan): AssumeClusteredExec =
    copy(child = newChild)
}
