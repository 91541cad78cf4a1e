package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Declares a VERIFIED physical property to Catalyst: every row of a
  * given key lives in exactly one of the child's partitions.
  *
  * Production fact tables are usually ingest-clustered (range-partitioned
  * files by their natural key — orderkey ranges, time shards), which
  * means a `GROUP BY k` over them moves data that is already co-located.
  * Spark formalizes this for V2 sources as KeyGroupedPartitioning /
  * storage-partitioned joins; for plain parquet directories the planner
  * has no channel to learn it. This node is that channel: a pass-through
  * whose `outputPartitioning` reports `HashPartitioning(keys)`, so
  * `EnsureRequirements` sees `ClusteredDistribution(keys)` satisfied and
  * plans the aggregate WITHOUT its exchange.
  *
  * The claim is a co-location claim, not a hash-placement claim — safe
  * for distribution requirements (aggregates, distinct), NOT for
  * co-partitioned joins against genuinely hash-partitioned sides. It must
  * only be asserted after measuring the layout (see
  * [[graft.operators.ClusteredAgg]], which checks per-partition key-range
  * disjointness first and falls back to the standard plan otherwise).
  */
case class AssumeClustered(keys: Seq[Attribute], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): AssumeClustered =
    copy(child = newChild)
}

case class AssumeClusteredExec(keys: Seq[Expression], child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning =
    HashPartitioning(keys, math.max(child.outputPartitioning.numPartitions, 1))
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override protected def withNewChildInternal(newChild: SparkPlan): AssumeClusteredExec =
    copy(child = newChild)
}
