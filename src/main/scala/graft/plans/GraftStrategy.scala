package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Physical planning for graft's custom logical nodes (injected by
  * [[graft.GraftExtensions]] via `injectPlannerStrategy`).
  */
case class GraftStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AssumeClustered(keys, child) =>
      AssumeClusteredExec(keys, planLater(child)) :: Nil
    case _ => Nil
  }
}
