package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.CosineSim

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions (set `spark.sql.extensions=graft.GraftExtensions`,
  * done by [[GraftSession]]). `SELECT graft_cosine(a, b)` then works from
  * SQL as well as the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new GraftInvalidOperation(
          s"graft_cosine(array<float>, array<float>) expects 2 arguments, got ${children.length}")
        CosineSim(children.head, children(1))
      }))
    // Spark's own runtime-filter predicate (what InjectRuntimeFilter
    // plants on shuffle joins), exposed so graft.operators.RuntimeFilters
    // can plant it on the BROADCAST-join fact scans the optimizer's rule
    // never touches. Value side is a raw long key; the build side
    // (DataFrameStatFunctions.bloomFilter) puts raw longs too.
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        if (children.length != 2) throw new GraftInvalidOperation(
          s"graft_might_contain(binary, bigint) expects 2 arguments, got ${children.length}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => graft.rules.CosineFusion)
    ext.injectOptimizerRule(_ => graft.rules.FuzzyJoinRewrite)
    ext.injectPlannerStrategy(s => graft.plans.GraftStrategy(s))
  }
}
