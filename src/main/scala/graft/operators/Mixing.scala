package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-mixing allocation kernels over a (source, tok) token-count
  * frame, shared by the batch queries (cur7/cur9) and the streaming
  * handle ([[graft.streaming.MixMaintenance]]). Everything is window
  * algebra on a SOURCE-cardinality frame — bounded (~10^3 rows at
  * worst), so the single-partition windows are safe and the corpus is
  * only ever touched by the upstream token aggregate.
  */
object Mixing {

  /** UniMax water-filling (Chung et al. 2023): split
    * `budgetNum/budgetDen` of one corpus epoch across sources, capping
    * every source at one epoch of its own data. Closed form over
    * sources sorted by capacity: k* = the longest ascending prefix
    * fully cappable within budget (lhs_i = P_i + (n-i)·c_i <= B), later
    * sources get the integer water level θ = (B - P_k*) div (n - k*).
    * Returns (source, tok, alloc, epochs_pm), ordered by source.
    */
  def unimaxAlloc(tok: DataFrame, budgetNum: Int = 7, budgetDen: Int = 10)
      : DataFrame = {
    val wOrd = Window.partitionBy().orderBy(col("tok"), col("source"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tok
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("p", sum("tok").over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("grand", sum("tok").over(wAll))
      .withColumn("budget", expr(s"CAST(grand * $budgetNum div $budgetDen AS BIGINT)"))
      .withColumn("lhs", expr("p + (n - i) * tok"))
      .withColumn("k", coalesce(
        max(when(col("lhs") <= col("budget"), col("i"))).over(wAll), lit(0L)))
      .withColumn("pk", coalesce(
        max(when(col("lhs") <= col("budget"), col("p"))).over(wAll), lit(0L)))
      .withColumn("alloc",
        expr("CAST(CASE WHEN i <= k OR k >= n THEN tok " +
          "ELSE least(tok, (budget - pk) div (n - k)) END AS BIGINT)"))
      .select(col("source"), col("tok"), col("alloc"),
        expr("CAST(CASE WHEN tok = 0 THEN 0 ELSE alloc * 1000 div tok END AS BIGINT)")
          .as("epochs_pm"))
      .orderBy(asc_nulls_first("source"))
  }
}
