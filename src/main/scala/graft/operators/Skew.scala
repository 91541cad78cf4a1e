package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for shuffle joins.
  *
  * AQE's skew-join splitting (on in [[graft.GraftSession]]) handles most
  * skew at runtime for sort-merge joins; explicit salting remains the tool
  * when a hot key must be spread *before* the shuffle — e.g. shuffled hash
  * joins, aggregations feeding a join, or deterministic partition layout.
  *
  * Shape: probe rows get a deterministic salt in [0, salt); the build side
  * is replicated `salt` ways (explode over a sequence — build side must be
  * the smaller input). The join key becomes (key, salt), so one hot key
  * spreads over `salt` reducers. Result is exactly the unsalted join.
  */
object Skew {

  /** Salted equi-join (inner/left). The salt is a hash of the probe row's
    * key and payload columns — deterministic, no RNG in the plan.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, on: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val jt = JoinType.parse(joinType)
    require(jt == JoinType.Inner || jt == JoinType.Left,
      s"salted join supports inner/left, got $joinType")
    val probeCols = probe.columns
    val saltC = Cols.fresh("_salt", probeCols ++ build.columns)
    val p = probe.withColumn(saltC,
      pmod(xxhash64(probeCols.map(col): _*), lit(salt)).cast("int"))
    val b = build.withColumn(saltC,
      explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, on :+ saltC, jt).drop(saltC)
  }
}
