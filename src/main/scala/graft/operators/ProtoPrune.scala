package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prototype-pruning kernel (SSL-prototypes — Sorscher et al. 2022;
  * stage two of D4 — Tirumala et al. 2023), shared by the batch imp7 and
  * dd20 queries and the streaming [[graft.streaming.EmbedMaintenance]]
  * handle: integer micro embeddings, coordinate-sign clusters, additive
  * per-(cluster, dim) centroid sufficient statistics, and the
  * closest-quarter rank prune.
  *
  * Everything is exact integer arithmetic (floor of 1e6 x the
  * float-widened-to-double component), so batch and stream agree
  * bit-for-bit and a DuckDB oracle can replay the batch path.
  *
  * Ref: the reference (slide/utils.py) has no embedding surface; this
  * extends the selection family per the north-star scope.
  */
object ProtoPrune {

  /** Sign-cluster bit width: 16 clusters here; production swaps the
    * cluster expression for an IVF-centroid assignment — every frame
    * below stays (cluster-catalog x dim)-bounded either way.
    */
  val Bits = 4

  def cluster: Column = Similarity.signCluster(col("embedding"), Bits)

  /** Integer micro embedding: FLOAT widened exactly to DOUBLE, scaled,
    * floored — floor, not round, so no half-way tie to disagree on.
    */
  def micro: Column =
    transform(col("embedding"),
      x => floor(x.cast("double") * lit(1000000d)).cast("long"))

  /** (vec_id, cl, j, v) — one row per vector component. */
  def components(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), cluster.as("cl"),
      posexplode(micro).as(Seq("j", "v")))

  /** Additive centroid sufficient statistics `(cl, j, s, n)` —
    * clusters x dims rows (CONSTANT grain), mergeable by plain
    * addition, which is what makes the streaming fold exact.
    */
  def componentState(e: DataFrame): DataFrame =
    e.groupBy("cl", "j")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))

  def mergeState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("cl", "j")
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))

  /** Integer centroids `(cl, j, cj)` from the sufficient statistics. */
  def centroids(state: DataFrame): DataFrame =
    state.select(col("cl"), col("j"), expr("s div n").as("cj"))

  /** Squared L2 of each probe vector to its cluster centroid:
    * `(vec_id, cl, dist2)`. The centroid frame is bounded, so the join
    * broadcasts.
    */
  def distances(e: DataFrame, c: DataFrame): DataFrame =
    e.join(c, Seq("cl", "j"))
      .groupBy("vec_id", "cl")
      .agg(expr("sum((v - cj) * (v - cj))").as("dist2"))

  /** The prune rule: per cluster, rank by (dist2, vec_id) ascending and
    * drop the closest `n div 4` (most prototypical). Output adds
    * `kept` 0/1. Window partitions are cluster-sized.
    */
  def prune(d: DataFrame): DataFrame =
    d.withColumn("rk", row_number().over(Window.partitionBy("cl")
        .orderBy(col("dist2"), col("vec_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("cl")))
      .select(col("vec_id"), col("cl").cast("long").as("cl"), col("dist2"),
        when(col("rk") <= expr("n div 4"), 0L).otherwise(1L).as("kept"))

  /** The whole batch pipeline (imp7's body): centroids from the same
    * frame that is pruned.
    */
  def pruneSelf(emb: DataFrame): DataFrame = {
    val e = components(emb)
    prune(distances(e, centroids(componentState(e))))
  }
}
