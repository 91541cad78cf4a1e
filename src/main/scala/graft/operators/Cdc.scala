package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changelog apply — the MERGE/upsert of an incremental ingest:
  * fold a stream of keyed change records (inserts, updates, deletes)
  * into a base snapshot, latest change per key wins.
  *
  * Semantics (the standard changelog-compaction contract):
  *   - per key, order the changes by the caller's `orderBy` (latest
  *     FIRST — it must totally order each key's changes or "latest" is
  *     not well-defined) and keep row 1;
  *   - a surviving delete op removes the key from the result;
  *   - any other surviving op replaces the base row (upsert: keys new
  *     to the base are inserted);
  *   - keys the changelog never mentions keep their base row;
  *   - NULL keys never equi-join: NULL-key base rows are always kept,
  *     and a NULL-key non-delete change row is appended, not matched.
  *
  * Scale shape: the changelog (typically ≪ base) is compacted with ONE
  * shuffle on the key (window row_number), its distinct keys probe the
  * base through a stats-gated broadcast anti-join ([[Broadcasts]] —
  * measured size, shuffle fallback past the gate), and the union is
  * shuffle-free. The base never shuffles at any scale — the property
  * that matters when base is 100 TB and a day's changes are gigabytes.
  */
object Cdc {

  /** Apply `changes` to `base`. `changes` must carry every base column
    * plus `opCol` (and any extra ordering columns — the result projects
    * back to exactly base's columns). `orderBy` sorts latest-first
    * within a key.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, keys: Seq[String],
      orderBy: Seq[Column], opCol: String = "op",
      deleteOp: String = "D"): DataFrame = {
    require(keys.nonEmpty, "applyChangelog needs key columns")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // distinct by construction (one row per key); measured-size
    // broadcast into the base-side anti-join, base never shuffles
    val changedKeys = Broadcasts.gated(latest.select(keys.map(col): _*))
    base.join(changedKeys, keys, "left_anti")
      .unionByName(latest.filter(col(opCol) =!= lit(deleteOp))
        .select(base.columns.map(col): _*))
  }

  /** SCD type-2 history build: one row per change with its validity
    * interval — `valid_from` = the change's own timestamp, `valid_to` =
    * the NEXT change's timestamp for the same key (NULL while current),
    * half-open [from, to). `orderBy` sorts oldest-first and must
    * totally order each key's changes. One shuffle on the key (the
    * window's), nothing else — at 100 TB the history of a key lives in
    * one partition and the build is a single pass.
    */
  def scd2(changes: DataFrame, keys: Seq[String], orderBy: Seq[Column],
      tsCol: String, validFrom: String = "valid_from",
      validTo: String = "valid_to",
      currentCol: String = "is_current"): DataFrame = {
    require(keys.nonEmpty, "scd2 needs key columns")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    changes.withColumn(validFrom, col(tsCol))
      .withColumn(validTo, lead(col(tsCol), 1).over(w))
      .withColumn(currentCol, col(validTo).isNull)
  }
}
