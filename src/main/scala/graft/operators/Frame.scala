package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{Kernels, SqlCast}
import graft.GraftInvalidOperation

/** The relational operator surface (SURVEY §2.1, R1–R9) as a thin,
  * immutable wrapper over [[DataFrame]].
  *
  * Design: every method *declares* a logical plan with the DataFrame API
  * and lets Catalyst pick the physical strategy — there is no custom
  * execution here. The reference spends most of its code forcing SQL
  * semantics onto pandas (NULL join keys, NULL group keys, 3VL); Spark SQL
  * implements those natively, so each operator documents the semantic
  * contract and delegates (ref: SURVEY §0 "design insight").
  *
  * Scale notes (100 TB): joins shuffle on their keys and are
  * broadcast/sort-merge/shuffled-hash chosen by Catalyst + AQE; semi/anti
  * dedup the build side natively; `distinct`/set-ops are hash aggregates
  * with map-side partial aggregation. Nothing here collects to the driver.
  */
final class Frame(val df: DataFrame) {

  /** R1 `filter_df` — SQL WHERE with numeric truthiness: NULL, NaN and 0
    * drop the row (ref: slide/utils.py:318-335; tests suite:355-389).
    */
  def filter(cond: Column): Frame = new Frame(df.filter(Kernels.truthyOn(df, cond)))

  /** R1 constant-condition variant (`filter_df(df, False)` ⇒ empty frame,
    * ref: slide/utils.py:330-335).
    */
  def filter(cond: Boolean): Frame = if (cond) this else new Frame(df.limit(0))

  /** R2 `join` — inner/left/right/full/cross/semi/anti with SQL NULL-key
    * semantics (ref: slide/utils.py:882-958; oracle suite:2468-2536):
    * NULL keys never match (native to Spark's equi-join); full outer
    * coalesces the key columns (native to Spark's using-columns join,
    * matching the oracle's `COALESCE(a.a, b.a)` form); semi/anti dedup
    * the right side (native to Spark's left_semi/left_anti physical plans).
    */
  def join(other: Frame, joinType: String, on: Seq[String] = Nil): Frame = {
    val jt = JoinType.parse(joinType)
    if (jt == JoinType.Cross) {
      require(on.isEmpty, "cross join takes no keys")
      new Frame(df.crossJoin(other.df))
    } else {
      if (on.isEmpty) throw new GraftInvalidOperation(s"$joinType join requires keys")
      new Frame(df.join(other.df, on, jt))
    }
  }

  /** Positional column alignment for set ops: the second frame's columns
    * are renamed to the first's by position (ref: slide/utils.py:976-988;
    * proof test suite:2205-2227).
    */
  private def aligned(other: Frame): DataFrame = {
    require(other.df.columns.length == df.columns.length,
      "set op requires same column count")
    other.df.toDF(df.columns.toIndexedSeq: _*)
  }

  /** R3 `union` — UNION ALL, or UNION (distinct) when `unique`
    * (ref: slide/utils.py:828-840; oracle suite:2229-2268).
    */
  def union(other: Frame, unique: Boolean = false): Frame = {
    val u = df.union(aligned(other))
    new Frame(if (unique) u.distinct() else u)
  }

  /** R4 `intersect` — INTERSECT when `unique`; when not unique, keeps df1's
    * duplicate rows that appear in df2 (reference semantics: inner-merge
    * against dedup'd right, ref: slide/utils.py:842-854, suite:2281-2283).
    * NULLs compare equal, as in pandas merge / SQL INTERSECT — hence the
    * null-safe join condition.
    */
  def intersect(other: Frame, unique: Boolean = true): Frame =
    if (unique) new Frame(df.intersect(aligned(other)))
    else new Frame(nullSafeExistenceJoin(aligned(other), JoinType.Semi))

  /** R5 `except_df` — EXCEPT when `unique`; when not unique, keeps all df1
    * duplicates not present in df2 (ref: slide/utils.py:856-880).
    */
  def except(other: Frame, unique: Boolean = true): Frame =
    if (unique) new Frame(df.except(aligned(other)))
    else new Frame(nullSafeExistenceJoin(aligned(other), JoinType.Anti))

  private def nullSafeExistenceJoin(right: DataFrame, jt: String): DataFrame = {
    val r = right.distinct()
    val cond = df.columns.map(c => df(c) <=> r(c)).reduce(_ && _)
    df.join(r, cond, jt)
  }

  /** R6 `drop_duplicates` — SELECT DISTINCT *; NULLs equal each other
    * (ref: slide/utils.py:818-826; suite:2160-2161 — native in Spark).
    */
  def dropDuplicates(): Frame = new Frame(df.distinct())

  /** R7 `sql_groupby_apply` — see [[GroupApply]]. NULL group keys are
    * retained (native in Spark's groupBy, ref: slide_pandas/utils.py:91
    * `dropna=False`).
    */
  def groupApply(cols: Seq[String], outSchema: StructType)(
      func: Iterator[Row] => Iterator[Row]): Frame =
    new Frame(GroupApply(df, cols, outSchema)(func))

  /** R7 fast path: SQL aggregates stay inside Tungsten (partial
    * aggregation, codegen) — always prefer this over [[groupApply]].
    */
  def groupAgg(cols: Seq[String], aggs: (String, Column)*): Frame = {
    val exprs = aggs.map { case (n, c) => c.as(n) }
    new Frame(df.groupBy(cols.map(df(_)): _*).agg(exprs.head, exprs.tail: _*))
  }

  /** R8 `cols_to_df` — projection/construction from expressions
    * (ref: slide/utils.py:602-617).
    */
  def select(cols: (String, Column)*): Frame =
    new Frame(df.select(cols.map { case (n, c) => c.as(n) }: _*))

  /** R9 `empty` (ref: slide/utils.py:619-625). */
  def isEmpty: Boolean = df.isEmpty

  /** rename columns (old → new); missing sources and colliding targets
    * are errors (case-insensitive, matching Spark's default resolution)
    */
  def rename(mapping: (String, String)*): Frame = {
    val m = mapping.toMap
    val existing = df.columns.map(_.toLowerCase)
    m.keys.foreach { from =>
      if (!existing.contains(from.toLowerCase))
        throw new GraftInvalidOperation(s"column $from not in frame")
    }
    // validate the WHOLE mapping at once: final column set = existing
    // minus all sources plus all targets — per-entry checks would
    // false-positive on swaps (a->b, b->a) and chains (a->b, b->c)
    val sources = m.keys.map(_.toLowerCase).toSet
    val finalCols = existing.filterNot(sources) ++ m.values.map(_.toLowerCase)
    finalCols.diff(finalCols.distinct).distinct.foreach { dup =>
      throw new GraftInvalidOperation(s"rename target $dup collides with an existing column")
    }
    // single-pass projection: every column renamed simultaneously.
    // (withColumnsRenamed applies its map entry-by-entry, so a swap
    // would chain k->v->k and emit duplicate names.)
    val byLower = m.map { case (from, to) => from.toLowerCase -> to }
    new Frame(df.select(df.columns.map { c =>
      byLower.get(c.toLowerCase).map(col(c).as(_)).getOrElse(col(c))
    }.toIndexedSeq: _*))
  }

  /** drop columns (ignores absent names, like Spark) */
  def drop(cols: String*): Frame = new Frame(df.drop(cols: _*))

  /** sort + optional limit (gap-fill surface; top-k compiles to
    * TakeOrderedAndProject when followed by [[limit]])
    */
  def orderBy(cols: Column*): Frame = new Frame(df.orderBy(cols: _*))

  def limit(n: Int): Frame = new Frame(df.limit(n))

  /** row-iterable interchange (`as_array_iterable` analog,
    * ref: slide/utils.py:648-691) — streams partitions to the caller
    * without materializing the frame
    */
  def rowIterator: Iterator[Row] =
    scala.jdk.CollectionConverters.IteratorHasAsScala(df.toLocalIterator()).asScala

  /** `as_arrow` (ref: slide/utils.py:627-639) — the frame as a complete
    * Arrow IPC stream; see [[ArrowInterchange.toStream]]
    */
  def toArrowStream: Array[Byte] = ArrowInterchange.toStream(df)

  /** `cast_df` — conform the frame to a target schema, applying the SQL
    * cast matrix per field (ref: slide/utils.py:739-763). Fields missing
    * from the target are dropped; order follows the target.
    */
  def conform(schema: StructType): Frame = {
    val bySrc = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = schema.fields.map { f =>
      val src = bySrc.getOrElse(f.name,
        throw new GraftInvalidOperation(s"column ${f.name} not in frame"))
      SqlCast.to(df(f.name), src, f.dataType).cast(f.dataType).as(f.name)
    }
    new Frame(df.select(cols.toIndexedSeq: _*))
  }
}

object Frame {
  def apply(df: DataFrame): Frame = new Frame(df)
}
