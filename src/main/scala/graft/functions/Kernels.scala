package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.GraftException

/** The scalar expression kernel surface (SURVEY §2.2, E1–E12).
  *
  * Nearly everything is a thin delegation to Spark's native expressions —
  * Spark SQL already implements three-valued logic, Kleene AND/OR, SQL IN,
  * BETWEEN, COALESCE, CASE WHEN and LIKE with exactly the semantics the
  * reference's DuckDB oracle checks (ref: slide/utils.py:135-600). The two
  * real divergences are handled here:
  *
  *  1. **Numeric truthiness** — the reference treats any non-boolean
  *     condition as `x IS NOT NULL AND x != 0`
  *     (ref: slide/utils.py:353-362,502-505,969-974).
  *  2. **NaN is NULL** — the reference unifies None/NaN/NaT into one SQL
  *     NULL (ref: slide_test/suite.py:399-403); Spark doubles keep NaN
  *     distinct, so kernels that interpret values fold NaN→NULL first.
  *
  * All functions are `Column → Column` (codegen-friendly, no UDFs) so they
  * stay inside whole-stage codegen and remain visible to Catalyst rules
  * (constant folding, LikeSimplification, predicate pushdown).
  */
object Kernels {

  /** SQL truthiness of a condition with a known input type
    * (ref: slide/utils.py:337-367 `is_value(col, True)`):
    * booleans pass through; numerics are `x != 0 AND x IS NOT NULL`
    * (NaN → NULL → not truthy).
    */
  def truthy(c: Column, dt: DataType): Column = dt match {
    case BooleanType => c.isNotNull && c
    case DoubleType | FloatType => c.isNotNull && !isnan(c) && (c =!= 0)
    case _: NumericType => c.isNotNull && (c =!= 0)
    case NullType => lit(false)
    case other => throw new GraftException(s"cannot evaluate truthiness of $other")
  }

  /** Resolve the data type of an expression against a frame, then apply
    * [[truthy]]. Used by `Frame.filter` for arbitrary conditions.
    */
  def truthyOn(df: DataFrame, c: Column): Column =
    truthy(c, df.select(c).schema.head.dataType)

  /** E6 `IS NULL / IS NOT NULL / IS TRUE / IS NOT TRUE / IS FALSE /
    * IS NOT FALSE` with numeric truthiness (ref: slide/utils.py:337-367).
    * `value` is None (null check), true, or false; `positive` flips IS/IS NOT.
    */
  def isValue(c: Column, dt: DataType, value: Option[Boolean], positive: Boolean): Column =
    value match {
      case None =>
        // NaN is NULL (ref: suite:399-403 `is_value(nan, None) is True`)
        val isNullLike = dt match {
          case DoubleType | FloatType => c.isNull || isnan(c)
          case _ => c.isNull
        }
        if (positive) isNullLike else !isNullLike
      case Some(true) => if (positive) truthy(c, dt) else !truthy(c, dt)
      case Some(false) =>
        val falsy = dt match {
          case BooleanType => c.isNotNull && !c
          case DoubleType | FloatType => c.isNotNull && !isnan(c) && (c === 0)
          case _: NumericType => c.isNotNull && (c === 0)
          case other => throw new GraftException(s"cannot evaluate falsiness of $other")
        }
        if (positive) falsy else !falsy
    }

  /** E7 SQL `IN` over mixed constant/column elements with full 3VL
    * (ref: slide/utils.py:369-414). Spark's native `In` already implements
    * the 3VL table (NULL probe → NULL; miss against a NULL element → NULL),
    * and accepts Column elements.
    */
  def isIn(c: Column, values: Seq[Any], positive: Boolean): Column = {
    val in = c.isin(values: _*)
    if (positive) in else !in
  }

  /** E8 `BETWEEN` — Kleene `>= AND <=` reproduces the reference's
    * one-sided determinism exactly (ref: slide/utils.py:416-468).
    */
  def isBetween(c: Column, lower: Column, upper: Column, positive: Boolean): Column = {
    val b = c >= lower && c <= upper
    if (positive) b else !b
  }

  /** E10 `CASE WHEN` with numeric-truthiness conditions
    * (ref: slide/utils.py:488-529). Each condition's type must be supplied
    * (or pre-wrapped with [[truthy]]).
    */
  def caseWhen(branches: Seq[(Column, Column)], default: Column): Column =
    branches.foldRight(default) { case ((cond, value), acc) => when(cond, value).otherwise(acc) }

  /** E11 SQL LIKE / ILIKE, escape `\` (ref: slide/utils.py:531-600,
    * slide/_string_utils.py:1-98). Spark's LIKE uses the same default
    * escape, and Catalyst's `LikeSimplification` rule performs the same
    * prefix/suffix/contains shortcut specialization the reference
    * hand-codes.
    */
  def like(c: Column, pattern: String, ignoreCase: Boolean, positive: Boolean): Column = {
    val m = if (ignoreCase) c.ilike(pattern) else c.like(pattern)
    if (positive) m else !m
  }

  /** Let-binding for Column expressions: evaluate `e` ONCE per row and
    * reference the result from `f` via a lambda variable. Without this, an
    * expensive subexpression referenced inside a higher-order-function
    * lambda (e.g. `transform(seq, i => slice(words(text), i, n))`) is
    * inlined and re-evaluated per array ELEMENT — Catalyst's subexpression
    * elimination does not reach across lambda scopes (measured 10×+ on
    * shingling: the regex+split ran once per shingle instead of once per
    * document). Implemented as a single-element `transform`, whose lambda
    * parameter is exactly a bound variable.
    */
  def letBind(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)
}
