package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Decode a dictionary code produced by [[LongMapLookup]] back to its
  * string through a broadcast pool — the string-payload half of
  * [[graft.operators.LookupJoin]]. The side's string attributes are
  * dictionary-encoded at build (long code in the lookup table, one
  * shared pool array per field), so the hot probe stays scalar-long
  * codegen; this expression is only evaluated where string values are
  * actually attached — after the reducing aggregate / top-k, on
  * rows-not-scale row counts.
  *
  * NULL in (missed key) → NULL out; a valid code is always in range by
  * construction (codes are assigned densely at build from the same rows
  * the table holds).
  */
case class StringPoolLookup(child: Expression,
    pool: Broadcast[Array[UTF8String]]) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pool_decode"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val c = child.eval(input)
    if (c == null) null else pool.value(c.asInstanceOf[Long].toInt)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val utf8Cls = classOf[UTF8String].getName
    val ref = ctx.addReferenceObj("graftPoolBc", pool, bcCls)
    // hoist the broadcast dereference out of the row loop
    val arr = ctx.addMutableState(s"$utf8Cls[]", "graftPool",
      v => s"$v = ($utf8Cls[])$ref.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $arr[(int)$c];")
  }

  override protected def withNewChildInternal(
      newChild: Expression): StringPoolLookup =
    copy(child = newChild)
}
