package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Open-addressing long→long hash table, broadcast once per session and
  * probed per row by [[LongMapLookup]] — the executor-side half of
  * [[graft.operators.LookupJoin]].
  *
  * Layout: power-of-2 `keys`/`vals` arrays, linear probing, Long.MinValue
  * as the empty-slot sentinel (a real MinValue key is carried in the
  * `sentinel*` side fields). ~2.3× the key bytes at the 0.7 load factor —
  * a 4.5 M-key dimension is ~100 MB, against the ~same-size-or-larger
  * UnsafeRow hash relation a broadcast join would REBUILD on the driver
  * for every execution.
  */
final class LongLookupTable private (keys: Array[Long], vals: Array[Long],
    mask: Int, hasSentinel: Boolean, sentinelVal: Long) extends Serializable {

  /** Slot of `k`, or −1 when absent. */
  def find(k: Long): Int = {
    if (k == LongLookupTable.Empty) return if (hasSentinel) -2 else -1
    var i = LongLookupTable.mix(k) & mask
    while (true) {
      val s = keys(i)
      if (s == k) return i
      if (s == LongLookupTable.Empty) return -1
      i = (i + 1) & mask
    }
    -1
  }

  /** Payload at a non-negative [[find]] slot (−2 = the sentinel key). */
  def valueAt(i: Int): Long = if (i == -2) sentinelVal else vals(i)

  def size: Int = keys.count(_ != LongLookupTable.Empty) +
    (if (hasSentinel) 1 else 0)
}

object LongLookupTable {
  private[graft] val Empty = Long.MinValue

  private def mix(k: Long): Int = {
    // splitmix64 finalizer — full avalanche so clustered keys spread
    var h = k * -7046029254386353131L
    h ^= (h >>> 32)
    (h & 0x7fffffffL).toInt
  }

  /** Hardest cap any caller may size for: past ~748M keys the
    * power-of-2 capacity would exceed 2^30 and the Int slot arithmetic
    * stops being safe — [[graft.operators.LookupJoin.MaxKeys]] gates two
    * orders of magnitude earlier, but build() is callable directly.
    */
  val MaxN: Int = (1 << 30) / 10 * 7

  /** Build from unique (key, payload) pairs; throws on a duplicate key —
    * the lookup join is defined for UNIQUE-key dimensions only, and a
    * silent first/last-wins would diverge from the join it replaces.
    */
  def build(pairs: Iterator[(Long, Long)], n: Int): LongLookupTable = {
    require(n <= MaxN,
      s"lookup table sized for $n keys — past the $MaxN capacity ceiling")
    var cap = 16
    // sizing in Long: n*10 overflows an Int past ~214M keys, which
    // would exit this loop at cap=16 and spin the insert loop forever
    while (cap.toLong * 7 < n.max(1).toLong * 10) cap <<= 1 // lf ≤ 0.7
    val keys = Array.fill(cap)(Empty)
    val vals = new Array[Long](cap)
    val mask = cap - 1
    var hasSentinel = false
    var sentinelVal = 0L
    pairs.foreach { case (k, v) =>
      if (k == Empty) {
        if (hasSentinel) throw new graft.GraftInvalidOperation(
          s"lookup join side has duplicate key $k")
        hasSentinel = true; sentinelVal = v
      } else {
        var i = mix(k) & mask
        while (keys(i) != Empty) {
          if (keys(i) == k) throw new graft.GraftInvalidOperation(
            s"lookup join side has duplicate key $k")
          i = (i + 1) & mask
        }
        keys(i) = k; vals(i) = v
      }
    }
    new LongLookupTable(keys, vals, mask, hasSentinel, sentinelVal)
  }
}

/** `table.value.find(child)`'s payload, or NULL when the key is absent —
  * the probe side of [[graft.operators.LookupJoin]], codegen'd so the
  * whole fact scan + lookup + downstream filter stays one
  * WholeStageCodegen span. The broadcast HANDLE rides the expression
  * (small, serialized with the plan); the table bytes move once per
  * executor through Spark's torrent broadcast, NOT per task.
  */
case class LongMapLookup(child: Expression,
    table: Broadcast[LongLookupTable]) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lookup"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = child.eval(input)
    if (k == null) null
    else {
      val t = table.value
      val i = t.find(k.asInstanceOf[Long])
      if (i == -1) null else t.valueAt(i)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val tblCls = classOf[LongLookupTable].getName
    val ref = ctx.addReferenceObj("graftLookupBc", table, bcCls)
    // hoist the broadcast dereference out of the row loop
    val tbl = ctx.addMutableState(tblCls, "graftLookupTbl",
      v => s"$v = ($tblCls)$ref.value();")
    nullSafeCodeGen(ctx, ev, k => {
      val i = ctx.freshName("slot")
      s"""
         |int $i = $tbl.find($k);
         |if ($i == -1) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tbl.valueAt($i);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): LongMapLookup =
    copy(child = newChild)
}
