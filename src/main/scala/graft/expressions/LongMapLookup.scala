package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Open-addressing long→long[arity] hash table, broadcast once per
  * session and probed per row by [[LongMapLookup]] — the executor-side
  * half of [[graft.operators.LookupJoin]].
  *
  * Layout: power-of-2 `keys` array, linear probing, Long.MinValue as
  * the empty-slot sentinel (a real MinValue key is carried in the
  * `sentinel*` side fields); payloads live slot-major in one flat
  * `vals` array of `cap × arity` longs, so a k-attribute dimension is
  * ONE table and one probe resolves every attribute (`valueAt(slot, j)`
  * is a direct offset read — no second hash). ~2.3× the key bytes at
  * the 0.7 load factor plus 8·arity bytes per slot — a 4.5 M-key
  * two-attribute dimension is ~150 MB, against the same-size-or-larger
  * UnsafeRow hash relation a broadcast join would REBUILD on the driver
  * for every execution.
  */
final class LongLookupTable private (keys: Array[Long], vals: Array[Long],
    mask: Int, val arity: Int, hasSentinel: Boolean,
    sentinelVals: Array[Long]) extends Serializable {

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

  /** Payload field `j` at a non-negative [[find]] slot (−2 = the
    * sentinel key).
    */
  def valueAt(i: Int, j: Int): Long =
    if (i == -2) sentinelVals(j) else vals(i * arity + j)

  /** First payload field — the arity-1 fast path callers and generated
    * code from before the arity generalization still use.
    */
  def valueAt(i: Int): Long = valueAt(i, 0)

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
    * Multi-payload tables additionally bound `cap × arity` to the same
    * 2^30 ceiling (the flat vals array and its Int offsets).
    */
  val MaxN: Int = (1 << 30) / 10 * 7

  /** Arity-1 convenience — the original single-payload entry point. */
  def build(pairs: Iterator[(Long, Long)], n: Int): LongLookupTable =
    buildMulti(pairs.map { case (k, v) => (k, Array(v)) }, n, 1)

  /** Build from unique (key, payload fields) pairs; throws on a
    * duplicate key — the lookup join is defined for UNIQUE-key
    * dimensions only, and a silent first/last-wins would diverge from
    * the join it replaces.
    */
  def buildMulti(pairs: Iterator[(Long, Array[Long])], n: Int,
      arity: Int): LongLookupTable = {
    require(arity >= 1, s"lookup table arity $arity")
    require(n <= MaxN,
      s"lookup table sized for $n keys — past the $MaxN capacity ceiling")
    var cap = 16
    // sizing in Long: n*10 overflows an Int past ~214M keys, which
    // would exit this loop at cap=16 and spin the insert loop forever
    while (cap.toLong * 7 < n.max(1).toLong * 10) cap <<= 1 // lf ≤ 0.7
    require(cap.toLong * arity <= (1L << 30),
      s"lookup table capacity $cap × arity $arity exceeds the 2^30 " +
        "flat-payload ceiling — shrink the side or join instead")
    val keys = Array.fill(cap)(Empty)
    val vals = new Array[Long](cap * arity)
    val mask = cap - 1
    var hasSentinel = false
    var sentinelVals: Array[Long] = null
    pairs.foreach { case (k, v) =>
      if (k == Empty) {
        if (hasSentinel) throw new graft.GraftInvalidOperation(
          s"lookup join side has duplicate key $k")
        hasSentinel = true; sentinelVals = v
      } else {
        var i = mix(k) & mask
        while (keys(i) != Empty) {
          if (keys(i) == k) throw new graft.GraftInvalidOperation(
            s"lookup join side has duplicate key $k")
          i = (i + 1) & mask
        }
        keys(i) = k
        System.arraycopy(v, 0, vals, i * arity, arity)
      }
    }
    new LongLookupTable(keys, vals, mask, arity, hasSentinel, sentinelVals)
  }
}

/** Payload field `field` of `table.value.find(child)`, or NULL when the
  * key is absent — the probe side of [[graft.operators.LookupJoin]],
  * codegen'd so the whole fact scan + lookup + downstream filter stays
  * one WholeStageCodegen span. The broadcast HANDLE rides the
  * expression (small, serialized with the plan); the table bytes move
  * once per executor through Spark's torrent broadcast, NOT per task.
  *
  * A k-attribute attachment is k sibling expressions over the SAME
  * broadcast table (one per field): each re-runs the cheap find(), but
  * the second probe of a row hits the cache lines the first just
  * loaded, and keeping the expression scalar-long keeps it inside
  * codegen with zero per-row allocation — a struct-valued expression
  * would box a GenericInternalRow per fact row on the hot path.
  */
case class LongMapLookup(child: Expression,
    table: Broadcast[LongLookupTable], field: Int = 0)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lookup"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = child.eval(input)
    if (k == null) null
    else {
      val t = table.value
      val i = t.find(k.asInstanceOf[Long])
      if (i == -1) null else t.valueAt(i, field)
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
         |  ${ev.value} = $tbl.valueAt($i, $field);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): LongMapLookup =
    copy(child = newChild)
}
