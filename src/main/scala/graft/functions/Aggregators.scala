package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregates (SURVEY §2.5: `Aggregator[IN,BUF,OUT]` is the
  * engine's UDAF surface — partial-aggregating, Tungsten-encoded buffers,
  * usable from both `Dataset.select` and `functions.udaf`).
  */
object Aggregators {

  /** exact weighted mean in permille: Σ(v·w)·1000 / Σw — all-integer
    * buffer, so merge order never changes the result (the property every
    * oracle-checked aggregate here maintains)
    */
  class WeightedMeanPermille extends Aggregator[(Long, Long), (Long, Long), Long] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Long, Long)): Long =
      if (b._2 == 0) 0L else b._1 * 1000L / b._2
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** bounded top-k smallest values — a buffer that never exceeds k
    * elements regardless of partition size (the shape a distributed
    * top-k accumulator must have)
    */
  /** bounded top-k by (score DESC, id ASC) — the mergeable accumulator of
    * a distributed kNN join: partial buffers of ≤ k (score, id) pairs
    * combine map-side, so the shuffle carries at most k rows per (input
    * partition × group) instead of the whole candidate set. Merge-order
    * invariant: the comparator is a total order (ties broken by id), so
    * any merge tree yields the same top-k.
    */
  class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private val ord: Ordering[(Double, Long)] =
      Ordering.by(t => (-t._1, t._2))
    override def zero: Seq[(Double, Long)] = Vector.empty
    override def reduce(b: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
      if (b.size == k && ord.lteq(b.last, in)) b
      else (b :+ in).sorted(ord).take(k)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      (a ++ b).sorted(ord).take(k)
    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  class TopKMin(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], in: Long): Seq[Long] =
      (b :+ in).sorted.take(k)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).sorted.take(k)
    override def finish(b: Seq[Long]): Seq[Long] = b
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
