package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One salt-group's Misra–Gries summary, as stored in streaming state and
  * emitted every trigger. `ver` increments per update so a sink's latest
  * row per group is identifiable; (keys, counts) are parallel arrays
  * (encoder-friendly), at most k entries.
  */
case class MGPartial(group: Int, ver: Long, n: Long,
    keys: Array[String], counts: Array[Long])

/** One salt-group's KMV sketch: the group's k smallest distinct key
  * hashes, ascending. Emitted each trigger with a version counter.
  */
case class KmvPartial(group: Int, ver: Long, hashes: Array[String])

/** Streaming Misra–Gries heavy-hitter sketch — the standing-pipeline form
  * of [[graft.operators.Sketches.heavyHitters]]'s first pass. Keys are
  * salted into `groups` state partitions; each partition's state is ONE
  * k-entry MG summary folded over everything it has seen (bounded state:
  * groups × k entries, independent of stream length). Every trigger each
  * updated group emits its current summary; the latest emission per group,
  * merged with [[merge]], is exactly the bounded sketch the batch pass
  * ships to the driver — same undercount bound Σnᵢ/k, so the same
  * candidate-then-exact-recount finish applies (the recount is what makes
  * the final answer exact; MG state content is arrival-order-dependent,
  * its GUARANTEE is not).
  *
  * 100 TB posture: this is the canonical "what is trending" stream shape —
  * state never grows with the data, the shuffle key is the salt (uniform
  * by construction, no hot keys), and the expensive exact recount runs
  * only on demand over the bounded candidate set.
  */
object SketchStreams {

  /** MG fold of `it` into the (keys→counts, n) accumulator, size bound k. */
  private def fold(acc: mutable.HashMap[String, Long], it: Iterator[String],
      k: Int): Long = {
    var seen = 0L
    it.foreach { key =>
      seen += 1
      val cur = acc.getOrElse(key, 0L)
      if (cur > 0L) acc.update(key, cur + 1L)
      else if (acc.size < k) acc.update(key, 1L)
      else {
        val dead = mutable.ArrayBuffer.empty[String]
        acc.keysIterator.foreach { other =>
          val left = acc(other) - 1L
          if (left <= 0L) dead += other else acc.update(other, left)
        }
        dead.foreach(acc.remove)
      }
    }
    seen
  }

  /** `keys` (a streaming Dataset of non-null key strings) → per-group MG
    * summaries, Update-mode. Deterministic salt: murmur3 of the key mod
    * `groups`, so a key always lands in the same group and the merged
    * undercount bound holds.
    */
  def mgStream(keys: Dataset[String], k: Int, groups: Int): Dataset[MGPartial] = {
    require(k >= 1 && groups >= 1)
    import keys.sparkSession.implicits._
    keys
      .groupByKey(key => (scala.util.hashing.MurmurHash3.stringHash(key) & Int.MaxValue) % groups)
      .flatMapGroupsWithState[MGPartial, MGPartial](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: Int, it: Iterator[String], state: GroupState[MGPartial]) =>
          val prev = state.getOption
          val acc = mutable.HashMap.empty[String, Long]
          prev.foreach(p => p.keys.zip(p.counts).foreach { case (s, c) => acc.update(s, c) })
          val seen = fold(acc, it, k)
          val next = MGPartial(group,
            ver = prev.map(_.ver + 1L).getOrElse(1L),
            n = prev.map(_.n).getOrElse(0L) + seen,
            keys = acc.keys.toArray.sorted,
            counts = acc.keys.toArray.sorted.map(acc))
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Streaming KMV distinct-count sketch — the standing form of the
    * `sk3_kmv_distinct` batch query. Unlike MG, KMV is a pure function of
    * the key SET: bottom-k of a union is the bottom-k of per-part
    * bottom-ks in any grouping and any order. So the streamed sketch is
    * not merely equivalent-in-guarantee to the batch sketch — merged, it
    * is bit-for-bit THE SAME sketch, however the stream was
    * micro-batched (SketchStreamsSpec asserts exactly that). State per
    * salt group is k hashes, forever.
    */
  def kmvStream(keys: Dataset[String], k: Int, groups: Int): Dataset[KmvPartial] = {
    require(k >= 1 && groups >= 1)
    import keys.sparkSession.implicits._
    keys
      .groupByKey(key => (scala.util.hashing.MurmurHash3.stringHash(key) & Int.MaxValue) % groups)
      .flatMapGroupsWithState[KmvPartial, KmvPartial](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: Int, it: Iterator[String], state: GroupState[KmvPartial]) =>
          val prev = state.getOption
          val hs = mutable.TreeSet.empty[String]
          prev.foreach(_.hashes.foreach(hs.add))
          it.foreach { key =>
            hs.add(md5Hex("kmv:" + key))
            if (hs.size > k) hs.remove(hs.last)
          }
          val next = KmvPartial(group,
            ver = prev.map(_.ver + 1L).getOrElse(1L),
            hashes = hs.toArray)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Bottom-k of the union of per-group KMV partials: the global sketch,
    * ascending. Identical to the batch bottom-k of all distinct hashes.
    */
  def kmvMerge(partials: Seq[KmvPartial], k: Int): Array[String] = {
    val hs = mutable.TreeSet.empty[String]
    partials.foreach(_.hashes.foreach(hs.add))
    hs.take(k).toArray
  }

  /** Lowercase-hex md5, matching Spark's and DuckDB's `md5()`. */
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Merge the latest per-group partials into one (n, summary) — the
    * batch aggregator's merge: sum counts, then subtract the (k+1)-th
    * largest value so at most k keys survive. Driver-side over
    * groups × k entries — bounded.
    */
  def merge(partials: Seq[MGPartial], k: Int): (Long, Map[String, Long]) = {
    val acc = mutable.HashMap.empty[String, Long]
    var n = 0L
    partials.foreach { p =>
      n += p.n
      p.keys.zip(p.counts).foreach { case (s, c) =>
        acc.update(s, acc.getOrElse(s, 0L) + c)
      }
    }
    if (acc.size > k) {
      val vals = acc.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      acc.keysIterator.foreach { key =>
        val left = acc(key) - cut
        if (left <= 0L) dead += key else acc.update(key, left)
      }
      dead.foreach(acc.remove)
    }
    (n, acc.toMap)
  }
}
