package graft

import graft.operators.Mixing

/** Property coverage for the UniMax closed form: the window-algebra
  * water-filling must equal the obvious sequential greedy allocation
  * (ascending fair-share: a source is fully capped iff its capacity
  * fits the running fair share; everyone after gets the floor water
  * level) on seeded random instances, including ties, zeros, and
  * single-source corpora — and satisfy the budget/cap invariants.
  */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def refAlloc(toks: Seq[(String, Long)], num: Int, den: Int)
      : Map[String, Long] = {
    val budget = toks.map(_._2).sum * num / den
    var rem = budget
    var list = toks.sortBy(t => (t._2, t._1))
    val out = collection.mutable.Map[String, Long]()
    while (list.nonEmpty) {
      val fair = rem / list.size
      val (src, c) = list.head
      if (c <= fair) { out(src) = c; rem -= c; list = list.tail }
      else {
        list.foreach { case (s2, c2) => out(s2) = math.min(c2, fair) }
        list = Nil
      }
    }
    out.toMap
  }

  test("unimaxAlloc == sequential greedy water-filling (seeded random instances)") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 40) {
      val n = 1 + rnd.nextInt(12)
      val toks = (0 until n).map { i =>
        // duplicates and zeros on purpose: ties break on (tok, source)
        val v = rnd.nextInt(4) match {
          case 0 => 0L
          case 1 => 100L // shared capacity: exercises tie-breaking
          case _ => rnd.nextInt(5000).toLong
        }
        (f"s$i%02d", v)
      }
      val got = Mixing.unimaxAlloc(toks.toDF("source", "tok"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val want = refAlloc(toks, 7, 10)
      assert(got === want, s"round=$round toks=$toks")
      val budget = toks.map(_._2).sum * 7 / 10
      assert(got.values.sum <= budget, s"over budget: round=$round")
      toks.foreach { case (s2, c) =>
        assert(got(s2) <= c, s"alloc over capacity: round=$round $s2")
      }
    }
  }
}
