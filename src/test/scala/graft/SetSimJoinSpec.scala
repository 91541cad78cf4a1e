package graft

import org.apache.spark.sql.functions._
import graft.operators.SetSimJoin

/** SetSimJoin (prefix filtering) must be EXACT: identical pair set and
  * scores to brute-force all-pairs Jaccard, on directed cases and seeded
  * random set corpora, with no cartesian in the plan.
  */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = ta.toSet; sb = tb.toSet
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * tDen >= uni * tNum
    } yield (ia, ib, inter * 1000L / uni)).toSet

  private def run(docs: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) = {
    val df = docs.toDF("id", "toks")
    SetSimJoin.jaccardSelfJoin(df, "id", "toks", tNum, tDen)
      .as[(Long, Long, Long)].collect().toSet
  }

  test("directed cases: subsets, disjoint, identical, singletons") {
    val docs = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "d"),       // identical to 1
      3L -> Seq("a", "b", "c"),            // J=3/4 with 1
      4L -> Seq("x", "y", "z"),            // disjoint
      5L -> Seq("a"),                      // tiny
      6L -> Seq("a", "q", "r", "s", "t"))  // J with 1 = 1/8
    for ((tn, td) <- Seq((1, 2), (3, 4), (1, 1), (1, 10)))
      assert(run(docs, tn, td) == brute(docs, tn, td), s"t=$tn/$td")
  }

  test("seeded random corpus == brute force at several thresholds") {
    val rnd = new scala.util.Random(13)
    val universe = (1 to 40).map(i => s"t$i")
    val docs = (1L to 150L).map { i =>
      val sz = 2 + rnd.nextInt(10)
      i -> rnd.shuffle(universe).take(sz)
    }
    for ((tn, td) <- Seq((1, 2), (2, 3), (4, 5))) {
      val got = run(docs, tn, td)
      val want = brute(docs, tn, td)
      assert(got == want, s"t=$tn/$td: got ${got.size}, want ${want.size}")
    }
    assert(brute(docs, 1, 2).nonEmpty)
  }

  test("no cartesian/nested-loop in the physical plan") {
    val docs = (1L to 50L).map(i => i -> Seq(s"t${i % 7}", s"t${i % 11}", s"t${i % 13}"))
    val plan = SetSimJoin.jaccardSelfJoin(docs.toDF("id", "toks"), "id", "toks", 1, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }

  test("vocabulary ranking has no single-partition window stage") {
    // pre-round-9 the dense token index came from row_number() over an
    // unpartitioned Window.orderBy — the whole vocabulary through one
    // task. The two-pass rank (range sort + zipWithIndex offsets) must
    // leave NO window operator anywhere in the plan.
    val docs = (1L to 50L).map(i => i -> Seq(s"t${i % 7}", s"t${i % 11}", s"t${i % 13}"))
    val plan = SetSimJoin.jaccardSelfJoin(docs.toDF("id", "toks"), "id", "toks", 1, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("maxBucket guard drops a degenerate token instead of exploding") {
    // every doc shares prefix token "hot" (freq-asc order puts rare first,
    // so make EVERY token identical -> prefix = the hot token)
    val docs = (1L to 30L).map(i => i -> Seq("hot"))
    val got = SetSimJoin.jaccardSelfJoin(docs.toDF("id", "toks"), "id", "toks",
      1, 2, maxBucket = 10)
    assert(got.count() == 0L)
  }
}
