package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FuzzyJoinRewrite (optimizer rule): `JOIN ON levenshtein(a,b) <= 1`
  * must compile to an equi-join on deletion-neighborhood keys — no
  * nested-loop/cartesian — while returning exactly the rows (and the
  * multiplicities) of the declarative join.
  */
class FuzzyJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  // string form: under AQE the executedPlan is an AdaptiveSparkPlanExec
  // holder whose children a collect() does not traverse
  private def hasNestedLoop(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct")
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private val l = Seq(1L -> "spark", 2L -> "sprk", 3L -> "ab", 4L -> "ba",
    5L -> "", 6L -> "a", 7L -> "query").toDF("lid", "ls")
  private val r = Seq(10L -> "spark", 11L -> "spork", 12L -> "sparks",
    13L -> "ab", 14L -> "ba", 15L -> "b", 16L -> "").toDF("rid", "rs")

  test("rewritten join: no nested loop, results equal brute force") {
    val joined = l.join(r, levenshtein($"ls", $"rs") <= 1)
    assert(!hasNestedLoop(joined), "levenshtein<=1 join was not rewritten:\n" +
      joined.queryExecution.executedPlan)
    val got = joined.select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val want = (for {
      (li, ls) <- Seq(1L -> "spark", 2L -> "sprk", 3L -> "ab", 4L -> "ba",
        5L -> "", 6L -> "a", 7L -> "query")
      (ri, rs) <- Seq(10L -> "spark", 11L -> "spork", 12L -> "sparks",
        13L -> "ab", 14L -> "ba", 15L -> "b", 16L -> "")
      if lev(ls, rs) <= 1
    } yield (li, ri)).sorted
    assert(got == want)
  }

  test("duplicate input rows keep their join multiplicity") {
    // 3 copies x 2 copies of an identical string: the declarative join
    // yields 6 rows; a Distinct-based rewrite would collapse them
    val dl = Seq("aaa", "aaa", "aaa").toDF("ls")
    val dr = Seq("aaa", "aab").toDF("rs")
    val n = dl.join(dr, levenshtein($"ls", $"rs") <= 1).count()
    assert(n == 6L)
  }

  test("extra conjuncts survive as post-join predicates") {
    val joined = l.join(r, levenshtein($"ls", $"rs") <= 1 && $"lid" < $"rid" - 8L)
    assert(!hasNestedLoop(joined))
    val got = joined.select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = (for {
      (li, ls) <- Seq(1L -> "spark", 2L -> "sprk", 3L -> "ab", 4L -> "ba",
        5L -> "", 6L -> "a", 7L -> "query")
      (ri, rs) <- Seq(10L -> "spark", 11L -> "spork", 12L -> "sparks",
        13L -> "ab", 14L -> "ba", 15L -> "b", 16L -> "")
      if lev(ls, rs) <= 1 && li < ri - 8L
    } yield (li, ri)).toSet
    assert(got == want)
  }

  test("threshold 2 and non-inner joins are left alone (and stay correct)") {
    val j2 = l.join(r, levenshtein($"ls", $"rs") <= 2)
    assert(hasNestedLoop(j2), "lev<=2 must NOT be rewritten (blocking only exact for 1)")
    val n2 = j2.count()
    val want2 = (for {
      (_, ls) <- Seq(1L -> "spark", 2L -> "sprk", 3L -> "ab", 4L -> "ba",
        5L -> "", 6L -> "a", 7L -> "query")
      (_, rs) <- Seq(10L -> "spark", 11L -> "spork", 12L -> "sparks",
        13L -> "ab", 14L -> "ba", 15L -> "b", 16L -> "")
      if lev(ls, rs) <= 2
    } yield 1).size
    assert(n2 == want2.toLong)
    val left = l.join(r, levenshtein($"ls", $"rs") <= 1, "left")
    // left outer keeps unmatched left rows; rewrite must not fire
    assert(left.count() >= l.count())
  }

  test("NULL strings never match (3VL), matching the unrewritten join") {
    val nl = Seq((1L, "abc"), (2L, null)).toDF("lid", "ls")
    val nr = Seq((10L, "abd"), (11L, null)).toDF("rid", "rs")
    val got = nl.join(nr, levenshtein($"ls", $"rs") <= 1)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("SQL frontdoor text hits the rewrite too") {
    l.createOrReplaceTempView("fjr_l")
    r.createOrReplaceTempView("fjr_r")
    val df = spark.sql(
      "SELECT lid, rid FROM fjr_l JOIN fjr_r ON levenshtein(ls, rs) <= 1")
    assert(!hasNestedLoop(df), df.queryExecution.executedPlan.toString)
    assert(df.count() > 0)
  }

  test("degenerate key: 400 identical strings complete under the default bound") {
    // the adversarial SQL-frontdoor case the operator form was always
    // guarded against: every row shares one neighborhood bucket. Under
    // the default maxBucket (10000) nothing is dropped — the 160k pairs
    // ARE the true result — and the plan must still be the blocked
    // equi-join, not a nested loop over the inputs.
    val dl = (1L to 400L).map(i => i -> "boilerplate").toDF("lid", "ls")
    val dr = (1L to 400L).map(i => (i + 1000L) -> "boilerplate").toDF("rid", "rs")
    val joined = dl.join(dr, levenshtein($"ls", $"rs") <= 1)
    assert(!hasNestedLoop(joined))
    assert(joined.count() == 400L * 400L)
  }

  test("plan guard: the rewritten plan carries the per-key bucket bound") {
    val joined = l.join(r, levenshtein($"ls", $"rs") <= 1)
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("_fj_cnt_l") && plan.contains("_fj_cnt_r"),
      s"bucket-bound window missing from rewritten plan:\n$plan")
  }

  test("session knob bounds hot buckets in the declarative path") {
    val key = graft.rules.FuzzyJoinRewrite.MaxBucketConf
    val dl = (1L to 60L).map(i => i -> "hothothot").toDF("lid", "ls")
    val dr = (1L to 60L).map(i => (i + 1000L) -> "hothothot").toDF("rid", "rs")
    try {
      spark.conf.set(key, "10")
      // every shared key sits in a >10 bucket → all emissions dropped:
      // completeness traded for survival, exactly like the operator form
      assert(dl.join(dr, levenshtein($"ls", $"rs") <= 1).count() == 0L)
      spark.conf.set(key, "0") // <= 0 disables the seatbelt entirely
      val unbounded = dl.join(dr, levenshtein($"ls", $"rs") <= 1)
      assert(unbounded.count() == 3600L)
      assert(!unbounded.queryExecution.optimizedPlan.toString.contains("_fj_cnt_"))
    } finally spark.conf.unset(key)
  }

  test("seeded random corpus: rewrite == brute force at scale") {
    val rnd = new scala.util.Random(7)
    def word() = (1 to 2 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val ld = (1L to 200L).map(i => i -> word())
    val rd = (1L to 200L).map(i => (i + 1000L) -> word())
    val joined = ld.toDF("lid", "ls").join(rd.toDF("rid", "rs"),
      levenshtein($"ls", $"rs") <= 1)
    assert(!hasNestedLoop(joined))
    val got = joined.select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val want = (for {
      (li, ls) <- ld; (ri, rs) <- rd if lev(ls, rs) <= 1
    } yield (li, ri)).sorted
    assert(got == want, s"got ${got.size}, want ${want.size}")
    assert(want.size > 1000) // dense small-alphabet corpus actually exercises it
  }
}
