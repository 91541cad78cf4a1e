package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** FuzzyJoin (FastSS deletion-neighborhood blocking) — the blocking must
  * be exact for edit distance <= 1: blocked-join output == brute-force
  * levenshtein cross join, on corpora with substitutions, inserts,
  * deletes, transpositions (distance 2 — must NOT match), and duplicates.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(l: Seq[(Long, String)], r: Seq[(Long, String)]) =
    (for {
      (li, ls) <- l; (ri, rs) <- r
      d = levenshteinDist(ls, rs) if d <= 1
    } yield (li, ls, ri, rs, d.toLong)).toSet

  private def levenshteinDist(a: String, b: String): Int = {
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

  test("blocked fuzzy join == brute force on directed edge cases") {
    val l = Seq(1L -> "spark", 2L -> "sprk", 3L -> "ab", 4L -> "ba",
      5L -> "", 6L -> "a", 7L -> "query", 8L -> "engine")
    val r = Seq(10L -> "spark", 11L -> "spork", 12L -> "sparks",
      13L -> "ab", 14L -> "ba", 15L -> "b", 16L -> "", 17L -> "queries")
    val got = FuzzyJoin.join(
      l.toDF("lid", "ls"), "lid", "ls",
      r.toDF("rid", "rs"), "rid", "rs")
      .as[(Long, String, Long, String, Long)].collect().toSet
    assert(got == brute(l, r))
    // "ab"/"ba" (transposition, distance 2) must be excluded by the verify
    assert(!got.exists(p => p._2 == "ab" && p._4 == "ba"))
  }

  test("blocked fuzzy join == brute force on a seeded random corpus") {
    val rnd = new scala.util.Random(42)
    def word() = (1 to 3 + rnd.nextInt(3)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val l = (1L to 120L).map(i => i -> word())
    val r = (1L to 120L).map(i => (i + 1000L) -> word())
    val got = FuzzyJoin.join(
      l.toDF("lid", "ls"), "lid", "ls",
      r.toDF("rid", "rs"), "rid", "rs")
      .as[(Long, String, Long, String, Long)].collect().toSet
    val want = brute(l, r)
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    assert(want.nonEmpty) // 4-letter alphabet guarantees near-collisions
  }

  test("maxBucket guard drops degenerate hot keys instead of exploding") {
    // 50 copies of the same string on each side: every pair matches at
    // distance 0, 2500 pairs — with maxBucket=10 the bucket is dropped
    val l = (1L to 50L).map(i => i -> "aaaa")
    val r = (1L to 50L).map(i => (i + 100L) -> "aaaa")
    val got = FuzzyJoin.join(
      l.toDF("lid", "ls"), "lid", "ls",
      r.toDF("rid", "rs"), "rid", "rs", maxBucket = 10)
    assert(got.count() == 0L)
  }

  test("pair survives on a surviving key when its minimal shared key is hot") {
    // Left floods the "a" bucket (20x "a" emits keys {a, ""}), so keys
    // "a" and "" are dropped at maxBucket=10. The ("ab","ab") pair's
    // shared keys are {ab, a, b}; its MINIMAL key "a" is hot, but "ab"
    // survives — the drop-aware dedup must emit the pair exactly once on
    // "ab" instead of silently losing it (the pre-round-9 behavior).
    val l = ((1L to 20L).map(i => i -> "a") :+ (21L -> "ab")).toDF("lid", "ls")
    val r = Seq(100L -> "ab").toDF("rid", "rs")
    val got = FuzzyJoin.join(l, "lid", "ls", r, "rid", "rs", maxBucket = 10)
      .as[(Long, String, Long, String, Long)].collect().toSeq
    assert(got == Seq((21L, "ab", 100L, "ab", 0L)))
    // the flooded ("a","ab") distance-1 pairs share ONLY hot keys — the
    // documented residue — and must be observable through droppedKeys
    val dropped = FuzzyJoin.droppedKeys(l, "ls", r, "rs", maxBucket = 10)
      .as[String].collect().toSet
    assert(dropped == Set("a", ""))
  }

  test("droppedKeys is empty when no bucket exceeds the bound") {
    val l = Seq(1L -> "spark", 2L -> "sprk").toDF("lid", "ls")
    val r = Seq(10L -> "spork").toDF("rid", "rs")
    assert(FuzzyJoin.droppedKeys(l, "ls", r, "rs").count() == 0L)
  }
}
