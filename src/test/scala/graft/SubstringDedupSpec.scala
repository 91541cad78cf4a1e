package graft

import graft.operators.Dedup

/** duplicatedSubstringStats: hand-computed fixtures for the Lee-style
  * exact duplicated-substring metric (window count, interval union).
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def stats(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long, Long)] =
    Dedup.duplicatedSubstringStats(docs.toDF("doc_id", "text"), "doc_id", "text", l = 50)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("self-repetition, cross-doc runs, and unique docs") {
    val run = (0 until 55).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val uniq1 = (0 until 60).map(i => ('a' + (i * 11 % 26)).toChar).mkString
    val docs = Seq(
      1L -> "x" * 60,                 // every window identical: all dup, fully covered
      2L -> uniq1,                    // no 50-window repeats anywhere
      3L -> ("PAD01" + run),          // shares the 55-run with doc 4
      4L -> (run + "ZQW99"))
    val m = stats(docs)
    // doc 1: 11 windows, all dup (same hash 11x), union covers all 60 chars
    assert(m(1L) == ((60L, 11L, 11L, 60L, 1000L)))
    // doc 2: nothing duplicated
    assert(m(2L) == ((60L, 11L, 0L, 0L, 0L)))
    // docs 3/4: the shared 55-run contributes 6 windows (55-50+1), union 55
    assert(m(3L) == ((60L, 11L, 6L, 55L, 545L)))
    assert(m(4L) == ((60L, 11L, 6L, 55L, 545L)))
  }

  test("docs shorter than the window are excluded") {
    val m = stats(Seq(1L -> "short", 2L -> ("y" * 50)))
    assert(!m.contains(1L))
    // exactly one window, duplicated only if it repeats — it does not
    assert(m(2L) == ((50L, 1L, 0L, 0L, 0L)))
  }

  test("cutDuplicatedSubstrings rebuilds text from the kept gaps") {
    val run = (0 until 55).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val uniq1 = (0 until 60).map(i => ('a' + (i * 11 % 26)).toChar).mkString
    val docs = Seq(
      1L -> "x" * 60,            // fully covered -> empty
      2L -> uniq1,               // untouched
      3L -> ("PAD01" + run),     // shared run cut -> prefix survives
      4L -> (run + "ZQW99"),     // -> suffix survives
      5L -> "short")             // under the window length -> untouched
    val kept = Dedup.cutDuplicatedSubstrings(
      docs.toDF("doc_id", "text"), "doc_id", "text", l = 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(1L) == "")
    assert(kept(2L) == uniq1)
    assert(kept(3L) == "PAD01")
    assert(kept(4L) == "ZQW99")
    assert(kept(5L) == "short")
  }

  test("cut: two separated islands keep the middle gap") {
    // doc 1 repeats doc 2's 50-run at both ends with a unique middle
    val runA = (0 until 50).map(i => ('a' + (i * 3 % 26)).toChar).mkString
    val runB = (0 until 50).map(i => ('a' + (i * 5 % 26)).toChar).mkString
    val docs = Seq(
      1L -> (runA + "MIDDLE" + runB),
      2L -> runA,
      3L -> runB)
    val kept = Dedup.cutDuplicatedSubstrings(
      docs.toDF("doc_id", "text"), "doc_id", "text", l = 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(1L) == "MIDDLE")
    assert(kept(2L) == "")
    assert(kept(3L) == "")
  }
}
