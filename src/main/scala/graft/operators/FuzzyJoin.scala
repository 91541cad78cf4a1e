package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate string join at bounded edit distance, without the cross
  * product — the entity-resolution primitive (matching user names, product
  * titles, URLs across catalogs) that a naive `JOIN ON levenshtein(a,b)<=1`
  * turns into an all-pairs scan.
  *
  * Algorithm: deletion-neighborhood blocking (FastSS — Bocek, Hunt &
  * Stiller, "Fast Similarity Search in Large Dictionaries", 2007). For
  * edit distance ≤ 1, index each string under itself plus every
  * single-character deletion. Two strings within Levenshtein distance 1
  * necessarily share a key:
  *
  *   - equal:        identity key;
  *   - substitution: deleting the substituted position from each side
  *                   yields the same string;
  *   - insert/delete: the shorter string IS a deletion of the longer.
  *
  * Sharing a key is necessary but not sufficient ("ab"/"ba" share "a" at
  * distance 2), so candidates are verified with the real, codegen'd
  * `levenshtein` — but only candidates, never the cross product.
  *
  * Scale shape: a string of length L produces L+1 keys, so the exploded
  * key table is (L+1)× the input — linear. One shuffle on the key;
  * per-key buckets are bounded (`maxBucket`) against degenerate keys the
  * same way Dedup.minHashDedup bounds LSH buckets. At 100 TB the verify
  * step touches only colliding pairs; everything stays in whole-stage
  * codegen (explode + hash join + levenshtein are all built-ins).
  */
object FuzzyJoin {

  /** `s` plus all single-character deletions of `s` (the distance-1
    * deletion neighborhood), as an array column. Positions are 1-based
    * for `substring`.
    */
  def deletionNeighborhood(s: Column): Column =
    graft.functions.Kernels.letBind(s) { v =>
      // sequence(1, 0) would count DOWN in Spark; guard the empty string
      when(length(v) === 0, array(v)).otherwise(
        concat(
          array(v),
          transform(sequence(lit(1), length(v)),
            i => concat(substring(v, lit(1), i - 1),
              v.substr(i + 1, length(v))))))
    }

  /** Pairs (leftId, leftStr, rightId, rightStr, dist) from `left` ×
    * `right` with Levenshtein distance ≤ 1 (the blocking is exact for
    * that radius). Each matching (left row, right row) pair is emitted
    * exactly once — candidates sharing several neighborhood keys are
    * deduped by the min-shared-key predicate (no Distinct shuffle; same
    * trick as rules.FuzzyJoinRewrite / the range join's
    * first-shared-bin), so duplicate input rows keep their
    * multiplicity.
    */
  def join(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxBucket: Int = 10000): DataFrame = {
    val Seq(key, lks, rks) = Cols.fresh(Seq("_fjkey", "_fjlks", "_fjrks"),
      left.columns ++ right.columns)

    def keyed(df: DataFrame, id: String, str: String, keys: String): DataFrame =
      df.select(col(id), col(str),
          array_distinct(deletionNeighborhood(col(str))).as(keys))
        .select(col(id), col(str), col(keys), explode(col(keys)).as(key))

    val l = keyed(left, leftId, leftStr, lks)
    val r = keyed(right, rightId, rightStr, rks)

    // Degenerate-key guard: a key shared by >maxBucket rows on either side
    // (think empty string, or a boilerplate token) would quadratically
    // blow up that bucket; such keys are dropped from BOTH sides. With
    // maxDist=1 and realistic dictionaries buckets are tiny; the guard is
    // the 100 TB seatbelt, mirrored from Dedup's LSH bucket bound. The
    // dedup predicate below keys on the minimal SURVIVING shared key (the
    // dropped-key set rides along as a broadcast 1-row array), so a pair
    // whose minimal key was dropped is still emitted — exactly once — on
    // its smallest surviving key. Only pairs whose EVERY shared key is hot
    // are lost; that residue is observable via [[droppedKeys]].
    val hot = hotKeys(l, r, key, maxBucket)
    def bounded(df: DataFrame): DataFrame = df.join(hot, Seq(key), "left_anti")
    val dropped = Cols.fresh("_fjdropped",
      left.columns ++ right.columns ++ Seq(key, lks, rks))
    val droppedRow = hot.agg(collect_set(col(key)).as(dropped))

    bounded(l).join(bounded(r), key)
      .filter(levenshtein(col(leftStr), col(rightStr)) <= 1)
      .crossJoin(broadcast(droppedRow))
      // one emission per pair: this key must be the minimal surviving
      // shared key
      .filter(col(key) === array_min(
        array_except(array_intersect(col(lks), col(rks)), col(dropped))))
      .select(col(leftId), col(leftStr), col(rightId), col(rightStr),
        levenshtein(col(leftStr), col(rightStr)).as("dist"))
  }

  /** Neighborhood keys whose bucket exceeds `maxBucket` on either side —
    * the keys [[join]] drops. Keys here are few by construction (each
    * represents >maxBucket rows), so the frame is tiny; run it when the
    * guard's completeness trade-off needs auditing: a pair is lost iff
    * ALL its shared keys appear here.
    */
  def droppedKeys(
      left: DataFrame, leftStr: String,
      right: DataFrame, rightStr: String,
      maxBucket: Int = 10000): DataFrame = {
    val Seq(key, ks) = Cols.fresh(Seq("_fjkey", "_fjks"),
      left.columns ++ right.columns)
    def keyed(df: DataFrame, str: String): DataFrame =
      df.select(array_distinct(deletionNeighborhood(col(str))).as(ks))
        .select(explode(col(ks)).as(key))
    hotKeys(keyed(left, leftStr), keyed(right, rightStr), key, maxBucket)
  }

  /** Union of both sides' over-`maxBucket` neighborhood keys. */
  private def hotKeys(l: DataFrame, r: DataFrame, key: String,
      maxBucket: Int): DataFrame = {
    val cnt = Cols.fresh("_fjcnt", Seq(key))
    def big(df: DataFrame): DataFrame =
      df.groupBy(key).agg(count(lit(1)).as(cnt))
        .filter(col(cnt) > maxBucket).select(key)
    big(l).union(big(r)).distinct()
  }
}
