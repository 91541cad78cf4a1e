package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.sources.Tables

/** Sketch-backed aggregation queries (operators/Sketches.scala): exact
  * heavy hitters via a Misra–Gries candidate pass, plus the exact twin
  * the HLL estimate is spec-gated against (SketchSpec).
  */
object SketchOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def all: Seq[Q] = Seq(

    // SK1 — two-pass exact heavy hitters: parts appearing in at least
    // 0.075% of lineitem rows (threshold = ceil(750·n/1e6), n = row
    // count). Pass 1 is a k-entry Misra–Gries sketch (no key-space
    // shuffle); pass 2 exact-recounts only the sketch's candidates via a
    // broadcast semi-join, so the result is EXACT and the oracle is plain
    // GROUP BY … HAVING with the same ceil arithmetic.
    Q("sk1_heavy_hitters",
      (s, dir) => Sketches.heavyHitters(
          t(s, dir, "lineitem"), "l_partkey", supportPpm = 750L)
        .orderBy("l_partkey"),
      Some("""SELECT l_partkey, COUNT(*) AS freq
             |FROM lineitem GROUP BY 1
             |HAVING COUNT(*) >=
             |  ((SELECT COUNT(*) FROM lineitem) * 750 + 999999) // 1000000
             |ORDER BY l_partkey""".stripMargin)),

    // SK2 — exact per-group distinct counts: the oracle-green twin that
    // SketchSpec gates Sketches.approxDistinct (HLL++) against. Kept
    // exact here because a randomized estimator has no SQL oracle; the
    // estimate's error envelope is asserted in the spec instead (the
    // ss2/ss3 pattern).
    Q("sk2_distinct_exact",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_suppkey"),
      Some("""SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts,
             | COUNT(*) AS n_rows
             |FROM lineitem GROUP BY 1 ORDER BY l_suppkey""".stripMargin)))
}
