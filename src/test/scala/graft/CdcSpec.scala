package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** Changelog apply: latest-per-key wins, deletes remove, upserts
  * insert-or-replace, untouched and NULL keys keep their base rows,
  * and extra ordering columns never leak into the result.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // base: (k, v); changes: (k, v, op, seq) — seq orders within a key
  private def base(rows: (java.lang.Long, String)*): DataFrame =
    rows.toSeq.toDF("k", "v")
  private def changes(rows: (java.lang.Long, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("k", "v", "op", "seq")

  private def apply(b: DataFrame, c: DataFrame): Seq[(Any, Any)] =
    Cdc.applyChangelog(b, c, Seq("k"), Seq(desc_nulls_last("seq")))
      .collect().toSeq.map(r => (r.get(0), r.get(1))).sortBy(_.toString)

  test("latest change per key wins; untouched keys keep base rows") {
    val out = apply(
      base((1L, "a"), (2L, "b"), (3L, "c")),
      changes((1L, "a1", "U", 1L), (1L, "a2", "U", 2L)))
    assert(out == Seq((1L, "a2"), (2L, "b"), (3L, "c")).map(t => (t._1, t._2)))
  }

  test("delete removes the key; a later upsert resurrects it") {
    val deleted = apply(
      base((1L, "a"), (2L, "b")),
      changes((1L, "x", "D", 5L)))
    assert(deleted == Seq((2L, "b")))
    val resurrected = apply(
      base((1L, "a"), (2L, "b")),
      changes((1L, "x", "D", 5L), (1L, "a9", "U", 6L)))
    assert(resurrected == Seq((1L, "a9"), (2L, "b")))
  }

  test("upsert inserts keys new to the base") {
    val out = apply(
      base((1L, "a")),
      changes((9L, "new", "U", 1L)))
    assert(out == Seq((1L, "a"), (9L, "new")))
  }

  test("NULL base keys are always kept; NULL-key change appends") {
    val out = apply(
      base((null, "nb"), (1L, "a")),
      changes((null, "nc", "U", 1L), (1L, "a2", "U", 1L)))
    // NULL never equi-joins: the base NULL row survives the anti-join
    // AND the compacted NULL-key change row is appended
    assert(out.count(_._2 == "nb") == 1)
    assert(out.count(_._2 == "nc") == 1)
    assert(out.count(_._2 == "a2") == 1)
    assert(out.size == 3)
  }

  test("empty changelog is the identity") {
    val out = apply(base((1L, "a"), (2L, "b")),
      changes().limit(0))
    assert(out == Seq((1L, "a"), (2L, "b")))
  }

  test("scd2 intervals chain per key: contiguous, one current row") {
    val ch = changes((1L, "v1", "U", 1L), (1L, "v2", "U", 2L),
      (1L, "v3", "U", 3L), (2L, "w1", "U", 5L))
    val h = Cdc.scd2(ch, Seq("k"), Seq(asc_nulls_first("seq")), "seq")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[Long]("valid_from"), Option(r.getAs[java.lang.Long]("valid_to")),
        r.getAs[Boolean]("is_current")))
      .sortBy(t => (t._1, t._3))
    assert(h.toSeq == Seq(
      (1L, "v1", 1L, Some(2L), false),
      (1L, "v2", 2L, Some(3L), false),
      (1L, "v3", 3L, None, true),
      (2L, "w1", 5L, None, true)))
    // exactly one current row per key, intervals contiguous
    assert(h.groupBy(_._1).forall(_._2.count(_._5) == 1))
  }

  test("ordering columns and op do not leak into the result schema") {
    val res = Cdc.applyChangelog(base((1L, "a")),
      changes((1L, "a2", "U", 1L)), Seq("k"), Seq(desc_nulls_last("seq")))
    assert(res.columns.toSeq == Seq("k", "v"))
  }
}
