package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Sampling, Skew}

/** As-of join edge cases the oracle query can't reach (its value column
  * is never NULL), plus temp-column collision guards.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("a matched right row with a NULL value carries NULL, not stale") {
    // right@t=2 has v=NULL; left@t=3 must see that NULL, not right@t=1's 10
    val left = Seq((1L, 3L, "a"), (1L, 0L, "b")).toDF("k", "lt", "tag")
    val right = Seq((1L, 1L, Some(10L)), (1L, 2L, None))
      .toDF("k", "rt", "v")
    val out = AsOf.join(left, right, "k", "lt", "rt", "v")
      .collect().map(r => r.getString(2) -> (if (r.isNullAt(3)) null else r.getLong(3))).toMap
    assert(out("a") === null) // latest right row (t=2) has NULL value
    assert(out("b") === null) // no right row yet at t=0
  }

  test("inclusive tie: same-instant right row is visible") {
    val left = Seq((1L, 5L)).toDF("k", "lt")
    val right = Seq((1L, 5L, 42L)).toDF("k", "rt", "v")
    val out = AsOf.join(left, right, "k", "lt", "rt", "v").head()
    assert(out.getLong(2) === 42L)
  }

  test("internal marker names do not shadow user columns") {
    // left already owns _t and _side; the join must still be correct
    val left = Seq((1L, 3L, "x", "y")).toDF("k", "_t", "_side", "_rv")
    val right = Seq((1L, 1L, 7L)).toDF("k", "rt", "v")
    val out = AsOf.join(left, right, "k", "_t", "rt", "v").head()
    assert(out.getLong(4) === 7L)
    assert(out.getString(2) === "x" && out.getString(3) === "y")
  }

  test("stratifiedLimit survives a user _rn column") {
    val df = Seq((1L, 1L, 9L), (1L, 2L, 8L), (2L, 3L, 7L))
      .toDF("g", "id", "_rn")
    val out = Sampling.stratifiedLimit(df, Seq("g"), Seq(col("id")), 1)
    assert(out.columns.toSeq === Seq("g", "id", "_rn"))
    assert(out.count() === 2)
  }

  test("saltedJoin survives a user _salt column") {
    val probe = Seq((1L, "p", 99L)).toDF("k", "tag", "_salt")
    val build = Seq((1L, "b")).toDF("k", "bv")
    val out = Skew.saltedJoin(probe, build, Seq("k"), salt = 4)
    assert(out.count() === 1)
    assert(out.columns.contains("_salt")) // the user's column survives
    assert(out.head().getLong(2) === 99L)
  }
}
