package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

/** PrefixSum: the two-pass distributed scan must equal the windowed
  * cumulative sum exactly, across partition counts, with no Window
  * operator (no single-partition stage) in its plan.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("exclusive prefix sum == windowed reference on a seeded frame") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 5000L).map(i => (i, rnd.nextInt(1000).toLong))
    // scrambled input order: the operator must impose the key order itself
    val df = rnd.shuffle(rows).toDF("k", "v").repartition(13)
    val got = PrefixSum.exclusive(df, "k", "v", "off")
      .select("k", "off").as[(Long, Long)].collect().sortBy(_._1)
    val want = rows.toDF("k", "v")
      .withColumn("off",
        coalesce(sum("v").over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("k", "off").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("no Window operator in the plan (the single-partition stage it replaces)") {
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("k", "v")
    val plan = PrefixSum.exclusive(df, "k", "v", "off")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("empty frame and single row behave") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.exclusive(empty, "k", "v", "off").count() == 0L)
    val one = Seq((7L, 42L)).toDF("k", "v")
    val r = PrefixSum.exclusive(one, "k", "v", "off")
      .select("k", "v", "off").as[(Long, Long, Long)].head()
    assert(r == ((7L, 42L, 0L)))
  }
}
