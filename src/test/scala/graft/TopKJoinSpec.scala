package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TopKJoin

/** Top-k pushdown through a join is only sound when the join preserves
  * multiplicity; every way that can fail must demote to the standard
  * plan with identical results.
  */
class TopKJoinSpec extends SparkSpec {
  import spark.implicits._

  // fact: (fk, score); dim: (dk, payload)
  private def fact(rows: Seq[(java.lang.Long, Long)]): DataFrame =
    rows.toDF("fk", "score")
  private def dim(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("dk", "payload")

  private def oracle(f: DataFrame, d: DataFrame, k: Int): Seq[Seq[Any]] =
    d.join(f, d("dk") === f("fk"))
      .orderBy(desc_nulls_last("score"), asc_nulls_first("fk"))
      .limit(k)
      .select("dk", "payload", "fk", "score")
      .collect().toSeq.map(_.toSeq)

  private def pushed(f: DataFrame, d: DataFrame, k: Int): Seq[Seq[Any]] =
    TopKJoin.limitJoin(f, d, "fk", "dk",
        Seq(desc_nulls_last("score"), asc_nulls_first("fk")), k)
      .orderBy(desc_nulls_last("score"), asc_nulls_first("fk"))
      .select("dk", "payload", "fk", "score")
      .collect().toSeq.map(_.toSeq)

  private val cleanDim = (1L to 200L).map(i => (i, s"p$i"))
  private val cleanFact: Seq[(java.lang.Long, Long)] =
    (1L to 200L).map(i => (java.lang.Long.valueOf(i), i * 7 % 101))

  test("key-preserving layout: pushdown fires and matches the plain plan") {
    TopKJoin.reset()
    val f = fact(cleanFact); val d = dim(cleanDim)
    assert(TopKJoin.isKeyPreserving(f, d, "fk", "dk"))
    assert(pushed(f, d, 10) == oracle(f, d, 10))
    // the fast plan must contain no join wider than k rows on the built
    // side: the broadcast input is a limit, visible as a 10-row hint
    val plan = TopKJoin.limitJoin(f, d, "fk", "dk",
      Seq(desc_nulls_last("score"), asc_nulls_first("fk")), 10)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("GlobalLimit") || plan.contains("Limit"),
      s"pushdown did not place the limit below the join:\n$plan")
  }

  test("duplicate dim key (PK violation) demotes to the standard plan") {
    TopKJoin.reset()
    val f = fact(cleanFact)
    val d = dim(cleanDim :+ ((5L, "dup"))) // key 5 twice
    assert(!TopKJoin.isKeyPreserving(f, d, "fk", "dk"))
    assert(pushed(f, d, 10) == oracle(f, d, 10))
  }

  test("orphaned fact key (FK violation) demotes to the standard plan") {
    TopKJoin.reset()
    // fact key 999 has no dim row; a pushed top-10 containing it would
    // return 9 rows where the true answer has 10
    val f = fact(cleanFact :+ ((java.lang.Long.valueOf(999L), 1000L)))
    val d = dim(cleanDim)
    assert(!TopKJoin.isKeyPreserving(f, d, "fk", "dk"))
    assert(pushed(f, d, 10) == oracle(f, d, 10))
  }

  test("NULL fact key demotes to the standard plan") {
    TopKJoin.reset()
    // NULL never equi-joins: the inner join drops the row, so a pushed
    // top-k that kept it would under-fill
    val f = fact(cleanFact :+ ((null: java.lang.Long, 1000L)))
    val d = dim(cleanDim)
    assert(!TopKJoin.isKeyPreserving(f, d, "fk", "dk"))
    assert(pushed(f, d, 10) == oracle(f, d, 10))
  }

  test("verdicts are cached per layout, not recomputed per call") {
    TopKJoin.reset()
    val f = fact(cleanFact); val d = dim(cleanDim)
    assert(TopKJoin.isKeyPreserving(f, d, "fk", "dk"))
    // second call must hit the cache: measure by absence of Spark jobs
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(TopKJoin.isKeyPreserving(f, d, "fk", "dk"))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "cached verdict still ran Spark jobs")
  }
}
