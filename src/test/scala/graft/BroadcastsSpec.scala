package graft

import org.apache.spark.sql.functions._
import graft.operators.Broadcasts

/** The broadcast decision cache must be bounded: the r6 verdict found it
  * pinned a MEMORY_AND_DISK copy per distinct gated plan for process
  * lifetime (plus strong SparkSession/plan refs) — fine for an 8-query
  * bench loop, unbounded storage growth for a long-lived session.
  */
class BroadcastsSpec extends SparkSpec {

  test("cache is bounded; eviction and reset unpersist storage") {
    Broadcasts.reset()
    val base = spark.sparkContext.getPersistentRDDs.size
    // more distinct plans than the LRU holds (64): storage must plateau,
    // not grow monotonically with every new gated plan
    (1 to 80).foreach { i =>
      val df = spark.range(0, 1000)
        .select((col("id") + lit(i * 10000)).as("k"))
      Broadcasts.gated(df).count()
    }
    assert(Broadcasts.cachedCount <= 64, s"LRU overgrew: ${Broadcasts.cachedCount}")
    val held = spark.sparkContext.getPersistentRDDs.size - base
    assert(held <= 64, s"evicted entries left $held persisted RDDs pinned")
    Broadcasts.reset()
    assert(Broadcasts.cachedCount == 0)
    assert(spark.sparkContext.getPersistentRDDs.size <= base,
      "reset() left persisted storage behind")
  }

  test("same plan under a different gate is a distinct decision") {
    // r6 advice: the key omitted maxBytes, so the same plan gated at
    // 1 byte and at the default silently aliased to whichever ran first
    Broadcasts.reset()
    def side = spark.range(0, 50000)
      .select(col("id").as("k"), col("id").cast("string").as("s"))
    val strict = Broadcasts.gated(side, maxBytes = 1L)
    val default = Broadcasts.gated(side)
    assert(Broadcasts.cachedCount == 2, "gates aliased to one cache entry")
    assert(!strict.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "a 1-byte gate must refuse the broadcast")
    assert(default.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "a 600 KB side must pass the default gate")
    Broadcasts.reset()
  }
}
