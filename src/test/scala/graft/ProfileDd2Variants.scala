package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** A/B the dd2 verify-stage structure (guide §1: measure before
  * adopting):
  *
  *   v0 — shipped shape: candIds = union+distinct, sets eagerly
  *        localCheckpoint'd (3 eager jobs per execution)
  *   v1 — candIds without the distinct exchange (a left-semi build side
  *        tolerates duplicate keys)
  *   v2 — sets NOT checkpointed: both pair joins broadcast the SAME
  *        canonical sets subplan, so ReuseExchange builds it once
  *        (2 eager jobs per execution)
  *   v3 — v1 + v2
  *
  * Asserts identical verified pair sets across variants before timing.
  *
  *   Test/runMain graft.ProfileDd2Variants [sfDir]
  */
object ProfileDd2Variants {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")

    def cands(): DataFrame =
      Dedup.lshCandidates(Dedup.minHashBands(docs, "doc_id", "text"))
        .localCheckpoint(true)

    def grams(c: Column): Column = Dedup.wordShingles(c, 3)

    def jacc(df: DataFrame): DataFrame = df
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("na", size(col("ga")))
      .withColumn("nb", size(col("gb")))
      .filter(col("inter") * 5 >= (col("na") + col("nb") - col("inter")) * 4)
      .select("ida", "idb")

    // v0: shipped
    def v0(): DataFrame = Dedup.verifyJaccard(cands(), docs, "doc_id", "text")

    def setsFor(candidates: DataFrame, dedupIds: Boolean): DataFrame = {
      val ids0 = candidates.select(col("ida").as("id"))
        .union(candidates.select(col("idb").as("id")))
      val ids = if (dedupIds) ids0.distinct() else ids0
      docs.select(col("doc_id").as("id"), col("text"))
        .join(ids, Seq("id"), "left_semi")
        .select(col("id"), grams(col("text")).as("grams"))
    }

    // v1: no candIds distinct, still checkpointed sets
    def v1(): DataFrame = {
      val c = cands()
      val sets = setsFor(c, dedupIds = false).localCheckpoint(true)
      val withSets = c
        .join(sets.withColumnRenamed("id", "ida").withColumnRenamed("grams", "ga"), "ida")
        .join(sets.withColumnRenamed("id", "idb").withColumnRenamed("grams", "gb"), "idb")
      jacc(withSets)
    }

    // v2: sets lazy, both joins broadcast the same canonical subplan
    def v2(dedupIds: Boolean): DataFrame = {
      val c = cands()
      val sets = setsFor(c, dedupIds)
      val a = c.join(broadcast(sets), c("ida") === sets("id"))
        .withColumnRenamed("grams", "ga").drop("id")
      val b = a.join(broadcast(sets), a("idb") === sets("id"))
        .withColumnRenamed("grams", "gb").drop("id")
      jacc(b)
    }

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val p0 = pairSet(v0()); val p1 = pairSet(v1())
    val p2 = pairSet(v2(true)); val p3 = pairSet(v2(false))
    require(p0 == p1 && p0 == p2 && p0 == p3,
      s"variant mismatch: v0=${p0.size} v1=${p1.size} v2=${p2.size} v3=${p3.size}")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(n: Int)(f: => Unit): Double = Seq.fill(n)(timed(f)).min

    // warmup then measure
    val w0 = minOf(5)(v0().count())
    val w1 = minOf(5)(v1().count())
    val w2 = minOf(5)(v2(true).count())
    val w3 = minOf(5)(v2(false).count())
    val json =
      f"""{"metric":"dd2_variants","sf":"$sfDir","pairs":${p0.size},""" +
        f""""v0_shipped_sec":$w0%.4f,"v1_nodistinct_sec":$w1%.4f,""" +
        f""""v2_bcast_reuse_sec":$w2%.4f,"v3_both_sec":$w3%.4f}"""
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
    spark.stop()
    sys.exit(0)
  }
}
