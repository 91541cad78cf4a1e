package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Fine-grained dd2 stage decomposition with the kernel fan-out applied
  * (guide §1): time each sub-pipeline so the residual per-execution floor
  * is attributable, plus the pure single-action form (candidates consumed
  * once via broadcast pair-join-text — no checkpoints at all) as the
  * job-count floor.
  *
  *   Test/runMain graft.ProfileDd2Fine [sfDir]
  */
object ProfileDd2Fine {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val cores = spark.sparkContext.defaultParallelism

    def fanOut(df: DataFrame): DataFrame = df.repartition(cores)
    def bands(d: DataFrame): DataFrame = Dedup.minHashBands(d, "doc_id", "text")
    def candsNoCk(d: DataFrame): DataFrame = Dedup.lshCandidates(bands(d))
    def grams(c: Column): Column = Dedup.wordShingles(c, 3)
    def jacc(df: DataFrame, ga: Column, gb: Column): DataFrame = {
      val d2 = df.withColumn("inter", size(array_intersect(ga, gb)))
        .withColumn("na", size(ga)).withColumn("nb", size(gb))
      d2.filter(col("inter") * 5 >= (col("na") + col("nb") - col("inter")) * 4)
        .select("ida", "idb")
    }

    // one-action form: no checkpoints, candidates consumed exactly once
    def oneAction(): DataFrame = {
      val c = candsNoCk(fanOut(docs))
      val ta = docs.select(col("doc_id").as("ida"), col("text").as("_ta"))
      val j1 = ta.join(broadcast(c), Seq("ida"))
      val tb = docs.select(col("doc_id").as("idb"), col("text").as("_tb"))
      val j2 = tb.join(broadcast(j1), Seq("idb"))
        .withColumn("ga", grams(col("_ta")))
        .withColumn("gb", grams(col("_tb")))
      jacc(j2, col("ga"), col("gb"))
    }

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pShipped = pairSet(Dedup.minHashDedup(docs, "doc_id", "text"))
    val pOne = pairSet(oneAction())
    require(pShipped == pOne, s"mismatch: ${pShipped.size} vs ${pOne.size}")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(n: Int)(f: => Unit): Double = Seq.fill(n)(timed(f)).min

    // warmups
    (1 to 2).foreach { _ =>
      Dedup.minHashDedup(fanOut(docs), "doc_id", "text").count()
      oneAction().count()
    }

    val tScan = minOf(5)(docs.write.format("noop").mode("overwrite").save())
    val tRepart = minOf(5)(fanOut(docs).write.format("noop").mode("overwrite").save())
    val tBands = minOf(5)(bands(fanOut(docs)).write.format("noop").mode("overwrite").save())
    val tCandsCount = minOf(5)(candsNoCk(fanOut(docs)).count())
    val tCandsCk = minOf(5)(candsNoCk(fanOut(docs)).localCheckpoint(true))
    val ck = candsNoCk(fanOut(docs)).localCheckpoint(true)
    val tSetsCk = minOf(5) {
      val candIds = ck.select(col("ida").as("id"))
        .union(ck.select(col("idb").as("id")))
      docs.select(col("doc_id").as("id"), col("text"))
        .join(candIds, Seq("id"), "left_semi")
        .select(col("id"), grams(col("text")).as("grams"))
        .localCheckpoint(true)
    }
    val tVerify = minOf(5)(Dedup.verifyJaccard(ck, docs, "doc_id", "text").count())
    val tWholeV2 = minOf(5) {
      Dedup.verifyJaccard(candsNoCk(fanOut(docs)).localCheckpoint(true),
        docs, "doc_id", "text").count()
    }
    val tOne = minOf(5)(oneAction().count())
    val tOneB = minOf(5)(oneAction().count())

    val json =
      f"""{"metric":"dd2_fine","sf":"$sfDir","cores":$cores,""" +
        f""""scan_noop":$tScan%.4f,"repart_noop":$tRepart%.4f,""" +
        f""""bands_fanout_noop":$tBands%.4f,"cands_count":$tCandsCount%.4f,""" +
        f""""cands_ckpt":$tCandsCk%.4f,"sets_ckpt_given_cands":$tSetsCk%.4f,""" +
        f""""verify_given_cands":$tVerify%.4f,"whole_v2":$tWholeV2%.4f,""" +
        f""""one_action":$tOne%.4f,"one_action_again":$tOneB%.4f}"""
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
    spark.stop()
    sys.exit(0)
  }
}
