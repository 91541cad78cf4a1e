package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Round-18 dd2 variant matrix (guide §1: measure before adopting).
  *
  * The sf-scale parquet inputs are ONE row group per table, so every scan
  * is a single task: dd2's signature kernel (docs × shingles × 64 hashes)
  * serializes on one core no matter the session's core count. Variants:
  *
  *   v1 — shipped shape (r17): serial kernel, 3 eager jobs
  *   v2 — fan the docs scan out to the core count before the kernel
  *        (one tiny round-robin exchange; no-op gate at real scale)
  *   v3 — v2 + sets NOT checkpointed: both pair joins broadcast the same
  *        canonical sets subplan (ReuseExchange builds once; 2 eager jobs)
  *   v4 — v2 + pair-join-text verify: no sets materialization at all,
  *        texts attach to the (broadcast) pair list per side, grams
  *        computed per pair (2 eager jobs, docs scanned twice in verify)
  *
  * Asserts identical verified pair sets across variants before timing.
  *
  *   Test/runMain graft.ProfileDd2R18 [sfDir]
  */
object ProfileDd2R18 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val cores = spark.sparkContext.defaultParallelism

    def fanOut(df: DataFrame): DataFrame = df.repartition(cores)

    def bands(d: DataFrame): DataFrame = Dedup.minHashBands(d, "doc_id", "text")

    def cands(d: DataFrame): DataFrame =
      Dedup.lshCandidates(bands(d)).localCheckpoint(true)

    def grams(c: Column): Column = Dedup.wordShingles(c, 3)

    def jacc(df: DataFrame, ga: Column, gb: Column): DataFrame = {
      val d2 = df.withColumn("inter", size(array_intersect(ga, gb)))
        .withColumn("na", size(ga)).withColumn("nb", size(gb))
      d2.filter(col("inter") * 5 >= (col("na") + col("nb") - col("inter")) * 4)
        .select("ida", "idb")
    }

    // v1: shipped
    def v1(): DataFrame = Dedup.minHashDedup(docs, "doc_id", "text")

    // v2: fan-out kernel, rest shipped
    def v2(): DataFrame = {
      val c = cands(fanOut(docs))
      Dedup.verifyJaccard(c, docs, "doc_id", "text")
    }

    def lazySets(c: DataFrame): DataFrame = {
      val ids = c.select(col("ida").as("id")).union(c.select(col("idb").as("id")))
      docs.select(col("doc_id").as("id"), col("text"))
        .join(ids, Seq("id"), "left_semi")
        .select(col("id"), grams(col("text")).as("grams"))
    }

    // v3: fan-out + broadcast-reuse sets (2 jobs)
    def v3(): DataFrame = {
      val c = cands(fanOut(docs))
      val sets = lazySets(c)
      val a = c.join(broadcast(sets), c("ida") === sets("id"))
        .withColumnRenamed("grams", "ga").drop("id")
      val b = a.join(broadcast(sets), a("idb") === sets("id"))
        .withColumnRenamed("grams", "gb").drop("id")
      jacc(b, col("ga"), col("gb"))
    }

    // v4: fan-out + pair-join-text (texts attach to broadcast pairs)
    def v4(): DataFrame = {
      val c = cands(fanOut(docs))
      val ta = docs.select(col("doc_id").as("ida"), col("text").as("_ta"))
      val j1 = ta.join(broadcast(c), Seq("ida"))
      val tb = docs.select(col("doc_id").as("idb"), col("text").as("_tb"))
      val j2 = tb.join(broadcast(j1), Seq("idb"))
        .withColumn("ga", grams(col("_ta")))
        .withColumn("gb", grams(col("_tb")))
      jacc(j2, col("ga"), col("gb"))
    }

    // v5: ONE action, no checkpoints: the fanned-out docs exchange is
    // consumed by the kernel AND both verify sides (AQE ReusedExchange
    // computes it once); candidates feed the plan exactly once, as the
    // build of a broadcast pair-join; grams evaluate per pair row over
    // the fanned partitions (parallel).
    def v5(): DataFrame = {
      val d = fanOut(docs)
      val c = Dedup.lshCandidates(bands(d))
      val ta = d.select(col("doc_id").as("ida"), col("text").as("_ta"))
      val j1 = ta.join(broadcast(c), Seq("ida"))
      val tb = d.select(col("doc_id").as("idb"), col("text").as("_tb"))
      val j2 = tb.join(broadcast(j1), Seq("idb"))
        .withColumn("ga", grams(col("_ta")))
        .withColumn("gb", grams(col("_tb")))
      jacc(j2, col("ga"), col("gb"))
    }

    // v6: cands checkpointed (2 actions), verify = broadcast pair-join
    // over freshly fanned docs (parallel grams), no sets materialization
    def v6(): DataFrame = {
      val c = cands(fanOut(docs))
      val d = fanOut(docs)
      val ta = d.select(col("doc_id").as("ida"), col("text").as("_ta"))
      val j1 = ta.join(broadcast(c), Seq("ida"))
      val tb = d.select(col("doc_id").as("idb"), col("text").as("_tb"))
      val j2 = tb.join(broadcast(j1), Seq("idb"))
        .withColumn("ga", grams(col("_ta")))
        .withColumn("gb", grams(col("_tb")))
      jacc(j2, col("ga"), col("gb"))
    }

    // v7: carry the TEXT through the bucket shuffle (small-corpus fast
    // path): one action, 5 stage rounds, no joins, no checkpoints. The
    // kernel emits (id, band, bhash, text); buckets collect (id, text);
    // pairs dedup on (ida, idb) keeping the functionally-dependent texts;
    // jacc evaluates once per distinct pair. Payload cost: text rides the
    // bucket exchange ×bands — gate on corpus size at adoption.
    def v7(): DataFrame = {
      import org.apache.spark.sql.types._
      val d = fanOut(docs)
      val cs = Dedup.coeffs(64, 42L)
      val out = StructType(Seq(
        StructField("id", LongType), StructField("band", IntegerType),
        StructField("bhash", LongType), StructField("text", StringType)))
      val idIdx = d.schema.fieldIndex("doc_id")
      val txtIdx = d.schema.fieldIndex("text")
      val bandsDf = d.mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(idIdx)
          val txt = r.getString(txtIdx)
          val bh = Dedup.bandHashes(txt, 3, 64, 16, cs)
          bh.indices.iterator.map(b => org.apache.spark.sql.Row(id, b, bh(b), txt))
        }
      }(org.apache.spark.sql.Encoders.row(out))
      val pairs = bandsDf
        .select(xxhash64(col("band"), col("bhash")).as("bkey"),
          struct(col("id"), col("text")).as("m"))
        .groupBy("bkey")
        .agg(sort_array(collect_list(col("m"))).as("ms"))
        .filter(size(col("ms")).between(2, 1000))
        .select(explode(col("ms")).as("a"), col("ms"))
        .select(col("a"), explode(col("ms")).as("b"))
        .filter(col("a")("id") < col("b")("id"))
        .groupBy(col("a")("id").as("ida"), col("b")("id").as("idb"))
        .agg(first(col("a")("text")).as("_ta"), first(col("b")("text")).as("_tb"))
      val j = pairs
        .withColumn("ga", grams(col("_ta")))
        .withColumn("gb", grams(col("_tb")))
      jacc(j, col("ga"), col("gb"))
    }

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val p1 = pairSet(v1()); val p2 = pairSet(v2())
    val p3 = pairSet(v3()); val p4 = pairSet(v4())
    val p5 = pairSet(v5()); val p6 = pairSet(v6()); val p7 = pairSet(v7())
    require(p1 == p2 && p1 == p3 && p1 == p4 && p1 == p5 && p1 == p6 && p1 == p7,
      s"variant mismatch: v1=${p1.size} v2=${p2.size} v3=${p3.size} " +
        s"v4=${p4.size} v5=${p5.size} v6=${p6.size} v7=${p7.size}")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(n: Int)(f: => Unit): Double = Seq.fill(n)(timed(f)).min

    // interleaved warmup
    v1().count(); v2().count(); v3().count(); v4().count(); v5().count()
    v6().count(); v7().count()
    val w1 = minOf(5)(v1().count())
    val w2 = minOf(5)(v2().count())
    val w3 = minOf(5)(v3().count())
    val w4 = minOf(5)(v4().count())
    val w5 = minOf(5)(v5().count())
    val w6 = minOf(5)(v6().count())
    val w7 = minOf(5)(v7().count())
    // second interleave to expose drift
    val w1b = minOf(5)(v1().count())
    val w5b = minOf(5)(v5().count())
    val w7b = minOf(5)(v7().count())
    val json =
      f"""{"metric":"dd2_r18","sf":"$sfDir","pairs":${p1.size},"cores":$cores,""" +
        f""""v1_shipped_sec":$w1%.4f,"v2_fanout_sec":$w2%.4f,""" +
        f""""v3_fanout_bcast_sets_sec":$w3%.4f,"v4_fanout_pairjoin_sec":$w4%.4f,""" +
        f""""v5_one_action_reuse_sec":$w5%.4f,"v6_ckpt_bcast_verify_sec":$w6%.4f,""" +
        f""""v7_carrytext_sec":$w7%.4f,""" +
        f""""v1_again_sec":$w1b%.4f,"v5_again_sec":$w5b%.4f,"v7_again_sec":$w7b%.4f}"""
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
    spark.stop()
    sys.exit(0)
  }
}
