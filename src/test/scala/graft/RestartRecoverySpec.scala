package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Corpus
import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.AggSpec
import graft.sources.Tables
import graft.streaming.{IntakeMaintenance, RetractableViewMaintenance}

/** Streaming RESTART-RECOVERY parity: a maintenance stream killed
  * mid-sequence, its state persisted to parquet, and a FRESH handle
  * resumed from the loaded state over the remaining batches must end
  * byte-identical to the uninterrupted run — at every kill point. A
  * real crawl pipeline restarts; the save/load surface exists for that
  * posture, and this spec is the proof it actually carries it: the
  * resumed job never sees the corpus, the consumed changelog prefix, or
  * the killed JVM's in-memory state.
  */
class RestartRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-restart-$tag").toString

  // ---- intake fixtures (same corpus/crawl split as IntakeStreamSpec)

  private val statKeys = Seq("lang")
  private val statAggs = Seq(AggSpec("n_chars", "sum", "chars_sum"),
    AggSpec("n_chars", "count", "n_docs"))

  private def docsToks = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("lang"), col("n_chars"),
      Corpus.words(col("text")).as("toks"))

  private def crawlRows: Seq[(Long, String, Long, String)] =
    Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 17 === 0 ||
        (col("doc_id") % 3 === 0 && col("doc_id") % 5 === 0))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
        col("n_chars"), col("text"))
      .as[(Long, String, Long, String)].collect().toSeq.sortBy(_._1)

  private def runIntake(im0: IntakeMaintenance,
      batches: Seq[Seq[(Long, String, Long, String)]]): IntakeMaintenance = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long, String)]
    val q = im0.attach(ms.toDF().toDF("doc_id", "lang", "n_chars", "text")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        Corpus.words(col("text")).as("toks"))).start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    im0
  }

  /** One crawl batch as the frame attach() derives (for driving a
    * resumed handle under checkpoint-continued batchIds).
    */
  private def crawlDf(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("doc_id", "lang", "n_chars", "text")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        Corpus.words(col("text")).as("toks"))

  test("intake stream killed + resumed == uninterrupted, any kill point") {
    val corpus = docsToks.filter(col("doc_id") % 3 =!= 0).localCheckpoint()
    val docs = crawlRows
    val batches = docs.grouped(math.max(1, docs.size / 5)).toSeq

    val full = runIntake(new IntakeMaintenance(spark, corpus, "doc_id",
      "toks", statKeys, statAggs, 9, 10), batches)
    val wantStats = rows(full.statsNow)
    val wantCensus = rows(full.censusNow.get)

    // kill after 1 batch (census barely born), mid-stream, and one
    // batch before the end — the recovered run must be exact everywhere
    for (kill <- Seq(1, batches.size / 2, batches.size - 1)) {
      val first = runIntake(new IntakeMaintenance(spark, corpus, "doc_id",
        "toks", statKeys, statAggs, 9, 10), batches.take(kill))
      val dir = tmp(s"intake-$kill")
      first.save(dir)
      // the killed JVM's handle is gone: everything the resumed run
      // knows came through the parquet state. Driven the way Spark's
      // checkpointLocation restart drives it: the in-flight trigger
      // REPLAYS with its original id (the ledger must no-op it), then
      // the unconsumed suffix arrives under checkpoint-continued ids.
      val resumed = IntakeMaintenance.resume(spark, dir,
        "doc_id", "toks", statKeys, statAggs)
      assert(resumed.lastAppliedBatch === (kill - 1).toLong,
        s"snapshot ledger missing at kill=$kill")
      resumed.merge(crawlDf(batches(kill - 1)), (kill - 1).toLong)
      batches.drop(kill).zipWithIndex.foreach { case (b, i) =>
        resumed.merge(crawlDf(b), (kill + i).toLong)
      }
      assert(rows(resumed.statsNow) === wantStats,
        s"resumed stats diverged from uninterrupted at kill=$kill")
      assert(rows(resumed.censusNow.get) === wantCensus,
        s"resumed census diverged from uninterrupted at kill=$kill")
    }
  }

  test("a pre-census kill (no batch merged yet) still round-trips") {
    val corpus = docsToks.filter(col("doc_id") % 3 =!= 0).localCheckpoint()
    val docs = crawlRows
    val batches = docs.grouped(math.max(1, docs.size / 5)).toSeq
    val full = runIntake(new IntakeMaintenance(spark, corpus, "doc_id",
      "toks", statKeys, statAggs, 9, 10), batches)

    val fresh = new IntakeMaintenance(spark, corpus, "doc_id", "toks",
      statKeys, statAggs, 9, 10)
    val dir = tmp("intake-0")
    fresh.save(dir) // census is None: nothing written, nothing loaded
    val resumed = runIntake(IntakeMaintenance.resume(spark, dir,
      "doc_id", "toks", statKeys, statAggs), batches)
    assert(rows(resumed.statsNow) === rows(full.statsNow))
    assert(rows(resumed.censusNow.get) === rows(full.censusNow.get))
  }

  // ---- retractable-view fixtures (same changelog as
  // RetractableViewStreamSpec: inserts, deletes, split −old/+new update
  // pairs, a key retracted to zero, an all-NULL key, a key born with
  // the dim churn)

  private val keys = Seq("k")
  private val groups = Seq("g")
  private val aggs = Seq(AggSpec("v", "sum", "v_sum"),
    AggSpec("v", "count", "v_cnt"))

  private def dimOld = (0L to 9L).map(k => (k, s"g${k % 3}")).toDF("k", "g")

  private def changelog: Seq[(Long, Option[Long], Long)] = {
    val base = (1 to 40).map { i =>
      ((i % 6).toLong, if (i % 7 == 0) None else Some(i.toLong), 1L)
    }
    val dels = (1 to 40).filter(_ % 3 == 0).map { i =>
      ((i % 6).toLong,
        if (i % 7 == 0) Option.empty[Long] else Some(i.toLong), -1L)
    }
    val upds = (1 to 40).filter(i => i % 3 != 0 && i % 4 == 0).flatMap { i =>
      val old = if (i % 7 == 0) Option.empty[Long] else Some(i.toLong)
      Seq(((i % 6).toLong, old, -1L),
        ((i % 6).toLong, old.map(_ + 500L), 1L))
    }
    base ++ dels ++ upds ++
      Seq((6L, Some(9L), 1L), (6L, Some(9L), -1L),
        (7L, Option.empty[Long], 1L), (7L, Option.empty[Long], 1L),
        (8L, Some(77L), 1L))
  }

  private def dimChanges = Seq((5L, "gX", "U"), (4L, "g1", "D"),
    (8L, "gY", "U")).toDF("k", "g", "op")

  private def runView(vm: RetractableViewMaintenance,
      batches: Seq[(Seq[(Long, Option[Long], Long)], Int)], midIdx: Int)
      : RetractableViewMaintenance = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Option[Long], Long)]
    val q = vm.attach(ms.toDF().toDF("k", "v", "_sign")).start()
    try batches.foreach { case (b, i) =>
      ms.addData(b); q.processAllAvailable()
      if (i == midIdx) vm.applyDimDelta(dimChanges)
    } finally q.stop()
    vm
  }

  test("retractable view killed + resumed == uninterrupted, around the " +
      "dim churn") {
    val batches = changelog.grouped(9).toSeq.zipWithIndex
    val mid = batches.size / 2

    val full = runView(new RetractableViewMaintenance(spark, dimOld,
      keys, groups, aggs), batches, mid)
    val want = rows(full.view.get)

    // one kill BEFORE the dim churn (the resumed job applies it) and
    // one AFTER (the churned dim must survive the round-trip), plus a
    // kill splitting a −old/+new update pair across the restart
    for (kill <- Seq(1, mid, mid + 1, batches.size - 1)) {
      val first = runView(new RetractableViewMaintenance(spark, dimOld,
        keys, groups, aggs), batches.take(kill), mid)
      val dir = tmp(s"view-$kill")
      first.save(dir)
      // checkpoint-restart posture: replay of the in-flight trigger
      // (ledger no-op), then the suffix under checkpoint-continued ids,
      // dim churn applied at its global index
      val resumed = RetractableViewMaintenance.resume(spark, dir,
        keys, groups, aggs)
      assert(resumed.lastAppliedBatch === (kill - 1).toLong,
        s"snapshot ledger missing at kill=$kill")
      resumed.merge(batches(kill - 1)._1.toDF("k", "v", "_sign"),
        (kill - 1).toLong)
      batches.drop(kill).foreach { case (b, i) =>
        resumed.merge(b.toDF("k", "v", "_sign"), i.toLong)
        if (i == mid) resumed.applyDimDelta(dimChanges)
      }
      assert(rows(resumed.view.get) === want,
        s"resumed view diverged from uninterrupted at kill=$kill")
    }
  }
}
