package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IncrementalAgg}
import graft.operators.IncrementalAgg.AggSpec
import graft.sources.Tables
import graft.streaming.{ChunkMaintenance, ClusterMaintenance,
  EmbedMaintenance, MixMaintenance, NearDupPair, RetractionMaintenance,
  SelectionMaintenance, ViewMaintenance}

/** Restart recovery across the streaming FLEET: every foreachBatch
  * maintenance handle that holds driver-side state can be killed
  * mid-sequence, its state persisted to parquet, and a FRESH handle
  * resumed from the loaded state over the remaining batches — and the
  * final derived output must be identical to the uninterrupted run, at
  * every kill point. RestartRecoverySpec proves this for the intake and
  * retractable-view handles; this spec extends the posture to the rest
  * of the fleet (chunk index, embed model, DSIR selection, source mix,
  * dedup clusters, signed retraction, join view), because a real crawl
  * pipeline restarts ALL of its standing state, not just the intake.
  *
  * Scope note (cluster): the pair stream feeding ClusterMaintenance is
  * itself stateful (DocStreams' keyed band buckets live in Spark's
  * state store and recover via stream checkpointing, Spark's native
  * mechanism); this spec feeds the PAIR changelog directly, which is
  * exactly the handle's own restart boundary — upstream recovers via
  * checkpoint, the label table recovers via save/resume.
  */
class RestartFleetSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-fleet-$tag").toString

  /** Kill after the first batch (state barely born), mid-stream, and
    * one batch before the end.
    */
  private def killPoints(n: Int): Seq[Int] =
    Seq(1, n / 2, n - 1).distinct.filter(k => k > 0 && k < n)

  /** Generic harness: run `mk()` handles over batch prefixes/suffixes
    * split at every kill point and compare `out` against the
    * uninterrupted run.
    */
  private def proveRestart[H, B](tag: String, batches: Seq[B], mk: () => H,
      runBatches: (H, Seq[B]) => Unit, save: (H, String) => Unit,
      resume: String => H, out: H => Set[Seq[Any]]): Unit = {
    val full = mk()
    runBatches(full, batches)
    val want = out(full)
    assert(want.nonEmpty, s"$tag: uninterrupted run produced no state")
    for (kill <- killPoints(batches.size)) {
      val first = mk()
      runBatches(first, batches.take(kill))
      val dir = tmp(s"$tag-$kill")
      save(first, dir)
      val resumed = resume(dir)
      runBatches(resumed, batches.drop(kill))
      assert(out(resumed) === want,
        s"$tag: resumed output diverged from uninterrupted at kill=$kill")
    }
  }

  // ---- fixtures

  private def docRows: Seq[(Long, String, String)] =
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)

  private def docBatches[T](rows: Seq[T], n: Int = 5): Seq[Seq[T]] =
    rows.grouped(math.max(1, rows.size / n)).toSeq

  test("chunk-index maintenance killed + resumed == uninterrupted") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = docBatches(docRows.map { case (id, _, t) => (id, t) })
    proveRestart[ChunkMaintenance, Seq[(Long, String)]](
      "chunk", batches,
      () => new ChunkMaintenance(spark),
      (h, bs) => {
        val ms = MemoryStream[(Long, String)]
        val q = h.attach(ms.toDF().toDF("doc_id", "text")).start()
        try bs.foreach { b => ms.addData(b); q.processAllAvailable() }
        finally q.stop()
      },
      (h, d) => h.save(d),
      d => ChunkMaintenance.resume(spark, d),
      h => rows(h.index) ++ rows(h.dedupStats))
  }

  test("embed-model maintenance killed + resumed == uninterrupted") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
    val probe = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    proveRestart[EmbedMaintenance, Seq[(Long, Seq[Float])]](
      "embed", docBatches(vecs),
      () => new EmbedMaintenance(spark),
      (h, bs) => {
        val ms = MemoryStream[(Long, Seq[Float])]
        val q = h.attach(ms.toDF().toDF("vec_id", "embedding")).start()
        try bs.foreach { b => ms.addData(b); q.processAllAvailable() }
        finally q.stop()
      },
      (h, d) => h.save(d),
      d => EmbedMaintenance.resume(spark, d),
      // the model state AND a pruned probe frame: the derived decision
      // surface must survive the restart, not just the raw sums
      h => rows(h.componentState) ++ rows(h.prune(probe)))
  }

  test("DSIR-selection maintenance killed + resumed == uninterrupted") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val probe = Tables.load(spark, sf, "documents")
    proveRestart[SelectionMaintenance, Seq[(Long, String, String)]](
      "dsir", docBatches(docRows),
      () => new SelectionMaintenance(spark),
      (h, bs) => {
        val ms = MemoryStream[(Long, String, String)]
        val q = h.attach(ms.toDF().toDF("doc_id", "source", "text")).start()
        try bs.foreach { b => ms.addData(b); q.processAllAvailable() }
        finally q.stop()
      },
      (h, d) => h.save(d),
      d => SelectionMaintenance.resume(spark, d),
      h => rows(h.bucketCounts) ++
        rows(h.select(probe).select("doc_id")))
  }

  test("mix maintenance killed + resumed == uninterrupted") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    proveRestart[MixMaintenance, Seq[(Long, String, String)]](
      "mix", docBatches(docRows),
      () => new MixMaintenance(spark),
      (h, bs) => {
        val ms = MemoryStream[(Long, String, String)]
        val q = h.attach(ms.toDF().toDF("doc_id", "source", "text")).start()
        try bs.foreach { b => ms.addData(b); q.processAllAvailable() }
        finally q.stop()
      },
      (h, d) => h.save(d),
      d => MixMaintenance.resume(spark, d),
      h => rows(h.tokenCounts) ++ rows(h.unimaxAlloc()))
  }

  test("cluster maintenance killed + resumed == uninterrupted") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the batch pipeline's own verified pair set, streamed as a
    // changelog — a kill point can split a component's edges across the
    // restart, which is exactly what the incremental contraction must
    // absorb from the persisted labeling
    val pairs = Dedup.minHashDedup(
        Tables.load(spark, sf, "documents"), "doc_id", "text")
      .select(col("ida"), col("idb"))
      .as[(Long, Long)].collect().toSeq.sorted
      .map { case (a, b) => NearDupPair(a, b) }
    proveRestart[ClusterMaintenance, Seq[NearDupPair]](
      "cluster", docBatches(pairs),
      () => new ClusterMaintenance(spark),
      (h, bs) => {
        val ms = MemoryStream[NearDupPair]
        val q = h.attach(ms.toDS()).start()
        try bs.foreach { b => ms.addData(b); q.processAllAvailable() }
        finally q.stop()
      },
      (h, d) => h.save(d),
      d => ClusterMaintenance.resume(spark, d),
      h => rows(h.labels))
  }

  test("retraction maintenance killed + resumed == uninterrupted, " +
      "including a kill splitting an update's −old/+new pair") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val keys = Seq("k")
    val aggs = Seq(AggSpec("v", "sum", "v_sum"),
      AggSpec("v", "count", "v_cnt"))
    // inserts, deletes, −old/+new update pairs, a group retracted to
    // zero, an all-NULL group — batched by 7 so updates straddle batch
    // boundaries and at least one kill point lands mid-update
    val changelog: Seq[(String, Option[Long], Long)] = {
      val base = (1 to 40).map { i =>
        (s"g${i % 5}", if (i % 7 == 0) None else Some(i.toLong), 1L)
      }
      val dels = (1 to 40).filter(_ % 3 == 0).map { i =>
        (s"g${i % 5}",
          if (i % 7 == 0) Option.empty[Long] else Some(i.toLong), -1L)
      }
      val upds = (1 to 40).filter(i => i % 3 != 0 && i % 4 == 0).flatMap { i =>
        val old = if (i % 7 == 0) Option.empty[Long] else Some(i.toLong)
        Seq((s"g${i % 5}", old, -1L), (s"g${i % 5}", old.map(_ + 500L), 1L))
      }
      base ++ dels ++ upds ++
        Seq(("gz", Some(9L), 1L), ("gz", Some(9L), -1L),
          ("gn", Option.empty[Long], 1L), ("gn", Option.empty[Long], 1L))
    }
    proveRestart[RetractionMaintenance, Seq[(String, Option[Long], Long)]](
      "retract", changelog.grouped(7).toSeq,
      () => new RetractionMaintenance(spark, keys, aggs),
      (h, bs) => {
        val ms = MemoryStream[(String, Option[Long], Long)]
        val q = h.attach(ms.toDF().toDF("k", "v", "_sign")).start()
        try bs.foreach { b => ms.addData(b); q.processAllAvailable() }
        finally q.stop()
      },
      (h, d) => h.save(d),
      d => RetractionMaintenance.resume(spark, d, keys, aggs),
      h => rows(h.view.get))
  }

  test("join-view maintenance killed + resumed == uninterrupted, " +
      "around the dim churn") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val keys = Seq("k")
    val groups = Seq("g")
    val aggs = Seq(AggSpec("v", "sum", "v_sum"),
      AggSpec("v", "count", "v_cnt"), AggSpec("v", "min", "v_min"))
    val facts = Tables.load(spark, sf, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id").as("k"),
        round(col("value") * 100).cast("long").as("v"))
      .as[(Long, Long)].collect().toSeq.sorted
    val dim0 = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("g"))
    val dimChanges = dim0.filter(col("k") % 10 === 0)
      .select(col("k"), lit("MOVED").as("g"), lit("U").as("op"))
    val batches = docBatches(facts, 6).zipWithIndex
    val mid = batches.size / 2

    def runFacts(h: ViewMaintenance,
        bs: Seq[(Seq[(Long, Long)], Int)]): Unit = {
      val ms = MemoryStream[(Long, Long)]
      val q = h.attach(ms.toDF().toDF("k", "v")).start()
      try bs.foreach { case (b, i) =>
        ms.addData(b); q.processAllAvailable()
        if (i == mid) h.applyDimDelta(dimChanges)
      } finally q.stop()
    }

    val full = new ViewMaintenance(spark, dim0, keys, groups, aggs)
    runFacts(full, batches)
    val want = rows(full.view.get)
    assert(want.nonEmpty)

    // kills on both sides of the churn: before (the resumed job applies
    // it) and after (the churned dim must survive the round-trip)
    for (kill <- Seq(1, mid, mid + 1, batches.size - 1).distinct
        .filter(k => k > 0 && k < batches.size)) {
      val first = new ViewMaintenance(spark, dim0, keys, groups, aggs)
      runFacts(first, batches.take(kill))
      val dir = tmp(s"view-$kill")
      first.save(dir)
      val resumed = ViewMaintenance.resume(spark, dir, keys, groups, aggs)
      runFacts(resumed, batches.drop(kill))
      assert(rows(resumed.view.get) === want,
        s"join view diverged from uninterrupted at kill=$kill")
    }
  }
}
