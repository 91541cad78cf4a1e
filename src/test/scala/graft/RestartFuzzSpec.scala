package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg.AggSpec
import graft.streaming.{ChunkMaintenance, RetractionMaintenance}

/** Seeded randomized restart-recovery: the fleet spec proves kill+resume
  * parity on fixed fixtures; this one drives RANDOM changelogs/corpora
  * through random batchings and a random kill point per seed, so the
  * restart invariant is not an artifact of a hand-picked schedule. Two
  * handles with the most failure surface are fuzzed: the signed
  * retraction view (update pairs split arbitrarily across the restart,
  * groups retracted to zero, NULL measures) and the chunk index (text
  * dedup state whose merge must stay min/sum-exact under any split).
  */
class RestartFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-rfuzz-$tag").toString

  test("retraction view restart parity under seeded random changelogs") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val keys = Seq("k")
    val aggs = Seq(AggSpec("v", "sum", "v_sum"),
      AggSpec("v", "count", "v_cnt"))

    for (seed <- Seq(11, 29, 47)) {
      val rnd = new scala.util.Random(seed)
      // random signed changelog over a live multiset: inserts always
      // legal, deletes/updates drawn from the rows currently present so
      // the net multiset stays well-formed (the invariant a CDC source
      // guarantees); ~25% NULL measures exercise the witness algebra
      val live = scala.collection.mutable.ArrayBuffer[(String, Option[Long])]()
      val log = Seq.newBuilder[(String, Option[Long], Long)]
      for (_ <- 1 to 150) {
        val op = rnd.nextInt(4)
        if (op <= 1 || live.isEmpty) { // insert (50%, or forced)
          val row = (s"g${rnd.nextInt(6)}",
            if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(100).toLong))
          live += row; log += ((row._1, row._2, 1L))
        } else if (op == 2) { // delete a live row
          val row = live.remove(rnd.nextInt(live.size))
          log += ((row._1, row._2, -1L))
        } else { // update a live row: −old, +new (may split across kill)
          val i = rnd.nextInt(live.size)
          val old = live(i)
          val nu = (old._1, Some(rnd.nextInt(100) + 500L): Option[Long])
          live(i) = nu
          log += ((old._1, old._2, -1L)); log += ((nu._1, nu._2, 1L))
        }
      }
      val changelog = log.result()
      val batchSize = 3 + rnd.nextInt(17)
      val batches = changelog.grouped(batchSize).toSeq
      val kill = 1 + rnd.nextInt(math.max(1, batches.size - 1))

      def run(h: RetractionMaintenance,
          bs: Seq[Seq[(String, Option[Long], Long)]]): RetractionMaintenance = {
        val ms = MemoryStream[(String, Option[Long], Long)]
        val q = h.attach(ms.toDF().toDF("k", "v", "_sign")).start()
        try bs.foreach { b => ms.addData(b); q.processAllAvailable() }
        finally q.stop()
        h
      }

      val want = rows(run(new RetractionMaintenance(spark, keys, aggs),
        batches).view.get)
      val first = run(new RetractionMaintenance(spark, keys, aggs),
        batches.take(kill))
      val dir = tmp(s"rv-$seed")
      first.save(dir)
      // checkpoint-restart posture: replayed in-flight trigger (ledger
      // no-op), then the suffix under checkpoint-continued ids
      val resumed = RetractionMaintenance.resume(spark, dir, keys, aggs)
      assert(resumed.lastAppliedBatch === (kill - 1).toLong)
      resumed.merge(batches(kill - 1).toDF("k", "v", "_sign"),
        (kill - 1).toLong)
      batches.drop(kill).zipWithIndex.foreach { case (b, i) =>
        resumed.merge(b.toDF("k", "v", "_sign"), (kill + i).toLong)
      }
      assert(rows(resumed.view.get) === want,
        s"seed=$seed batchSize=$batchSize kill=$kill/${batches.size}: " +
          "resumed view diverged from uninterrupted")
    }
  }

  test("chunk index restart parity under seeded random corpora") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    for (seed <- Seq(5, 83)) {
      val rnd = new scala.util.Random(seed)
      // random docs built from a tiny shared phrase pool → heavy chunk
      // overlap, so first-rank/copies genuinely contend across batches
      val phrases = Array.fill(12)(
        Array.fill(30 + rnd.nextInt(40))(('a' + rnd.nextInt(26)).toChar)
          .mkString)
      val docs = (0L until 120L).map { id =>
        (id, Seq.fill(3 + rnd.nextInt(5))(
          phrases(rnd.nextInt(phrases.length))).mkString(" "))
      }
      val shuffled = rnd.shuffle(docs)
      val batches = shuffled.grouped(7 + rnd.nextInt(20)).toSeq
      val kill = 1 + rnd.nextInt(math.max(1, batches.size - 1))

      def run(h: ChunkMaintenance,
          bs: Seq[Seq[(Long, String)]]): ChunkMaintenance = {
        val ms = MemoryStream[(Long, String)]
        val q = h.attach(ms.toDF().toDF("doc_id", "text")).start()
        try bs.foreach { b => ms.addData(b); q.processAllAvailable() }
        finally q.stop()
        h
      }

      val want = rows(run(new ChunkMaintenance(spark), batches).index)
      val first = run(new ChunkMaintenance(spark), batches.take(kill))
      val dir = tmp(s"ci-$seed")
      first.save(dir)
      // checkpoint-restart posture: replayed in-flight trigger (ledger
      // no-op), then the suffix under checkpoint-continued ids
      val resumed = ChunkMaintenance.resume(spark, dir)
      assert(resumed.lastAppliedBatch === (kill - 1).toLong)
      resumed.merge(batches(kill - 1).toDF("doc_id", "text"),
        (kill - 1).toLong)
      batches.drop(kill).zipWithIndex.foreach { case (b, i) =>
        resumed.merge(b.toDF("doc_id", "text"), (kill + i).toLong)
      }
      assert(rows(resumed.index) === want,
        s"seed=$seed kill=$kill/${batches.size}: resumed index diverged")
      assert(rows(resumed.dedupStats) ===
        rows(run(new ChunkMaintenance(spark), batches).dedupStats))
    }
  }
}
