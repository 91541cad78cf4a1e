package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables
import graft.streaming.AnnIndexMaintenance

/** Streaming ANN-index parity: the bucket-partitioned LSH layout
  * maintained by per-trigger appends must answer probes exactly like a
  * layout built in one batch pass over the same vectors — at any stream
  * prefix — and a probe must prune to the hamming-ball buckets at the
  * FILE index. Restart recovery is by construction (durable layout +
  * batch commit log), including the at-least-once replay case.
  */
class AnnIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private def vecs: Seq[(Long, Seq[Float])] =
    Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)

  private val query: Array[Float] = {
    val rnd = new scala.util.Random(7)
    Array.fill(64)(rnd.nextGaussian().toFloat)
  }

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft-annix-$tag").toString + "/layout"

  /** The batch answer: same planes, same ball, same exact-cosine top-k,
    * computed straight off a DataFrame (no layout involved).
    */
  private def batchProbe(rows: Seq[(Long, Seq[Float])], h: AnnIndexMaintenance,
      k: Int = 10): Seq[Long] = {
    val planes = Similarity.hyperplanes(64, 4)
    val emb = rows.toDF("vec_id", "embedding")
      .withColumn("bucket", Similarity.lshBucket(col("embedding"), planes))
      .filter(col("bucket").isin(h.probeBuckets(query): _*))
    Similarity.bruteForceTopK(emb, "embedding", "vec_id", query, k)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
  }

  test("streamed layout probe == batch probe at every stream prefix") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = vecs
    val batches = all.grouped(math.max(1, all.size / 4)).toSeq
    val h = new AnnIndexMaintenance(spark, tmp("prefix"))
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = h.attach(ms.toDF().toDF("vec_id", "embedding")).start()
    try {
      var seen = Seq.empty[(Long, Seq[Float])]
      batches.foreach { b =>
        ms.addData(b); q.processAllAvailable()
        seen ++= b
        val got = h.probe(query).select("vec_id")
          .collect().map(_.getLong(0)).toSeq
        assert(got === batchProbe(seen, h),
          s"probe diverged from batch after ${seen.size} vectors")
      }
      assert(h.index.count() === all.size.toLong)
    } finally q.stop()
  }

  test("a crash-replayed trigger is a no-op; a fresh handle resumes " +
      "with no duplicates and full parity") {
    val all = vecs
    val batches = all.grouped(math.max(1, all.size / 4)).toSeq
    val path = tmp("restart")
    val h1 = new AnnIndexMaintenance(spark, path)
    h1.merge(batches(0).toDF("vec_id", "embedding"), 0L)
    h1.merge(batches(1).toDF("vec_id", "embedding"), 1L)
    // the killed JVM's handle is gone; the layout + commit log are the
    // only state the resumed job sees
    val h2 = new AnnIndexMaintenance(spark, path)
    // at-least-once: the checkpoint replays the in-flight trigger with
    // the SAME batchId — the commit log must make it a no-op
    val before = h2.index.count()
    h2.merge(batches(1).toDF("vec_id", "embedding"), 1L)
    assert(h2.index.count() === before, "replayed trigger duplicated rows")
    batches.drop(2).zipWithIndex.foreach { case (b, i) =>
      h2.merge(b.toDF("vec_id", "embedding"), 2L + i)
    }
    assert(h2.index.count() === all.size.toLong,
      "resumed layout lost or duplicated vectors")
    assert(h2.probe(query).select("vec_id").collect().map(_.getLong(0)).toSeq
      === batchProbe(all, h2), "resumed probe diverged from batch")
  }

  test("two-phase append crash windows: a crash before the marker leaks " +
      "nothing and restages; a crash after the marker finalizes — the " +
      "replayed batchId never doubles") {
    val all = vecs
    val thirds = all.grouped(math.max(1, all.size / 3 + 1)).toSeq
    val path = tmp("crash")
    val h = new AnnIndexMaintenance(spark, path)
    h.merge(thirds(0).toDF("vec_id", "embedding"), 0L)
    val base = h.index.count()

    // crash BETWEEN the staging write and the marker (the round-13
    // window: data written, commit not recorded): nothing is readable,
    // and the checkpoint-replayed trigger restages + publishes ONCE
    h.stage(thirds(1).toDF("vec_id", "embedding"), 1L)
    assert(h.index.count() === base, "staged rows leaked into the layout")
    val h2 = new AnnIndexMaintenance(spark, path)
    h2.merge(thirds(1).toDF("vec_id", "embedding"), 1L)
    assert(h2.index.count() === base + thirds(1).size,
      "replay after a pre-marker crash lost or duplicated rows")

    // crash BETWEEN the marker and the publish moves: the replayed
    // trigger sees the commit and FINALIZES the staged files instead of
    // re-appending
    h2.stage(thirds(2).toDF("vec_id", "embedding"), 2L)
    h2.markCommitted(2L)
    val h3 = new AnnIndexMaintenance(spark, path)
    h3.merge(thirds(2).toDF("vec_id", "embedding"), 2L)
    assert(h3.index.count() === all.size.toLong,
      "replay after a post-marker crash lost or duplicated rows")
    // and a SECOND replay of the now-fully-published batch is a no-op
    h3.merge(thirds(2).toDF("vec_id", "embedding"), 2L)
    assert(h3.index.count() === all.size.toLong,
      "replay of a published batch duplicated rows")
    assert(h3.probe(query).select("vec_id").collect().map(_.getLong(0)).toSeq
      === batchProbe(all, h3), "probe diverged after crash-window recovery")
  }

  test("a probe prunes to the hamming-ball buckets at the file index") {
    val all = vecs
    val path = tmp("prune")
    val h = new AnnIndexMaintenance(spark, path)
    h.merge(all.toDF("vec_id", "embedding"), 0L)
    val probe = h.probe(query)
    probe.collect() // execute so the scan metrics are populated
    val plan = probe.queryExecution.executedPlan
    // the bucket predicate must ride the PARTITION filters (pruned at
    // the file index), not the post-scan data filters
    val planTxt = plan.toString
    assert(planTxt.contains("PartitionFilters") &&
      planTxt.split("PartitionFilters", 2)(1).take(200).contains("bucket"),
      planTxt.take(800))
    // and quantitatively: the scan touched only the ball's files
    val scan = plan.collect { case s: FileSourceScanExec => s }.head
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    val nProbed = h.probeBuckets(query).size
    assert(filesRead <= 2L * nProbed,
      s"probe read $filesRead files for $nProbed buckets — layout splintered or unpruned")
    assert(filesRead < totalFiles,
      s"probe read every file ($filesRead of $totalFiles) — no pruning")
  }

  test("compaction re-clusters the splintered layout: probe parity, " +
      "one-ish file per bucket, commit log intact") {
    val all = vecs
    val batches = all.grouped(math.max(1, all.size / 6)).toSeq
    val path = tmp("compact")
    val h = new AnnIndexMaintenance(spark, path)
    batches.zipWithIndex.foreach { case (b, i) =>
      h.merge(b.toDF("vec_id", "embedding"), i.toLong)
    }
    def filesPerBucket: Seq[Int] = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).toSeq
    // the stream splintered the layout (one file per trigger × bucket)
    assert(filesPerBucket.exists(_ > 2),
      s"fixture failure: appends did not splinter ($filesPerBucket)")
    val want = h.probe(query).select("vec_id").collect().map(_.getLong(0)).toSeq

    h.compact()

    assert(filesPerBucket.forall(_ <= 2),
      s"compaction left a splintered bucket: $filesPerBucket")
    assert(h.index.count() === all.size.toLong,
      "compaction lost or duplicated vectors")
    assert(h.probe(query).select("vec_id").collect().map(_.getLong(0)).toSeq
      === want, "probe diverged after compaction")
    // the commit log survived: a replayed trigger is still a no-op
    val before = h.index.count()
    h.merge(batches(0).toDF("vec_id", "embedding"), 0L)
    assert(h.index.count() === before,
      "commit log lost in compaction — replayed trigger duplicated rows")
  }
}
