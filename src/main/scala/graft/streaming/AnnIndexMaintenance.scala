package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Streaming ANN-INDEX maintenance — the standing-pipeline form of
  * [[Similarity.ensureLshBucketLayout]] under continuous arrival: an
  * embedding stream appends each micro-batch into the bucket-PARTITIONED
  * parquet layout (one write per trigger, clustered by LSH bucket), so
  * every probe prunes to the hamming-ball buckets AT THE FILE INDEX over
  * the corpus-so-far — the ss1b shape, maintained instead of rebuilt.
  *
  * State is the layout itself (on disk, not in the driver), which is
  * exactly what makes this the 100 TB posture: the index grows with the
  * corpus like any database index, the driver holds nothing but the
  * hyperplane constants, and a probe's cost is governed by the bucket
  * fan-out ((Σ C(nbits,0..h))/2^nbits of the files), not by how long the
  * stream has run. At cluster scale the same shape is "append to a
  * bucket-clustered table per trigger, compact occasionally"
  * ([[graft.operators.Compaction]] is the compaction half).
  *
  * Restart recovery is BY CONSTRUCTION rather than by save/load: the
  * state is already durable, and [[merge]] is idempotent under
  * foreachBatch's at-least-once replay — each trigger's append is
  * recorded in a commit log inside the layout (`_graft_commits/<id>`),
  * so a batch re-delivered after a crash-restart (same batchId, Spark's
  * checkpoint contract) is skipped instead of doubling its rows. A fresh
  * handle at the same path resumes the stream with no replay and no
  * rescan (spec-gated in RestartFleetSpec, including a simulated
  * replayed trigger).
  *
  * Invariant (spec-gated): after any stream prefix, [[probe]] equals the
  * batch probe over a layout built from the same documents — candidates
  * are bucket co-residency (a pure function of the vector and the seeded
  * hyperplanes), scoring is exact cosine, so arrival order and batching
  * cannot change the result.
  */
final class AnnIndexMaintenance(spark: SparkSession, path: String,
    vecCol: String = "embedding", idCol: String = "vec_id",
    nbits: Int = 4, dim: Int = 64, seed: Long = 42L) {

  private val planes = Similarity.hyperplanes(dim, nbits, seed)
  private def commitDir = new java.io.File(path, "_graft_commits")

  /** Has this trigger already been appended? (at-least-once guard) */
  def committed(batchId: Long): Boolean =
    new java.io.File(commitDir, batchId.toString).exists()

  /** foreachBatch body — append one trigger's vectors, clustered by
    * bucket so each bucket stays a few contiguous files per trigger
    * rather than tasks×buckets splinters. `batchId < 0` appends
    * unconditionally (ad-hoc/batch use); a non-negative id is recorded
    * and replays of it are no-ops.
    */
  def merge(emb: DataFrame, batchId: Long): Unit = synchronized {
    if (batchId >= 0 && committed(batchId)) return
    val batch = emb.select(col(idCol), col(vecCol))
      .withColumn("bucket", Similarity.lshBucket(col(vecCol), planes))
      .repartition(1 << nbits, col("bucket"))
    batch.write.mode("append").partitionBy("bucket").parquet(path)
    if (batchId >= 0) {
      commitDir.mkdirs()
      new java.io.File(commitDir, batchId.toString).createNewFile()
    }
  }

  /** The layout as a frame (bucket is the partition column). */
  def index: DataFrame = {
    require(new java.io.File(path).exists(),
      s"no layout at $path — merge at least one trigger first")
    spark.read.parquet(path)
  }

  /** Exact-cosine top-k over the hamming-`probeHamming` bucket ball of
    * an external query vector — ONE probe job whose scan prunes to the
    * probed buckets at the file index (PartitionFilters, plan-gated).
    */
  def probe(query: Array[Float], k: Int = 10,
      probeHamming: Int = 1): DataFrame =
    Similarity.bruteForceTopK(
      index.filter(col("bucket").isin(probeBuckets(query, probeHamming): _*)),
      vecCol, idCol, query, k)

  /** The query's bucket plus every bucket within `h` bit flips. */
  def probeBuckets(query: Array[Float], h: Int = 1): Seq[Long] = {
    val qBits = planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(query).map { case (a, b) => a * b.toDouble }.sum >= 0.0)
        1L << i
      else 0L
    }.sum
    def ball(start: Int, left: Int, acc: Long): Seq[Long] =
      if (left == 0) Seq(acc)
      else (start until nbits).flatMap(i =>
        ball(i + 1, left - 1, acc ^ (1L << i)))
    (0 to h).flatMap(ball(0, _, qBits)).distinct
  }

  /** Rewrite the layout clustered — one-ish file per bucket — and swap
    * it in, keeping the commit log. Per-trigger appends leave up to one
    * file per (trigger × bucket); a probe's task count is its bucket
    * ball's FILE count, so a long-lived stream pays growing scheduling
    * cost until compacted (the same maintenance any append-mode table
    * needs; at cluster scale this is the table format's OPTIMIZE).
    * Call between triggers; like any non-transactional directory
    * rewrite, a probe racing the swap can see a partial layout —
    * production puts the layout in a transactional table and gets the
    * atomic swap from the format.
    */
  def compact(): Unit = synchronized {
    val tmp = path + ".compact"
    index.repartition(1 << nbits, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    val dst = new java.io.File(path)
    dst.listFiles().filter(_.getName.startsWith("bucket="))
      .foreach(deleteRecursively)
    new java.io.File(tmp).listFiles()
      .filter(f => f.getName.startsWith("bucket=") || f.getName == "_SUCCESS")
      .foreach { f =>
        java.nio.file.Files.move(f.toPath,
          new java.io.File(dst, f.getName).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    deleteRecursively(new java.io.File(tmp))
    // drop any cached file listing for the path — a probe planned after
    // the swap must list the compacted files, not the deleted ones
    spark.catalog.refreshByPath(path)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Wire a streaming embedding frame into this handle; `.start()` to
    * run. The trigger's batchId flows into the commit log, which is
    * what makes a crash-replayed trigger a no-op.
    */
  def attach(emb: DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    emb.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) => merge(b, id) }
}
