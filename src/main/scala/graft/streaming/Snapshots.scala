package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Atomic, versioned snapshot publication for the maintenance fleet's
  * `save()`/`resume()` pairs — the stage → marker → publish pattern
  * [[AnnIndexMaintenance]] uses for its layout, applied to driver-state
  * snapshots.
  *
  * Why: every handle's snapshot is SEVERAL parquet directories plus the
  * [[BatchLedger]] — written sequentially, a crash mid-save leaves state
  * dirs from batch N next to a ledger from batch N−1 (or vice versa),
  * and a resume would load the mix silently. The ledger guards stream
  * REPLAY; snapshot atomicity needs its own commit point.
  *
  * Protocol ([[publish]]): the caller writes ALL of its pieces under a
  * hidden staging dir, then a `_COMMITTED` marker is created inside it,
  * then the whole dir renames to `v<N>` — one FileSystem move as the
  * single commit point (atomic on HDFS/local; on S3 the marker is the
  * authority — a dir without it is never read). Older versions are
  * deleted only AFTER the new one is published; a crash anywhere leaves
  * either the old committed version intact or both (resume picks the
  * newest committed), never a torn mix. Renames are CHECKED — Hadoop
  * reports most failures by returning false, not throwing.
  *
  * [[resolve]] returns the newest committed version dir, falling back
  * to the bare path for pre-versioning flat snapshots (read-only
  * compatibility: their next save publishes v0 alongside, which then
  * wins). Handles may read the resolved dir lazily only until their
  * next save — every fleet resume() eagerly localCheckpoints its loads,
  * which is what makes deleting superseded versions safe.
  */
private[graft] object Snapshots {

  private val Committed = "_COMMITTED"

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionOf(name: String): Option[Long] =
    if (name.length > 1 && name.head == 'v' && name.tail.forall(_.isDigit))
      Some(name.tail.toLong)
    else None

  /** Committed (version, dir) pairs under `root`, unsorted. */
  private def committedVersions(fs: FileSystem,
      root: Path): Seq[(Long, Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
      versionOf(st.getPath.getName)
        .filter(_ => fs.exists(new Path(st.getPath, Committed)))
        .map(_ -> st.getPath)
    }

  /** Stage-and-publish one snapshot version: `write` receives the
    * staging dir and must write every piece of the snapshot under it;
    * afterwards the marker lands and the dir renames into place. Throws
    * (staging left for inspection, prior version untouched) on any
    * failure — save() is all-or-nothing.
    */
  def publish(spark: SparkSession, path: String)
      (write: String => Unit): Unit = {
    val root = new Path(path)
    val fs = fsFor(spark, root)
    fs.mkdirs(root)
    val prior = committedVersions(fs, root)
    val next = (prior.map(_._1) :+ -1L).max + 1
    val staged = new Path(root, s".staging-v$next")
    if (fs.exists(staged)) fs.delete(staged, /* recursive = */ true)
    write(staged.toString)
    fs.create(new Path(staged, Committed), /* overwrite = */ true).close()
    val dst = new Path(root, s"v$next")
    if (!fs.rename(staged, dst))
      throw new java.io.IOException(
        s"snapshot publish $staged -> $dst returned false")
    // retention AFTER the commit point: superseded versions (and any
    // legacy flat pieces a pre-versioning save left) stay untouched on
    // a crash — the newest committed version still wins at resume
    prior.foreach { case (_, dir) => fs.delete(dir, true) }
  }

  /** The directory a resume() should read: the newest committed version,
    * or the bare path when no version was ever published (legacy flat
    * snapshot). Fails loudly when the path holds neither.
    */
  def resolve(spark: SparkSession, path: String): String = {
    val root = new Path(path)
    val fs = fsFor(spark, root)
    val vs = committedVersions(fs, root)
    if (vs.nonEmpty) vs.maxBy(_._1)._2.toString
    else {
      require(fs.exists(root),
        s"no snapshot at $path — save() at least once before resume()")
      path
    }
  }
}
