package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Compaction
import graft.sources.Tables

/** Compaction must shrink the file count to ~bytes/target, preserve
  * every row, and shrink the scan's task fan-out (the per-file cost the
  * operator exists to remove).
  */
class CompactionSpec extends SparkSpec {

  test("fragmented dataset compacts to target-size files, rows intact") {
    val tmp = java.nio.file.Files.createTempDirectory("compact-spec").toFile
    tmp.deleteOnExit()
    // fragment: 64 files for a ~100 KB dataset
    val events = Tables.load(spark, sf, "events")
    events.repartition(64).write.parquet(s"$tmp/frag")
    val fragFiles = Compaction.dataFiles(s"$tmp/frag")
    assert(fragFiles.size == 64)
    val target = math.max(64L * 1024L, fragFiles.map(_.length).sum)
    val stats = Compaction.compact(spark, s"$tmp/frag", s"$tmp/compact", target)
    assert(stats.filesBefore == 64)
    assert(stats.filesAfter == 1, s"expected 1 file, got ${stats.filesAfter}")
    // row multiset preserved
    val a = spark.read.parquet(s"$tmp/frag").select("event_id")
      .collect().map(_.getLong(0)).sorted
    val b = spark.read.parquet(s"$tmp/compact").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq)
    // and the scan fans out per file: compacted plan schedules fewer
    // partitions than the fragmented one
    def scanParts(path: String): Int = {
      val df = spark.read.parquet(path)
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head.inputRDD.getNumPartitions
    }
    assert(scanParts(s"$tmp/compact") < scanParts(s"$tmp/frag"))
  }

  test("bin count follows bytes/target") {
    val tmp = java.nio.file.Files.createTempDirectory("compact-bins").toFile
    tmp.deleteOnExit()
    val events = Tables.load(spark, sf, "events")
    events.repartition(32).write.parquet(s"$tmp/frag")
    val bytes = Compaction.dataFiles(s"$tmp/frag").map(_.length).sum
    // target of ~1/3 the bytes → 3 bins
    val stats = Compaction.compact(spark, s"$tmp/frag", s"$tmp/out", bytes / 3 + 1)
    assert(stats.filesAfter == 3, s"expected 3 files, got ${stats.filesAfter}")
  }
}
