package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sources.Tables

/** Partition-pruning evidence at the bench replicas (Test/runMain): the
  * hp1 posture — a `lang` filter over the hive-partitioned documents
  * layout prunes whole directories at PLANNING time — proven at 10x and
  * 100x of sf0.1, not just the sf0.001 spec scale. For each dir it
  * builds (or reuses) the partitioned copy, plans the hp1 query, and
  * ASSERTS:
  *
  *   - partitionFilters present on the scan (planning-time pruning, not
  *     a post-scan filter);
  *   - exactly 1 of >1 hive partitions selected;
  *   - the scan's file count equals the files physically under lang=en/
  *     — i.e. files-read shrank to the selected partition's share, and
  *     keeps shrinking proportionally as the dataset scales.
  *
  * Prints one JSON line per dir; exits non-zero on any violated guard.
  *
  *   Usage: Test/runMain graft.PruneScale [dir ...]
  *          (default: /tmp/sfx10 /tmp/sfx100)
  */
object PruneScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/sfx10", "/tmp/sfx100")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val part = Tables.documentsByLang(spark, dir)
      val df = SparkEntry.queries("hp1_partition_prune")(spark, dir)
      val scans = df.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, s"no file scan in hp1 plan at $dir")
      val scan = scans.head
      assert(scan.partitionFilters.nonEmpty,
        s"no PartitionFilters on the partitioned scan at $dir")
      val selParts = scan.selectedPartitions.partitionCount
      val selFiles = scan.selectedPartitions.totalNumberOfFiles
      val selBytes = scan.selectedPartitions.totalFileSize
      // ground truth from the filesystem: data files per lang directory
      val root = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft-partitioned/" +
          dir.replaceAll("[^A-Za-z0-9.]+", "_") + "/documents_by_lang")
      val langDirs = root.listFiles().filter(f =>
        f.isDirectory && f.getName.startsWith("lang="))
      def dataFiles(d: java.io.File): Long =
        d.listFiles().count(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
      val totalFiles = langDirs.map(dataFiles).sum
      val enFiles = langDirs.filter(_.getName == "lang=en").map(dataFiles).sum
      assert(selParts == 1 && langDirs.length > 1,
        s"pruning selected $selParts of ${langDirs.length} partitions at $dir")
      assert(selFiles == enFiles && selFiles < totalFiles,
        s"scan lists $selFiles files, lang=en holds $enFiles of $totalFiles at $dir")
      val rows = df.count() // the pruned plan must still answer correctly
      assert(rows > 0, s"hp1 returned no rows at $dir")
      println(s"""{"prune":"$dir","langParts":${langDirs.length},""" +
        s""""selectedParts":$selParts,"totalFiles":$totalFiles,""" +
        s""""filesRead":$selFiles,"bytesRead":$selBytes,"rows":$rows}""")
    }
    spark.stop()
  }
}
