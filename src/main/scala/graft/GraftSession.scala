package graft

import org.apache.spark.sql.SparkSession

/** Session factory pinning the configuration the engine's SQL semantics
  * assume. The reference implements *non-ANSI* SQL semantics (invalid
  * cast → NULL, x/0 → NULL — ref: slide_test/suite.py:172-174,1708-1794);
  * Spark 4 defaults to ANSI mode, so we must switch it off. Timestamps are
  * tz-naive canonical (ref: slide/utils.py:67-78) → UTC session + NTZ
  * inference.
  *
  * Scale posture (100 TB design, tested on local[32]): AQE on (runtime
  * coalescing, skew-join splitting), modest fixed shuffle parallelism for
  * local mode — on a real cluster AQE re-derives partition counts from
  * `advisoryPartitionSizeInBytes`, so these numbers are local-only.
  */
object GraftSession {
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")

  /** Apply the semantic configs to an externally-built session (used by
    * Verify/Bench whose master comes from the driver).
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      // split small single-file tables so scans parallelize across the
      // local cores; on a cluster the default 128m is right — this is a
      // local[32]-at-sf0.1 knob, not a scale setting
      .config("spark.sql.files.maxPartitionBytes", "4m")
}
