package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Z-order pruning evidence at the bench replicas (Test/runMain): the
  * zo1 box predicate over the z-ordered events copy must read a small
  * fraction of the parquet rows the natural (ingest-order) layout
  * reads — row-group min/max skipping on BOTH box dimensions, measured
  * by the scan's numOutputRows at 10x and 100x of sf0.1, not just the
  * spec's synthetic grid. Prints one JSON line per dir; exits non-zero
  * if the z layout fails to beat the natural layout.
  *
  *   Usage: Test/runMain graft.ZOrderScale [dir ...]
  *          (default: /tmp/sfx10 /tmp/sfx100)
  */
object ZOrderScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/sfx10", "/tmp/sfx100")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def scanRows(df: DataFrame): Long = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "no file scan in plan")
      scans.map(_.metrics("numOutputRows").value).sum
    }
    dirs.foreach { dir =>
      val z = Tables.eventsZOrdered(spark, dir) // one-time layout build per dir
      val orig = Tables.load(spark, dir, "events")
      // a 10%-of-rows × 10%-of-rows box (equi-depth: bounds from
      // quantiles, so "10%" means selectivity, not a slice of a skewed
      // value range): wide enough that row-group granularity isn't the
      // floor, selective enough that two-dimensional skipping matters.
      // (The replicas' natural layout is accidentally user-clustered —
      // ScaleUp offsets ids per copy — so it prunes the user dimension
      // near-perfectly; the z layout must still win by ALSO skipping
      // the value dimension.)
      val Array(ulo, uhi) = orig.select(col("user_id").cast("double").as("u"))
        .na.drop("any").stat.approxQuantile("u", Array(0.45, 0.55), 0.001)
      val Array(vlo, vhi) = orig.select(col("value").as("v"))
        .na.drop("any").stat.approxQuantile("v", Array(0.45, 0.55), 0.001)
      // integral literals for the long column: a double comparison would
      // wrap user_id in a cast and the predicate would NOT push down
      def box(df: DataFrame): DataFrame = df
        .filter(col("user_id").between(ulo.toLong, uhi.toLong) &&
          col("value").between(vlo, vhi))
        .select("user_id", "value")
      // value-only slice: the natural layout's user clustering is
      // useless here (value is scattered within every copy) — the z
      // layout still skips, which is the multi-dimensional claim: ONE
      // layout answers range predicates on ANY curve dimension
      def slice(df: DataFrame): DataFrame = df
        .filter(col("value").between(vlo, vhi)).select("user_id", "value")
      val total = orig.count()
      val zRead = scanRows(box(z))
      val natRead = scanRows(box(orig))
      val zSlice = scanRows(slice(z))
      val natSlice = scanRows(slice(orig))
      val zHits = box(z).count()
      assert(zHits == box(orig).count(),
        s"layouts disagree on the box answer at $dir")
      assert(slice(z).count() == slice(orig).count(),
        s"layouts disagree on the slice answer at $dir")
      assert(zRead < natRead,
        s"z layout read $zRead rows, natural layout read $natRead at $dir")
      assert(zSlice * 2 <= natSlice,
        s"value slice: z read $zSlice, natural read $natSlice at $dir")
      def ratio(a: Long, b: Long): Double =
        math.round(a.toDouble / math.max(b, 1) * 10) / 10.0
      println(s"""{"zorder":"$dir","rows":$total,"boxHits":$zHits,""" +
        s""""zRowsRead":$zRead,"naturalRowsRead":$natRead,""" +
        s""""boxSkipRatio":${ratio(natRead, zRead)},""" +
        s""""zSliceRead":$zSlice,"naturalSliceRead":$natSlice,""" +
        s""""sliceSkipRatio":${ratio(natSlice, zSlice)}}""")
    }
    spark.stop()
  }
}
