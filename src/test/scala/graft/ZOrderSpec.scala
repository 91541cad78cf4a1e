package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.ZOrder
import graft.sources.Tables

/** Z-order layout: the curve math must interleave exactly, the layout
  * must be a row-preserving permutation, and — the point of the
  * operator — a box predicate over the z-ordered layout must read
  * FEWER rows out of parquet (row-group min/max skipping on both
  * dimensions) than the same predicate over a single-column sort.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits exactly") {
    // (a=0b101, b=0b011, 3 bits) -> bit b of col i at position b*2+i:
    // a bits at even positions (1,0,1 -> 1 + 16), b at odd (1,1,0 -> 2 + 8)
    val row = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.zvalue(3, col("a"), col("b")).as("z")).head()
    assert(row.getLong(0) == (1 + 16 + 2 + 8))
    // single column degenerates to identity on the low bits
    val id = Seq((13L)).toDF("a")
      .select(ZOrder.zvalue(4, col("a")).as("z")).head()
    assert(id.getLong(0) == 13L)
  }

  test("zvalue is NULL when any dimension is NULL") {
    val r = Seq((java.lang.Long.valueOf(1L), null: java.lang.Long))
      .toDF("a", "b").select(ZOrder.zvalue(3, col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("bucketize clamps to [0, 2^bits) and degrades constant columns to 0") {
    val r = Seq((-5.0, 0.5, 99.0)).toDF("lo", "mid", "hi")
      .select(ZOrder.bucketize(col("lo"), 0, 1, 4),
        ZOrder.bucketize(col("mid"), 0, 1, 4),
        ZOrder.bucketize(col("hi"), 0, 1, 4),
        ZOrder.bucketize(col("mid"), 7, 7, 4)) // constant range
      .head()
    assert(r.getLong(0) == 0 && r.getLong(1) == 8 && r.getLong(2) == 15)
    assert(r.getLong(3) == 0)
  }

  test("layout is a row-preserving permutation") {
    val df = Tables.load(spark, sf, "events")
    val laid = ZOrder.layout(df, Seq("user_id", "value"), bits = 8)
    assert(laid.columns.toSeq == df.columns.toSeq)
    val a = df.select("event_id").collect().map(_.toSeq).sortBy(_.toString)
    val b = laid.select("event_id").collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("box predicate reads fewer parquet rows on z-order than on linear sort") {
    val tmp = java.nio.file.Files.createTempDirectory("zorder-spec").toFile
    tmp.deleteOnExit()
    // 256x256 uniform grid, 64 files of 1024 rows: a linear sort by `a`
    // makes each file an (a-span=4, b-span=256) stripe; the z layout
    // makes each an aligned 32x32 tile. One row group per file either
    // way — identical file count and stats granularity, only row ORDER
    // differs.
    val parts = 64
    val grid = spark.range(256L * 256L)
      .select((col("id") % 256).as("a"), expr("id div 256").as("b"))
    // min/max buckets: on a uniform grid they equal rank space but stay
    // exactly tile-aligned — approxQuantile boundaries wobble run-to-run
    // (partition merge order) and can smear tiles across the box edge
    ZOrder.layout(grid, Seq("a", "b"), bits = 8, numPartitions = parts,
        rankSpace = false)
      .write.mode("overwrite").parquet(s"$tmp/z")
    grid.repartitionByRange(parts, col("a"))
      .sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$tmp/linear")
    def box(df: DataFrame) = df
      .filter(col("a").between(0, 63) && col("b").between(0, 63))
    val zRead = scanOutputRows(box(spark.read.parquet(s"$tmp/z")))
    val linRead = scanOutputRows(box(spark.read.parquet(s"$tmp/linear")))
    // answers must agree…
    assert(box(spark.read.parquet(s"$tmp/z")).count() ==
      box(spark.read.parquet(s"$tmp/linear")).count())
    assert(box(spark.read.parquet(s"$tmp/z")).count() == 64L * 64L)
    // …but the z layout's row groups are narrow in BOTH dimensions: the
    // 64x64 box intersects ~4 z tiles (~4k rows) vs 16 linear stripes
    // (~16k rows, every b in the a-range). Require at least a 2x win so
    // partition-boundary slop can't flake the assertion.
    assert(zRead * 2 <= linRead,
      s"z-order read $zRead rows, linear sort read $linRead")
  }
}
