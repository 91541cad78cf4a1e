package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table loaders for the driver-generated star schema
  * (`/root/repo/TESTDATA.md`). At 100 TB these would be partitioned
  * directories; the API stays the same — `spark.read.parquet` over a
  * directory prunes partitions and pushes filters/column selection into
  * the scan (verify via `PushedFilters`/`ReadSchema` in `.explain`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Parquet TIMESTAMP(NANOS) (the events table) is unsupported by Spark's
    // vectorized reader; read as raw nanos and truncate to micros — the
    // same ns→µs truncation DuckDB applies. Integer `div` keeps the full
    // 64-bit precision (a double round-trip would corrupt ~1.7e18 values).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        df.withColumn("ts",
          expr("timestamp_micros(ts div 1000)").cast(TimestampNTZType))
      case None => df
    }
  }
}
