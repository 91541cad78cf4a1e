package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
