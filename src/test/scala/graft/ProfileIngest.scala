package graft

/** Scale measurement for the ingestion family added this round
  * (Test/runMain) — committed as INGEST_MEASURE.json.
  *
  * The claim to quantify: content-defined chunking (dd21) is corpus-
  * characters-grain with a constant-width hash window — one scan, one
  * fp exchange — and the container walks (mm8 tar, mm7 WARC) are one
  * mapPartitions pass whose per-row cost is the payload byte count, so
  * all three should scale ~linearly in corpus bytes. Measured warm
  * (min of 2) at sf0.01 and its 10x/100x replicas, plus — when the
  * bench's 1000x replica of sf0.1 is on disk — a 10000x-of-base arm
  * (~5M docs, ~1.5 GB of text): the point where the linear claim is
  * carried by data that no longer hides in a few scan partitions.
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeWarm(f: => Long): (Long, Double) = {
      f // warmup
      var best = Double.MaxValue; var rows = 0L
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        rows = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (rows, math.round(best * 1000) / 1000.0)
    }

    val scales = Seq(("1x", base), ("10x", "/tmp/sfx10"),
      ("100x", "/tmp/sfx100"), ("10000x", "/tmp/bsx1000"))
      .filter { case (_, d) => new java.io.File(s"$d/documents.parquet").exists() }
    val out = scales.map { case (label, d) =>
      val docs = graft.sources.Tables.load(spark, d, "documents")
      val nDocs = docs.count()
      val chars = docs.selectExpr("CAST(sum(length(text)) AS BIGINT)")
        .head().getLong(0)
      val (dd21Rows, dd21Sec) = timeWarm(
        SparkEntry.queries("dd21_cdc_chunks")(spark, d).count())
      val (mm8Rows, mm8Sec) = timeWarm(
        SparkEntry.queries("mm8_tar_meta")(spark, d).count())
      val (mm7Rows, mm7Sec) = timeWarm(
        SparkEntry.queries("mm7_warc_meta")(spark, d).count())
      s"""{"scale":"$label","docs":$nDocs,"chars":$chars,""" +
        s""""dd21_rows":$dd21Rows,"dd21_sec":$dd21Sec,""" +
        s""""mm8_rows":$mm8Rows,"mm8_sec":$mm8Sec,""" +
        s""""mm7_rows":$mm7Rows,"mm7_sec":$mm7Sec}"""
    }
    val json = s"""{"metric":"ingest_scaling","scales":[${out.mkString(",")}]}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/INGEST_MEASURE.json"), json + "\n")
    spark.stop()
  }
}
