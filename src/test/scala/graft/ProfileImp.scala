package graft

/** Scale measurement for the DSIR selection family (Test/runMain) —
  * committed as IMP_MEASURE.json.
  *
  * The claim to quantify: the selection pipeline is one corpus pass
  * plus constant-grain (256-row) model algebra, so imp1 (score+top-k)
  * and imp3 (select → pack → mix) should scale ~linearly in corpus
  * rows, with the model/ratio stages contributing a constant. Measured
  * warm (min of 2) at sf0.01 and its 10×/100× replicas.
  */
object ProfileImp {
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

    val scales = Seq(("1x", base), ("10x", "/tmp/sfx10"), ("100x", "/tmp/sfx100"))
      .filter { case (_, d) => new java.io.File(s"$d/documents.parquet").exists() }
    val out = scales.map { case (label, d) =>
      val nDocs = graft.sources.Tables.load(spark, d, "documents").count()
      val (sel, impSec) = timeWarm(
        SparkEntry.queries("imp1_dsir_select")(spark, d).count())
      val (srcRows, pipeSec) = timeWarm(
        SparkEntry.queries("imp3_select_pack_mix")(spark, d).count())
      s"""{"scale":"$label","docs":$nDocs,"imp1_rows":$sel,""" +
        s""""imp1_sec":$impSec,"imp3_rows":$srcRows,"imp3_sec":$pipeSec}"""
    }
    val json = s"""{"metric":"imp_scaling","scales":[${out.mkString(",")}]}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/IMP_MEASURE.json"), json + "\n")
    spark.stop()
  }
}
