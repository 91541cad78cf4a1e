package graft

/** Scale measurement for the embedding-curation family (Test/runMain) —
  * committed as EMBED_MEASURE.json.
  *
  * The claim to quantify: prototype pruning is one component-grain
  * explode plus (clusters x dims)-bounded model algebra, and the D4
  * funnel adds the cluster-key anti-join whose pairwise work is bounded
  * by cluster size — so imp7 should scale ~linearly in vectors while
  * dd20 carries the per-cluster quadratic term the cluster catalog is
  * sized to bound (grow clusters at constant occupancy in production).
  * Measured warm (min of 2) at sf0.01 and its 10x/100x replicas.
  */
object ProfileEmbed {
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
      .filter { case (_, d) => new java.io.File(s"$d/embeddings.parquet").exists() }
    val out = scales.map { case (label, d) =>
      val nVecs = graft.sources.Tables.load(spark, d, "embeddings").count()
      val (imp7Rows, imp7Sec) = timeWarm(
        SparkEntry.queries("imp7_prototype_prune")(spark, d).count())
      val (dd20Rows, dd20Sec) = timeWarm(
        SparkEntry.queries("dd20_d4_pipeline")(spark, d).count())
      val (fe7Rows, fe7Sec) = timeWarm(
        SparkEntry.queries("fe7_random_projection")(spark, d).count())
      s"""{"scale":"$label","vecs":$nVecs,"imp7_rows":$imp7Rows,""" +
        s""""imp7_sec":$imp7Sec,"dd20_rows":$dd20Rows,"dd20_sec":$dd20Sec,""" +
        s""""fe7_rows":$fe7Rows,"fe7_sec":$fe7Sec}"""
    }
    val json = s"""{"metric":"embed_scaling","scales":[${out.mkString(",")}]}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/EMBED_MEASURE.json"), json + "\n")
    spark.stop()
  }
}
