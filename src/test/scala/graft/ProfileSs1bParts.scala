package graft

import org.apache.spark.sql.DataFrame

/** Decompose ss1b's warm per-execution constant (the BENCHSCALE >2×
  * row) into its named parts — the round-16 directive: "without the
  * decomposition there is no targeted fix".
  *
  *   Test/runMain graft.ProfileSs1bParts [sfDir]
  *
  * Per warm execution the query body pays, in order:
  *   layout_check — ensureLshBucketLayout: fingerprint walk of the
  *                  source dir + _SUCCESS stat (driver-side file I/O)
  *   relation     — spark.read.parquet(layout): partition discovery +
  *                  parquet footer schema inference (driver-side; the
  *                  file-status cache absorbs repeat listings but NOT
  *                  schema inference or partition-spec re-derivation)
  *   source_rel   — Tables.load of the SOURCE embeddings table the
  *                  query body also constructs (same class of cost)
  *   plan         — analysis + optimization + physical planning +
  *                  partition pruning of the probe query
  *   job          — the actual probe job: scan pruned buckets, codegen
  *                  cosine, TakeOrderedAndProject merge on the driver
  *
  * Emits one JSON line with min-of-N seconds per part plus the full
  * query's warm time measured the bench's way, so the parts can be
  * checked against the whole.
  */
object ProfileSs1bParts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    import graft.sources.Tables

    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def minOf(n: Int)(f: => Double): Double = Seq.fill(n)(f).min

    // warmup: builds the layout if missing, JIT, codegen caches
    SparkEntry.queries("ss1b_cosine_topk_indexed")(spark, sfDir).count()
    SparkEntry.queries("ss1b_cosine_topk_indexed")(spark, sfDir).count()

    val N = 7
    val whole = minOf(N)(timed(
      SparkEntry.queries("ss1b_cosine_topk_indexed")(spark, sfDir).count())._1)

    val layoutCheck = minOf(N)(timed(
      Similarity.ensureLshBucketLayout(
        Tables.load(spark, sfDir, "embeddings"), "embedding", sfDir))._1)

    val sourceRel = minOf(N)(timed(Tables.load(spark, sfDir, "embeddings"))._1)

    val idxPath = Similarity.ensureLshBucketLayout(
      Tables.load(spark, sfDir, "embeddings"), "embedding", sfDir)
    val relation = minOf(N)(timed(spark.read.parquet(idxPath))._1)

    // plan: build the probe query over a FRESH relation each time and
    // force physical planning without running a job
    def probeQuery(idx: DataFrame): DataFrame = {
      import org.apache.spark.sql.functions._
      // ss1b's committed external query vector (seed-7 gaussian),
      // reconstructed the way LlmData builds it
      val query = {
        val rnd = new scala.util.Random(7)
        Array.fill(64)(rnd.nextGaussian().toFloat)
      }
      val planes = Similarity.hyperplanes(64, 4)
      val qBits = planes.zipWithIndex.map { case (p, i) =>
        if (p.zip(query).map { case (a, b) => a * b.toDouble }.sum >= 0.0)
          1L << i
        else 0L
      }.sum
      val probes = qBits +: (0 until 4).map(i => qBits ^ (1L << i))
      Similarity.bruteForceTopK(
        idx.filter(col("bucket").isin(probes: _*)),
        "embedding", "vec_id", query, 10)
        .select("vec_id")
    }
    val plan = minOf(N)(timed {
      probeQuery(spark.read.parquet(idxPath))
        .groupBy().count().queryExecution.executedPlan
    }._1) - relation

    // job: re-run the ACTION on a pre-planned query (relation + plan
    // already paid) — the residual is job submit + tasks + merge
    val prePlanned = probeQuery(spark.read.parquet(idxPath)).groupBy().count()
    prePlanned.collect()
    val job = minOf(N)(timed(prePlanned.collect())._1)

    val json =
      f"""{"metric":"ss1b_parts","sf":"$sfDir","warm_whole_sec":$whole%.4f,""" +
        f""""layout_check_sec":$layoutCheck%.4f,"source_relation_sec":$sourceRel%.4f,""" +
        f""""layout_relation_sec":$relation%.4f,"plan_sec":$plan%.4f,""" +
        f""""job_sec":$job%.4f,""" +
        f""""parts_note":"whole ~= layout_check + source_relation + layout_relation + plan + job; residual is query construction + count() re-plan"}"""
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
    spark.stop()
    sys.exit(0)
  }
}
