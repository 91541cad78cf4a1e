package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.{Decontam, IncrementalAgg}
import graft.operators.IncrementalAgg.AggSpec
import graft.sources.Tables

/** The composed decontamination intake: quarantine/admit correctness
  * against a brute-force contamination oracle, stats parity with a full
  * recompute over corpus ∪ admitted, and the plan property the pipeline
  * exists for — the corpus files are scanned at build only, never by
  * the per-batch probe/quarantine/refresh plans.
  */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private val statKeys = Seq("lang")
  private val statAggs = Seq(AggSpec("n_chars", "sum", "chars_sum"),
    AggSpec("n_chars", "count", "n_docs"))

  test("probe/quarantine/refresh plans never rescan the corpus files") {
    val tmp = java.nio.file.Files.createTempDirectory("decontam").toString
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        graft.operators.Corpus.words(col("text")).as("toks"))
      .filter(col("doc_id") % 3 =!= 0)
      .write.parquet(s"$tmp/corpusfiles")
    Tables.load(spark, sf, "documents")
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
        col("n_chars"), graft.operators.Corpus.words(col("text")).as("toks"))
      .filter(col("doc_id") % 17 === 0 || col("doc_id") % 4 === 1)
      .write.parquet(s"$tmp/batchfiles")

    val st = Decontam.buildIntake(spark.read.parquet(s"$tmp/corpusfiles"),
      "doc_id", "toks", statKeys, statAggs, tNum = 9, tDen = 10)
    val res = Decontam.processBatch(st,
      spark.read.parquet(s"$tmp/batchfiles"), "doc_id", "toks",
      statKeys, statAggs)

    def scans(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s
      }.flatMap(_.relation.location.inputFiles)
    for ((name, df) <- Seq("hits" -> res.hits,
        "quarantined" -> res.quarantined, "admitted" -> res.admitted,
        "stats" -> res.stats)) {
      val sc = scans(df)
      assert(!sc.exists(_.contains("corpusfiles")),
        s"$name plan rescans the corpus: ${sc.mkString(", ")}")
    }
    // the batch IS read by the per-batch plans (the honest cost)
    assert(scans(res.hits).exists(_.contains("batchfiles")))
  }

  test("a saved+loaded intake state processes a batch identically") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        graft.operators.Corpus.words(col("text")).as("toks"))
    val corpus = docs.filter(col("doc_id") % 3 =!= 0).localCheckpoint()
    val batch = docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
        col("n_chars"), col("toks")).localCheckpoint()
    val st = Decontam.buildIntake(corpus, "doc_id", "toks",
      statKeys, statAggs, 9, 10)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-intake").toString
    Decontam.saveIntake(st, dir)
    val st2 = Decontam.loadIntake(spark, dir)
    def outcome(s: Decontam.IntakeState) = {
      val r = Decontam.processBatch(s, batch, "doc_id", "toks",
        statKeys, statAggs)
      (r.quarantined.select("doc_id").collect().map(_.getLong(0)).toSet,
        IncrementalAgg.publishCounting(r.stats, statKeys, statAggs)
          .collect().map(_.toSeq).toSet)
    }
    assert(outcome(st2) === outcome(st),
      "cross-job intake diverged from the in-session state")
  }

  test("quarantine == brute-force contamination; stats == full recompute") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        graft.operators.Corpus.words(col("text")).as("toks"))
    val corpus = docs.filter(col("doc_id") % 3 =!= 0).localCheckpoint()
    val batch = docs
      .filter(col("doc_id") % 17 === 0 ||
        (col("doc_id") % 3 === 0 && col("doc_id") % 5 === 0))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
        col("n_chars"), col("toks")).localCheckpoint()

    val st = Decontam.buildIntake(corpus, "doc_id", "toks",
      statKeys, statAggs, 9, 10)
    val res = Decontam.processBatch(st, batch, "doc_id", "toks",
      statKeys, statAggs)

    // brute-force contamination set (the oracle's shape — DISTINCT
    // token sets, exactly what the kernel computes)
    val c = corpus.select(array_distinct(col("toks")).as("ctoks"))
    val bruteHits = batch
      .select(col("doc_id"), array_distinct(col("toks")).as("btoks"))
      .crossJoin(c)
      .withColumn("_i", size(array_intersect(col("btoks"), col("ctoks"))))
      .withColumn("_u",
        size(col("btoks")) + size(col("ctoks")) - col("_i"))
      .filter(col("_i") * 10 >= col("_u") * 9)
      .select("doc_id").distinct()
    val wantQuar = bruteHits.as[Long].collect().toSet
    val gotQuar = res.quarantined.select("doc_id").as[Long].collect().toSet
    assert(gotQuar === wantQuar)
    assert(wantQuar.nonEmpty, "no planted dup was caught — recalibrate")
    assert(res.admitted.count() > 0, "every batch doc quarantined")

    // stats parity: published state == full recompute over
    // corpus ∪ admitted
    val full = IncrementalAgg.aggregateCounting(
      corpus.select("lang", "n_chars")
        .unionByName(res.admitted.select("lang", "n_chars")),
      statKeys, statAggs)
    val pub = IncrementalAgg.publishCounting(res.stats, statKeys, statAggs)
    val pubFull = IncrementalAgg.publishCounting(full, statKeys, statAggs)
    assert(pub.collect().map(_.toSeq).toSet ===
      pubFull.collect().map(_.toSeq).toSet)
  }
}
