package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Decontam}
import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.AggSpec
import graft.sources.Tables
import graft.streaming.IntakeMaintenance

/** Streaming decontamination-intake parity: stats and census maintained
  * over a crawl stream must equal the batch pipeline over the same
  * documents, regardless of micro-batching — and the corpus is only
  * ever scanned at handle construction.
  */
class IntakeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val statKeys = Seq("lang")
  private val statAggs = Seq(AggSpec("n_chars", "sum", "chars_sum"),
    AggSpec("n_chars", "count", "n_docs"))

  private def docsToks = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("lang"), col("n_chars"),
      Corpus.words(col("text")).as("toks"))

  private def batchRows: Seq[(Long, String, Long, String)] =
    Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 17 === 0 ||
        (col("doc_id") % 3 === 0 && col("doc_id") % 5 === 0))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
        col("n_chars"), col("text"))
      .as[(Long, String, Long, String)].collect().toSeq.sortBy(_._1)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("streamed intake == batch pipeline, invariant to micro-batching") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = docsToks.filter(col("doc_id") % 3 =!= 0).localCheckpoint()

    // the batch referee: one-shot processBatch over the whole stream
    val st = Decontam.buildIntake(corpus, "doc_id", "toks",
      statKeys, statAggs, 9, 10)
    val allBatch = docsToks
      .filter(col("doc_id") % 17 === 0 ||
        (col("doc_id") % 3 === 0 && col("doc_id") % 5 === 0))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
        col("n_chars"), col("toks"))
    val ref = Decontam.processBatch(st, allBatch, "doc_id", "toks",
      statKeys, statAggs)
    val refStats = rows(IncrementalAgg.publishCounting(ref.stats,
      statKeys, statAggs))
    val refCensus = (rows(ref.quarantined.groupBy("lang")
        .agg(count(lit(1)).as("n"))),
      rows(ref.admitted.groupBy("lang").agg(count(lit(1)).as("n"))))

    for (nSplits <- Seq(3, 5)) {
      val im = new IntakeMaintenance(spark, corpus, "doc_id", "toks",
        statKeys, statAggs, 9, 10)
      val ms = MemoryStream[(Long, String, Long, String)]
      val q = im.attach(ms.toDF().toDF("doc_id", "lang", "n_chars", "text")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          Corpus.words(col("text")).as("toks"))).start()
      try {
        val docs = batchRows
        docs.grouped(math.max(1, docs.size / nSplits)).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
        assert(rows(im.statsNow) === refStats,
          s"streamed stats diverged from batch at $nSplits splits")
        val cen = im.censusNow.get
        assert(rows(cen.select(col("lang"),
            col("n_quarantined").as("n")).filter(col("n") > 0)) ===
          refCensus._1, s"quarantine census diverged at $nSplits splits")
        assert(rows(cen.select(col("lang"),
            col("n_admitted").as("n")).filter(col("n") > 0)) ===
          refCensus._2, s"admission census diverged at $nSplits splits")
      } finally q.stop()
    }
  }
}
