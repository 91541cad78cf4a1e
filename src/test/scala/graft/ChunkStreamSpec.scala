package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables
import graft.streaming.ChunkMaintenance

/** Streaming CDC-chunk dedup parity: the fingerprint index folded over
  * a document stream must equal the batch chunking on the same corpus,
  * regardless of micro-batching, and the derived corpus stats must
  * match dd21's global totals.
  */
class ChunkStreamSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"))
    .as[(Long, String)].collect().toSeq.sortBy(_._1)

  private def batchIndex() =
    Dedup.contentDefinedChunks(
        Tables.load(spark, sf, "documents").select("doc_id", "text"),
        "doc_id", "text")
      .select(md5(col("chunk")).as("fp"),
        (col("doc_id").cast("decimal(38,0)") * 4294967296L +
          col("chunk_idx")).as("grank"),
        length(col("chunk")).cast("long").as("chunk_len"))
      .groupBy("fp")
      .agg(min("grank").as("first_rank"), count(lit(1)).as("copies"),
        min("chunk_len").as("chunk_len"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDecimal(1).toBigInteger, r.getLong(2), r.getLong(3))))
      .toMap

  test("streamed chunk index == batch index under different batchings") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus()
    val expected = batchIndex()
    // nBatches = -4 drives the batches in REVERSE doc order: min/sum
    // are order-independent, so even late-arriving early documents must
    // fold to the identical index
    for (nBatches <- Seq(1, 4, -4)) {
      val ms = MemoryStream[(Long, String)]
      val cm = new ChunkMaintenance(spark)
      val q = cm.attach(ms.toDF().toDF("doc_id", "text")).start()
      try {
        val ordered = if (nBatches < 0) docs.reverse else docs
        ordered.grouped(math.max(1, docs.size / math.abs(nBatches))).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
        val got = cm.index.collect()
          .map(r => r.getString(0) ->
            ((r.getDecimal(1).toBigInteger, r.getLong(2), r.getLong(3)))).toMap
        assert(got === expected, s"index diverged at $nBatches batches")
      } finally q.stop()
    }
  }

  test("derived corpus stats match dd21's global totals") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val cm = new ChunkMaintenance(spark)
    val q = cm.attach(ms.toDF().toDF("doc_id", "text")).start()
    try {
      corpus().grouped(200).foreach { b => ms.addData(b); q.processAllAvailable() }
      val s = cm.dedupStats.head()
      val dd21 = SparkEntry.queries("dd21_cdc_chunks")(spark, sf)
        .agg(sum("n_chunks"), sum("chunk_bytes"), sum("dup_chunks"),
          sum("dup_bytes"))
        .head()
      assert(s.getLong(0) == dd21.getLong(0), "n_chunks")
      assert(s.getLong(2) == dd21.getLong(1), "chunk_bytes")
      assert(s.getLong(3) == dd21.getLong(2), "dup_chunks")
      assert(s.getLong(4) == dd21.getLong(3), "dup_bytes")
      // distinct chunks: the index IS the distinct set
      val distinctBatch = batchIndex().size.toLong
      assert(s.getLong(1) == distinctBatch, "distinct_chunks")
    } finally q.stop()
  }
}
