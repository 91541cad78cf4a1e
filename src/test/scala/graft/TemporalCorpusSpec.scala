package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Corpus, RangeJoin}
import graft.sources.Tables

/** Range-join (grid + broadcast hybrid) and corpus-operator behaviors the
  * oracle queries don't pin down: path equivalence vs the naive
  * nested-loop form, edge cases, and internal-column collision safety.
  */
class TemporalCorpusSpec extends SparkSpec {

  private def events = Tables.load(spark, sf, "events")
    .select(col("event_id"), col("ts"), col("event_type"))

  private def windows = events
    .filter(col("event_type") === "error")
    .select(col("event_id").as("win_id"), col("ts").as("ws"),
      (col("ts") + when(col("event_id") % 100 === 0, expr("INTERVAL 2 DAYS"))
        .otherwise(expr("INTERVAL 45 MINUTES"))).as("we"))

  test("range join equals the naive BETWEEN join (grid + broadcast hybrid)") {
    val pts = events.select(col("event_id"), col("ts"))
    val got = RangeJoin.pointInInterval(pts, "ts", windows, "ws", "we",
        binWidthMicros = 30L * 60 * 1000000, maxBinsPerInterval = 48)
      .select("win_id", "event_id").collect().map(_.toSeq).toSet
    val naive = pts.crossJoin(windows)
      .filter(col("ts") >= col("ws") && col("ts") <= col("we"))
      .select("win_id", "event_id").collect().map(_.toSeq).toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("grid path emits no nested-loop join; hybrid long path broadcasts") {
    val pts = events.select(col("event_id"), col("ts"))
    // all-short intervals: pure grid — the plan must contain no
    // BroadcastNestedLoopJoin and no CartesianProduct
    val short = windows.filter(col("win_id") % 100 =!= 0)
    val gridPlan = RangeJoin.pointInInterval(pts, "ts", short, "ws", "we",
        binWidthMicros = 30L * 60 * 1000000, longTail = false)
      .queryExecution.executedPlan.toString
    assert(!gridPlan.contains("BroadcastNestedLoopJoin"), gridPlan)
    assert(!gridPlan.contains("CartesianProduct"), gridPlan)
  }

  test("interval overlap equals the naive inequality join (hybrid paths)") {
    // left: error windows incl. rare 2-day long tails; right: purchase
    // windows, all short — exercises grid, longL×R broadcast, and the
    // first-shared-bin dedup guard (multi-bin overlaps must not duplicate)
    val l = windows.select(col("win_id").as("lid"), col("ws").as("ls"), col("we").as("le"))
    val r = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("rid"), col("ts").as("rs"),
        (col("ts") + expr("INTERVAL 90 MINUTES")).as("re"))
    val got = RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re",
        binWidthMicros = 30L * 60 * 1000000, maxBinsPerInterval = 48)
      .select("lid", "rid").collect().map(_.toSeq)
    val naive = l.crossJoin(r)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(_.toSeq)
    assert(got.length === got.toSet.size, "pair emitted more than once")
    assert(got.toSet === naive.toSet)
    assert(got.nonEmpty)
  }

  test("interval overlap grid path emits no nested-loop join") {
    val l = windows.filter(col("win_id") % 100 =!= 0)
      .select(col("win_id").as("lid"), col("ws").as("ls"), col("we").as("le"))
    val r = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("rid"), col("ts").as("rs"),
        (col("ts") + expr("INTERVAL 90 MINUTES")).as("re"))
    val plan = RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re",
        binWidthMicros = 30L * 60 * 1000000, longTail = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("interval overlap rejects colliding column names") {
    val l = windows
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, "ws", "we", l, "ws", "we",
        binWidthMicros = 1000000L)
    }
  }

  test("range join survives a user column named _bin") {
    val pts = events.select(col("event_id"), col("ts"), lit(7).as("_bin"))
    val got = RangeJoin.pointInInterval(pts, "ts", windows, "ws", "we",
        binWidthMicros = 30L * 60 * 1000000)
      .select("win_id", "event_id", "_bin").collect()
    assert(got.nonEmpty && got.forall(_.getInt(2) == 7))
  }

  test("shingles: fewer than n words → empty; exactly n → one") {
    import spark.implicits._
    val df = Seq("a b", "a b c", "  a   b  c ", "", "x")
      .toDF("text")
      .select(Corpus.shingles(col("text"), 3).as("g"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(Nil, List("a b c"), List("a b c"), Nil, Nil))
  }

  test("chunk: ragged tail, short doc, stride wider than doc") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g"), (2L, "a b"), (3L, " "))
      .toDF("doc_id", "text")
    val got = Corpus.chunk(df, "text", chunkSize = 3, stride = 2)
      .select("doc_id", "chunk_idx", "n_tokens", "chunk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .toList.sorted
    assert(got == List(
      (1L, 0, 3L, "a b c"), (1L, 1, 3L, "c d e"), (1L, 2, 3L, "e f g"),
      (1L, 3, 1L, "g"),
      (2L, 0, 2L, "a b")))
  }

  test("chunks cover every token when stride <= chunkSize") {
    val docs = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 50 === 0).select(col("doc_id"), col("text"))
    val chunked = Corpus.chunk(docs, "text", chunkSize = 32, stride = 24)
    // token mass: sum over chunks of (n_tokens - overlap carried) must
    // equal the doc token count; simpler invariant — last chunk ends at
    // the doc's last word and first chunk starts at word 1
    val perDoc = chunked.groupBy("doc_id")
      .agg(max(col("chunk_idx") * 24 + col("n_tokens")).as("covered"),
        count(lit(1)).as("nchunks"))
      .join(docs.select(col("doc_id"),
        size(Corpus.words(col("text"))).cast(LongType).as("ntok")), "doc_id")
    assert(perDoc.filter(col("covered") =!= col("ntok")).count() == 0)
  }

  test("contamination finds the planted copy with full-overlap count") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 50)
    val probes = docs.filter(col("doc_id") === 10)
      .select((col("doc_id") + 999).as("probe_id"), col("text").as("ptext"))
    val hits = Corpus.contamination(docs, "doc_id", "text",
        probes, "probe_id", "ptext", n = 5, minOverlap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val self = hits.filter(_._1 == 10L)
    val expected = docs.filter(col("doc_id") === 10)
      .select(size(array_distinct(Corpus.shingles(col("text"), 5))))
      .head().getInt(0).toLong
    assert(self.map(_._3).toList == List(expected))
  }

  test("termStats: df bounded by corpus size, tf sums to token count") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val stats = Corpus.termStats(docs, "doc_id", "text")
    assert(stats.filter(col("df") > nDocs).count() == 0)
    val tfSum = stats.agg(sum("tf")).head().getLong(0)
    val tokSum = docs.select(sum(size(Corpus.words(col("text")))))
      .head().getLong(0)
    assert(tfSum == tokSum)
  }

  test("boilerplate trigrams each occur in >= minDocs distinct docs") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val bp = Corpus.boilerplate(docs, "doc_id", "text", n = 3, minDocs = 5)
    // recount each reported gram the slow way and check the threshold
    val recount = docs
      .select(col("doc_id"),
        explode(array_distinct(Corpus.shingles(col("text"), 3))).as("g"))
      .groupBy("g").agg(countDistinct("doc_id").as("truth"))
    val joined = bp.join(recount, bp("gram") === recount("g"))
    assert(joined.filter(col("truth") < 5 || col("truth") =!= col("ndocs"))
      .count() == 0)
    assert(bp.count() > 0)
  }
}
