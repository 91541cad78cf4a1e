package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Funnel, Similarity, TextAnalysis, Tokenize}

/** Directed unit coverage for the curation-pipeline breadth operators:
  * funnel stage sequencing, span-level exact dedup, and the Gopher rule
  * flags (the oracle rows tx9/dd13/fn1/fe2/io1-io3 gate the same code
  * differentially; these pin the semantic corner cases).
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def ev(rows: (java.lang.Long, String, String)*) =
    rows.toSeq.toDF("user_id", "event_type", "t")
      .select(col("user_id"), col("event_type"),
        col("t").cast("timestamp_ntz").as("ts"))

  test("funnel: stages must be strictly ordered in time") {
    // user 1 completes all 4 in order; user 2 clicks BEFORE viewing, so
    // the click can't count and they stall at stage 2
    val events = ev(
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:05:00"),
      (1L, "click", "2024-01-01 10:06:00"),
      (1L, "purchase", "2024-01-01 10:30:00"),
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "signup", "2024-01-01 10:00:00"),
      (2L, "view", "2024-01-01 10:10:00"))
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
      Seq("signup", "view", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 4L), (2L, 2L)))
    // t_last of user 1 is the purchase time; of user 2 the view time
    assert(out(0).getAs[java.time.LocalDateTime]("t_last").toString
      === "2024-01-01T10:30")
    assert(out(1).getAs[java.time.LocalDateTime]("t_last").toString
      === "2024-01-01T10:10")
  }

  test("funnel: same-timestamp events do not advance the funnel (strict >)") {
    val events = ev(
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:00:00"), // simultaneous — not after
      (1L, "view", "2024-01-01 11:00:00"))
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
      Seq("signup", "view")).collect()
    assert(out.head.getLong(1) === 2L)
    assert(out.head.getAs[java.time.LocalDateTime]("t_last").toString
      === "2024-01-01T11:00") // the 11:00 view, not the simultaneous one
  }

  test("funnel: users without the first stage are absent; NULL users dropped") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (null.asInstanceOf[java.lang.Long], "signup", "2024-01-01 10:00:00"))
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
      Seq("signup", "view"))
    assert(out.isEmpty)
  }

  test("funnel: stage frames re-anchor on the EARLIEST qualifying event") {
    // signup at 10:00; views at 10:30 and 10:10 — t2 must be 10:10, so a
    // click at 10:20 (after 10:10, before 10:30) counts
    val events = ev(
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:30:00"),
      (1L, "view", "2024-01-01 10:10:00"),
      (1L, "click", "2024-01-01 10:20:00"))
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
      Seq("signup", "view", "click")).collect()
    assert(out.head.getLong(1) === 3L)
  }

  test("spanDedup: exact duplicate document loses every span to the original") {
    val text = Seq.range(0, 24).map(i => s"w$i").mkString(" ") // 2 spans of 12
    val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", 12)
      .orderBy("doc_id").collect()
    assert(out(0) === Row(1L, 2L, 2L, text))
    assert(out(1) === Row(2L, 2L, 0L, ""))
  }

  test("spanDedup: partial overlap drops only the shared span") {
    val shared = Seq.range(0, 12).map(i => s"s$i").mkString(" ")
    val tail = Seq.range(0, 12).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, shared), (2L, s"$shared $tail")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", 12)
      .orderBy("doc_id").collect()
    assert(out(0) === Row(1L, 1L, 1L, shared))
    // doc 2: span 0 (= shared) cut, span 1 kept
    assert(out(1) === Row(2L, 2L, 1L, tail))
  }

  test("spanDedup: corpus order (doc_id, span_idx) picks the winner; " +
      "normalization unifies case and whitespace") {
    val df = Seq(
      (5L, "Alpha  Beta"), // extra whitespace + case
      (3L, "alpha beta")) // lower doc_id wins despite later input order
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", 12)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 1L) // doc 3 keeps
    assert(out(1).getLong(2) === 0L) // doc 5 loses its only span
  }

  test("spanDedup: within-document repetition dedups against itself") {
    val span = Seq.range(0, 12).map(i => s"r$i").mkString(" ")
    val df = Seq((1L, s"$span $span $span")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", 12).collect()
    assert(out.head === Row(1L, 3L, 1L, span))
  }

  test("spanDedup: empty and NULL texts yield no rows; ragged tail is a span") {
    val df = Seq((1L, "one two three"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", 12)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(out.head === Row(1L, 1L, 1L, "one two three"))
  }

  test("gopher rules: directed pass/fail per rule") {
    def flags(text: String): Map[String, Any] = {
      val cols = TextAnalysis.gopherFlags(col("text"))
      val row = Seq(Tuple1(text)).toDF("text")
        .select(cols.map { case (n, c) => c.as(n) }: _*).head()
      cols.map(_._1).zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
    }
    val good = (Seq.fill(6)("the quick brown fox jumps with vigor and") :+
      "that is a fine day to have it").mkString(" ")
    val g = flags(good)
    assert(g("word_count_ok") === true && g("stopword_ok") === true &&
      g("alpha_word_ok") === true && g("symbol_ratio_ok") === true &&
      g("mean_word_len_ok") === true)

    val short = flags("too short")
    assert(short("word_count_ok") === false)

    val symbols = flags(Seq.fill(60)("# word").mkString(" "))
    assert(symbols("symbol_ratio_ok") === false)

    val digits = flags(Seq.fill(60)("12345").mkString(" "))
    assert(digits("alpha_word_ok") === false)
    assert(digits("stop_hits") === 0L)

    val longWords = flags(Seq.fill(60)("pneumonoultramicroscopics").mkString(" "))
    assert(longWords("mean_word_len_ok") === false) // mean len 25 > 10
  }

  test("wordpiece segment: greedy longest match, char-fallback UNK") {
    val vocab = new java.util.HashSet[String]()
    Seq("un", "unab", "le", "ab", "a", "b").foreach(vocab.add)
    // greedy takes "unab" (longest at pos 0), not "un"+"ab"
    assert(Tokenize.segment("unable", vocab, 4) === ("unab|le", 2, 0))
    // no match at 'x' → [unk] consumes one char
    assert(Tokenize.segment("xab", vocab, 4) === ("[unk]|ab", 2, 1))
    assert(Tokenize.segment("zzz", vocab, 4) === ("[unk]|[unk]|[unk]", 3, 3))
    assert(Tokenize.segment("", vocab, 4) === ("", 0, 0))
  }

  test("wordpiece docPieceStats: segmentation cost rides the distinct-word table") {
    val df = Seq((1L, "table table the"), (2L, "the dup")).toDF("doc_id", "text")
    val vocab = Seq("ta", "b", "le", "th", "e", "d", "u")
    val out = Tokenize.docPieceStats(df, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
    // table = ta|b|le (3), the = th|e (2); doc1: 2*3+2 = 8 pieces
    assert(out(0) === Row(1L, 3L, 8L, 0L))
    // dup = d|u|[unk] (3 pieces, 1 unk); doc2: 2+3 = 5
    assert(out(1) === Row(2L, 2L, 5L, 1L))
  }

  test("unigram segment: fewest pieces, then highest unit frequency") {
    // distinct words xyxy/xy/yx: substring freqs x=4, y=4, xy=3, yx=2 —
    // so vocab = {x, y, xy} (singles always in, xy reaches minFreq=3)
    val words = Seq("xyxy", "xy", "yx", "xyxy").toDF("word")
    val got = Tokenize.unigramSegment(words, "word")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("xyxy") == ((4L, 2L, 6L, 2000000000L - 6L))) // xy+xy
    assert(got("xy") == ((2L, 1L, 3L, 1000000000L - 3L)))   // xy
    assert(got("yx") == ((2L, 2L, 8L, 2000000000L - 8L)))   // y+x (yx not in vocab)
    assert(got.size == 3)
  }

  test("unigram segment: words past the length cap are excluded; " +
      "unit frequency counts DISTINCT words, so repeats add nothing") {
    // "abcdef" repeated: distinct-word freq of every substring is 1,
    // so only singles are in vocab -> 6 pieces, freq_sum = 6
    val words = (Seq.fill(3)("abcdef") :+ ("z" * 30)).toDF("word")
    val got = Tokenize.unigramSegment(words, "word")
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map("abcdef" -> ((6L, 6L)))) // z*30 excluded by the cap
  }

  test("BPE training: merged symbols chain into later merges; " +
      "marker encoding prevents cross-boundary false matches") {
    // corpus: 'abab' x3, 'tab' x2 — step 1 merges (a,b) [freq 3*2+2=8].
    // After merging, 'tab' = "~t ~ab": a naive unmarked replace of
    // "a b" would have corrupted "~ta ~b"-style boundaries; step 2 must
    // see pair (ab,ab) from 'abab' [freq 3] and (t,ab) [freq 2] — argmax
    // is (ab,ab).
    val words = Seq(("abab", 3L), ("tab", 2L)).toDF("word", "n")
    val merges = graft.operators.Tokenize.bpeTrain(words, "word", "n", 2)
    assert(merges === Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L)))
  }

  test("BPE training: single-char words contribute no pairs; empty corpus no merges") {
    val words = Seq(("a", 5L), ("b", 3L)).toDF("word", "n")
    assert(graft.operators.Tokenize.bpeTrain(words, "word", "n", 3) === Seq())
  }

  test("TextRank: hub word outranks leaves; result invariant to doc order") {
    import graft.operators.TextRank
    val docs = Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha delta"))
      .toDF("doc_id", "text")
    val r = TextRank.textRank(docs, "text", iters = 5)
      .orderBy(desc("r"), asc("word")).collect()
    assert(r.head.getString(0) === "alpha") // degree-3 hub
    assert(r.head.getLong(1) > r.last.getLong(1))
    // permutation invariance: reversed input rows, identical ranks
    val r2 = TextRank.textRank(docs.orderBy(desc("doc_id")), "text", iters = 5)
      .orderBy(desc("r"), asc("word")).collect()
    assert(r.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq)
  }

  test("TopKByScore: bounded buffer, merge-order invariant, ties by id") {
    val agg = new graft.functions.Aggregators.TopKByScore(3)
    val items = Seq((0.5, 7L), (0.9, 3L), (0.9, 1L), (0.1, 9L), (0.7, 2L))
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    assert(whole === Seq((0.9, 1L), (0.9, 3L), (0.7, 2L)))
    // any split + merge gives the same answer
    for (cut <- 1 until items.size) {
      val (l, r) = items.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m === whole, s"merge at $cut")
    }
    // buffer never exceeds k
    assert(whole.size === 3)
  }

  test("knnJoinExact matches a window-rank reference on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Similarity.knnJoinExact(
      emb.filter(col("vec_id") % 25 === 0), emb, "embedding", "vec_id", 4)
    // reference: same scoring, window rank instead of the bounded agg
    val q = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    val ref = c.crossJoin(q).filter(col("qid") =!= col("nid"))
      .withColumn("cos", round(graft.functions.VectorOps
        .cosineNative(col("qv"), col("nv")), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 4)
      .select("qid", "rk", "nid")
    assert(out.select("qid", "rk", "nid").except(ref).isEmpty &&
      ref.except(out.select("qid", "rk", "nid")).isEmpty)
  }

  test("knnJoinExact plan: corpus side never shuffles before scoring " +
      "(broadcast cross join) and the top-k aggregate has a partial stage") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = Similarity.knnJoinExact(
      emb.filter(col("vec_id") % 25 === 0), emb, "embedding", "vec_id", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"no broadcast in:\n$plan")
    // partial aggregation: the ObjectHashAggregate appears twice
    // (partial map-side + final), so the shuffle carries k-bounded buffers
    val aggCount = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggCount >= 2, s"expected partial+final aggregate in:\n$plan")
  }

  test("quality audit: directed metrics, NULL predicate counts as violation") {
    import graft.operators.QualityAudit
    import graft.operators.QualityAudit.Check
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (2L, null), (null.asInstanceOf[java.lang.Long], "d"))
      .toDF("id", "s")
    val n = count(lit(1))
    val out = QualityAudit.audit(df, Seq(
      Check("01_id_completeness_pm", "id",
        QualityAudit.completeness(col("id")) * 1000L / n, 900L, 1000L),
      Check("02_id_dups", "id", n - QualityAudit.distinctness(col("id")),
        0L, 0L),
      Check("03_s_domain", "s",
        QualityAudit.violations(col("s").isin("a", "b")), 0L, 0L)))
      .collect()
    // 3 of 4 ids present = 750pm → fails [900,1000]
    assert(out(0) === Row("01_id_completeness_pm", "id", 750L, 900L, 1000L, 0L))
    // 4 rows - 2 distinct non-null... count_distinct ignores NULLs: 2
    assert(out(1) === Row("02_id_dups", "id", 2L, 0L, 0L, 0L))
    // 'd' violates, NULL s counts as violation (predicate not satisfied)
    assert(out(2) === Row("03_s_domain", "s", 2L, 0L, 0L, 0L))
  }

  test("quality audit: all checks ride ONE aggregation pass (single scan)") {
    import graft.operators.QualityAudit.Check
    import graft.operators.QualityAudit
    val events = spark.read.parquet(s"$sf/events.parquet")
    val n = count(lit(1))
    val plan = QualityAudit.audit(events, Seq(
      Check("a", "user_id", QualityAudit.completeness(col("user_id")), 0L, Long.MaxValue),
      Check("b", "value", QualityAudit.violations(col("value") >= 0), 0L, 0L)))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"expected one scan in:\n$plan")
  }

  test("gopher rules: the whole rule set is one shuffle-free projection") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select((col("doc_id") +: TextAnalysis.gopherFlags(col("text"))
        .map { case (n, c) => c.as(n) }): _*)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("DSIR selection: resample invariants and select→pack→mix consistency") {
    // imp2's acceptance rule, checked against its own output: the draw
    // is always below the acceptance threshold, the threshold is the
    // score scaled by the global max (so the top-scored doc is ALWAYS
    // kept — acceptance probability 1000/1000), and acceptance is
    // deterministic in doc_id (re-running selects the identical set).
    val imp2 = SparkEntry.queries("imp2_dsir_resample")(spark, sf).cache()
    val rows = imp2.collect()
    assert(rows.nonEmpty, "resample selected nothing")
    val maxScore = rows.map(_.getAs[Long]("score_pm")).max
    rows.foreach { r =>
      assert(r.getAs[Long]("draw_pm") < r.getAs[Long]("accept_pm"))
    }
    // the max-scored doc in the full scored set survives: its accept_pm
    // is exactly 1000 and every permille draw is < 1000
    val imp1 = SparkEntry.queries("imp1_dsir_select")(spark, sf).collect()
    val topDoc = imp1.head
    assert(rows.exists(_.getAs[Long]("doc_id") == topDoc.getAs[Long]("doc_id")),
      "globally top-scored doc was not selected")
    assert(maxScore <= topDoc.getAs[Long]("score_pm"))
    val again = SparkEntry.queries("imp2_dsir_resample")(spark, sf).collect()
    assert(again.map(_.getAs[Long]("doc_id")).toSet ===
      rows.map(_.getAs[Long]("doc_id")).toSet, "selection not deterministic")
    // imp3 composes the same selection: its per-source doc total equals
    // the imp2 survivor count restricted to docs with >0 tokens
    val imp3 = SparkEntry.queries("imp3_select_pack_mix")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("nt"))
    val expected = docs.join(imp2.select("doc_id"), Seq("doc_id"))
      .filter(col("nt") > 0).count()
    assert(imp3.map(_.getAs[Long]("n_docs")).sum === expected)
    // packing bounds: every doc occupies at least its own ceil(n/512)
    // windows, so slots >= max(n_docs, ceil(tokens/512)); and a doc of n
    // tokens can straddle at most (n-1) div 512 + 2 windows, so
    // slots <= tokens div 512 + 2*n_docs
    imp3.foreach { r =>
      val tok = r.getAs[Long]("tot_tokens"); val slots = r.getAs[Long]("win_slots")
      val nd = r.getAs[Long]("n_docs")
      assert(slots >= math.max(nd, (tok + 511) / 512) &&
        slots <= tok / 512 + 2 * nd,
        s"win_slots $slots outside bounds for n_docs=$nd tot_tokens=$tok")
    }
    // imp5: selection must move the feature distribution toward the
    // target — the whole point of importance resampling (checked at
    // both sf0.001 and sf0.01 before pinning; deterministic data)
    val imp5 = SparkEntry.queries("imp5_selection_shift")(spark, sf)
      .collect().head
    assert(imp5.getAs[Long]("l1_sel_tgt_ppm") <= imp5.getAs[Long]("l1_raw_tgt_ppm"),
      "selection did not move the corpus toward the target distribution")
    imp2.unpersist()
  }
}
