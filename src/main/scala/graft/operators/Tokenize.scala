package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subword tokenization: greedy longest-prefix-match segmentation against
  * a fixed vocabulary (the WordPiece decode rule of Devlin et al. 2018,
  * arXiv:1810.04805 — public algorithm; char-fallback instead of
  * whole-word UNK so the piece count is defined for every input and the
  * rule is SQL-replayable step by step).
  *
  * Scale shape: segmentation runs over the DISTINCT-word table, not the
  * corpus — the corpus explodes to (doc, word) pairs, words aggregate to
  * per-word counts (partial aggregation map-side), only the vocabulary-
  * sized distinct table enters the imperative kernel, and the result
  * joins back by word. At 100 TB the distinct table is the language's
  * vocabulary (bounded, ~millions), so kernel cost is independent of
  * corpus size; the vocab itself is a broadcast array.
  */
object Tokenize {

  /** Greedy longest-prefix segmentation of one word. Returns
    * (pieces joined by '|', piece count, unk char count); unmatched
    * positions consume one character as an "[unk]" piece.
    */
  private[graft] def segment(word: String, vocab: java.util.HashSet[String],
      maxLen: Int): (String, Int, Int) = {
    val sb = new StringBuilder
    var pos = 0
    var pieces = 0
    var unk = 0
    while (pos < word.length) {
      var l = math.min(maxLen, word.length - pos)
      var hit = -1
      while (l >= 1 && hit < 0) {
        if (vocab.contains(word.substring(pos, pos + l))) hit = l
        l -= 1
      }
      if (pieces > 0) sb.append('|')
      if (hit > 0) {
        sb.append(word.substring(pos, pos + hit))
        pos += hit
      } else {
        sb.append("[unk]")
        unk += 1
        pos += 1
      }
      pieces += 1
    }
    (sb.toString, pieces, unk)
  }

  /** Segment the distinct values of `wordCol` in `words`: adds
    * `pieces` (joined by '|'), `n_pieces`, `n_unk` columns.
    */
  def segmentWords(words: DataFrame, wordCol: String,
      vocab: Seq[String]): DataFrame = {
    val spark = words.sparkSession
    val vocabSet = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(vocabSet.add)
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    val bc = spark.sparkContext.broadcast((vocabSet, maxLen))
    val out = StructType(Seq(
      StructField(wordCol, StringType),
      StructField("pieces", StringType),
      StructField("n_pieces", LongType),
      StructField("n_unk", LongType)))
    val idx = words.schema.fieldIndex(wordCol)
    words.mapPartitions { rows =>
      val (vs, ml) = bc.value
      rows.map { r =>
        val w = r.getString(idx)
        val (p, np, nu) = segment(w, vs, ml)
        Row(w, p, np.toLong, nu.toLong)
      }
    }(org.apache.spark.sql.Encoders.row(out))
  }

  /** BPE merge learning (Sennrich et al. 2016, arXiv:1508.07909 — public
    * algorithm): `steps` iterations of count-adjacent-symbol-pairs →
    * merge the most frequent pair everywhere. Symbols are encoded
    * marker-prefixed ("~t ~a ~b"), which makes the merge a plain string
    * replace that CANNOT false-match inside a longer symbol (a pair
    * pattern "~a ~b" requires the marker directly before 'a', and inside
    * "~ta ~b" no '~a' substring exists) — the property that lets the
    * oracle replay training with the same replace.
    *
    * Scale shape: pair counting is one hash aggregate per step over the
    * weighted DISTINCT-word table (vocabulary-bounded) with map-side
    * partial sums; only the single argmax row comes to the driver per
    * step (the merge rule), and the merge application is a codegen'd
    * projection. k steps = k bounded jobs, no growing driver state.
    * Each step stacks one projection onto the symbol frame's lineage, so
    * every `checkpointEvery` merges the frame is localCheckpoint'ed —
    * without it, step k re-derives all k-1 prior merges through a
    * k-deep plan and per-step wall time grows with k (measured flat
    * with the checkpoint: ProfileBpe / BPE_MEASURE.json).
    */
  def bpeTrain(words: DataFrame, wordCol: String, weightCol: String,
      steps: Int, checkpointEvery: Int = 20): Seq[(Int, String, String, Long)] =
    bpeLoop(words, wordCol, weightCol, steps, checkpointEvery)._2

  /** The ENCODE step — the symbol table after `steps` trained merges:
    * one row per distinct word with its corpus weight, piece count, and
    * the space-separated pieces (training markers stripped). This IS how
    * trained BPE is applied: per-doc token counts come from joining the
    * (vocabulary-bounded) segment table back to word counts, exactly as
    * [[docPieceStats]] does for WordPiece.
    */
  def bpeSegments(words: DataFrame, wordCol: String, weightCol: String,
      steps: Int, checkpointEvery: Int = 20): DataFrame =
    bpeLoop(words, wordCol, weightCol, steps, checkpointEvery)._1
      .select(col("word"), col("n"),
        size(split(col("sym"), " ")).cast(LongType).as("n_pieces"),
        replace(col("sym"), lit("~"), lit("")).as("pieces"))

  private def bpeLoop(words: DataFrame, wordCol: String, weightCol: String,
      steps: Int, checkpointEvery: Int)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    var syms = words.select(col(wordCol).as("word"), col(weightCol).as("n"),
      trim(regexp_replace(col(wordCol), "(.)", "~$1 ")).as("sym"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to steps) {
      val ws = split(col("sym"), " ")
      val best = syms
        .select(col("n"), explode(
          when(size(ws) < 2, array().cast(ArrayType(StringType)))
            .otherwise(transform(sequence(lit(1), size(ws) - 1),
              i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1)))))
          .as("pair"))
        .groupBy("pair").agg(sum(col("n")).as("cnt"))
        .orderBy(desc("cnt"), asc("pair"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val pat = best.head.getString(0)
        val cnt = best.head.getLong(1)
        val Array(l, r) = pat.split(" ")
        merges += ((step, l.replace("~", ""), r.replace("~", ""), cnt))
        syms = syms.select(col("word"), col("n"),
          replace(col("sym"), lit(pat), lit(pat.replace(" ", ""))).as("sym"))
        if (checkpointEvery > 0 && step % checkpointEvery == 0)
          syms = syms.localCheckpoint()
      }
    }
    (syms, merges.toSeq)
  }

  /** Per-document subword statistics: explode to words, count per (doc,
    * word), segment only the distinct words, join the piece stats back.
    * Output: one row per doc — word count, piece count, unk-char count.
    */
  def docPieceStats(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String]): DataFrame = {
    val words = df.select(col(idCol),
        explode(split(trim(regexp_replace(col(textCol), "\\s+", " ")), " "))
          .as("word"))
      .filter(col("word") =!= "")
      .groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("n"))
    val distinctWords = words.select("word").distinct()
    val segged = segmentWords(distinctWords, "word", vocab)
    words.join(segged, Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("n_pieces")).as("n_pieces"),
        sum(col("n") * col("n_unk")).as("n_unk"))
  }

  /** Unigram-LM (SentencePiece-style, Kudo 2018) Viterbi segmentation
    * with an INTEGER objective: the candidate-unit table is every
    * substring of length 1..`maxUnit` of the distinct words, a unit is
    * in the vocabulary when its corpus occurrence count reaches
    * `minFreq` (single characters always qualify, so segmentation is
    * total), and each word takes the segmentation minimizing
    *
    *   cost = pieces * 10^9 − Σ min(freq(unit), 999999)
    *
    * — fewest pieces first, then highest total unit frequency: the
    * deterministic integer stand-in for maximizing Σ log p(unit)
    * (float log-probs order differently across engines; this objective
    * is exactly replayable in SQL). The minimal cost per word is unique
    * even when multiple segmentations attain it, so the output is
    * engine-deterministic without a path tie-break.
    *
    * Distributed shape: the span/frequency tables are one explode +
    * one aggregate over the DISTINCT-word table (vocabulary-bounded,
    * not corpus-bounded — tok1's posture); the Viterbi DP is layered
    * BFS over end positions, `maxWordLen` rounds of a (word, pos)
    * equi-join + min-aggregate on word-grain frames (gr6's shape —
    * parallel across words, rounds bounded by the length cap, NOT by
    * corpus size). Words longer than `maxWordLen` are excluded (a real
    * pipeline pre-splits such blobs; the cap bounds the driver loop).
    *
    * Output: (word, n_chars, n_pieces, freq_sum, cost) — cost as above,
    * n_pieces = cost div 10^9 + 1, freq_sum = n_pieces·10^9 − cost.
    */
  def unigramSegment(words: DataFrame, wordCol: String, maxUnit: Int = 6,
      minFreq: Long = 3L, maxWordLen: Int = 24): DataFrame = {
    val w = words.select(col(wordCol).as("word")).distinct()
      .filter(length(col("word")).between(1, maxWordLen))
    val spans = w
      .select(col("word"), explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("i"), explode(sequence(lit(1),
        least(lit(maxUnit), length(col("word")) - col("i") + 1))).as("l"))
      .select(col("word"), col("i"), col("l"),
        col("word").substr(col("i"), col("l")).as("unit"))
    val freq = spans.groupBy("unit").agg(count(lit(1)).as("freq"))
    val vocab = freq.filter(col("freq") >= minFreq || length(col("unit")) === 1)
    // valid DP edges: word, start (0-based), end, integer edge cost
    // localCheckpoint: every DP layer re-reads the edge table, and each
    // layer's plan would otherwise embed all previous layers' plans —
    // the O(L^2)-recompute class the CC loop hit (see ccLogStar)
    val edges = spans.join(vocab, "unit")
      .select(col("word"), (col("i") - 1).cast(LongType).as("s"),
        (col("i") - 1 + col("l")).cast(LongType).as("e"),
        (lit(1000000000L) - least(col("freq"), lit(999999L))).as("c"))
      .localCheckpoint()
    val maxLen = w.agg(coalesce(max(length(col("word"))), lit(0)))
      .head().getInt(0)
    var best = w.select(col("word"), lit(0L).as("pos"), lit(0L).as("cost"))
      .localCheckpoint()
    for (j <- 1 to maxLen) {
      val step = edges.filter(col("e") === j)
        .join(best.filter(col("pos") >= j - maxUnit)
          .select(col("word"), col("pos").as("s"), col("cost")), Seq("word", "s"))
        .groupBy("word")
        .agg(min(col("cost") + col("c")).as("cost"))
        .select(col("word"), lit(j.toLong).as("pos"), col("cost"))
      best = best.unionByName(step).localCheckpoint()
    }
    val wl = w.select(col("word"), length(col("word")).cast(LongType).as("n_chars"))
    wl.join(best, Seq("word"))
      .filter(col("pos") === col("n_chars"))
      // decode (pieces, freq_sum) from the packed cost: S = Σmin(freq) is
      // in [P, P*999999], so cost div 10^9 = P − 1 exactly
      .withColumn("n_pieces", expr("cost div 1000000000") + 1L)
      .select(col("word"), col("n_chars"), col("n_pieces"),
        (col("n_pieces") * 1000000000L - col("cost")).as("freq_sum"),
        col("cost"))
  }
}
