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
}
