package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level training-data operators: benchmark-contamination checks,
  * boilerplate n-gram detection, token-window chunking, and term
  * document-frequency statistics. All are pure Column pipelines
  * (whole-stage codegen, no UDFs) whose only wide operations are
  * equi-joins / aggregations on shingle or term keys — the shapes that
  * scale linearly on a cluster.
  *
  * Tokenization matches the rest of the engine (whitespace words,
  * TextAnalysis.tokenCount / Dedup word shingles): split on runs of
  * whitespace after trim.
  *
  * Ref: the reference has no corpus operators (slide/utils.py is a
  * row-kernel layer); these are north-star additions per BASELINE.json.
  */
object Corpus {

  /** Whitespace word array (empty array for blank/NULL text). */
  def words(text: Column): Column = {
    val w = split(trim(regexp_replace(text, "\\s+", " ")), " ")
    when(text.isNull || trim(text) === "", array().cast(ArrayType(StringType)))
      .otherwise(w)
  }

  /** Array of word n-gram strings (space-joined); empty when the text has
    * fewer than n words. slice() is 1-based. The word array is let-bound
    * (Kernels.letBind) so the regex+split runs once per document, not once
    * per shingle.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.Kernels.letBind(words(text)) { w =>
      when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", slice(w, i, lit(n)))))
        .otherwise(array().cast(ArrayType(StringType)))
    }

  /** Benchmark-contamination check: which corpus documents share at least
    * `minOverlap` distinct word `n`-grams with some probe (benchmark)
    * document. Returns (docIdCol, probe_id, overlap).
    *
    * Scale shape: the probe set is the benchmark suite — small by
    * definition — so its distinct shingles are broadcast; the corpus side
    * streams through one explode + broadcast-hash-join + partial
    * aggregation. No shuffle of the corpus text itself, only of
    * (doc, probe) pairs that actually collide. At 100 TB the shingle
    * strings would be hashed to fixed-width longs first; the string form
    * is kept here so the DuckDB oracle can express the identical join.
    */
  def contamination(
      corpus: DataFrame, docIdCol: String, textCol: String,
      probes: DataFrame, probeIdCol: String, probeTextCol: String,
      n: Int, minOverlap: Int): DataFrame = {
    val gram = Cols.fresh("_gram", corpus.columns ++ probes.columns)
    val docGrams = corpus.select(col(docIdCol),
      explode(array_distinct(shingles(col(textCol), n))).as(gram))
    val probeGrams = probes.select(col(probeIdCol),
      explode(array_distinct(shingles(col(probeTextCol), n))).as(gram))
    docGrams
      .join(broadcast(probeGrams), gram)
      .groupBy(col(docIdCol), col(probeIdCol))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** Asymmetric containment-scored contamination: for every (corpus doc,
    * probe) pair sharing ≥1 word n-gram, the share of the PROBE's distinct
    * n-grams that the doc contains, in exact-integer permille. The right
    * decontamination metric when probes (benchmark items) are much shorter
    * than documents — Jaccard divides by the union and so under-scores a
    * probe quoted verbatim inside a long page; containment = 1000 there.
    *
    * Scale shape: identical to [[contamination]] — probe grams and probe
    * sizes are benchmark-sized, so both broadcast; the corpus side is one
    * explode + broadcast join + partial aggregation, and only colliding
    * (doc, probe) pairs ever shuffle.
    */
  def containment(
      corpus: DataFrame, docIdCol: String, textCol: String,
      probes: DataFrame, probeIdCol: String, probeTextCol: String,
      n: Int, minPermille: Int): DataFrame = {
    val gram = Cols.fresh("_gram", corpus.columns ++ probes.columns)
    val docGrams = corpus.select(col(docIdCol),
      explode(array_distinct(shingles(col(textCol), n))).as(gram))
    val probeGrams = probes.select(col(probeIdCol),
      explode(array_distinct(shingles(col(probeTextCol), n))).as(gram))
    val probeSizes = probeGrams.groupBy(col(probeIdCol))
      .agg(count(lit(1)).as("probe_grams"))
    docGrams
      .join(broadcast(probeGrams), gram)
      .groupBy(col(docIdCol), col(probeIdCol))
      .agg(count(lit(1)).as("overlap"))
      .join(broadcast(probeSizes), probeIdCol)
      .withColumn("containment_permille",
        expr("CAST(overlap * 1000 div probe_grams AS BIGINT)"))
      .filter(col("containment_permille") >= minPermille)
      .select(col(docIdCol), col(probeIdCol), col("overlap"),
        col("containment_permille"))
  }

  /** Boilerplate detection: word n-grams appearing in at least `minDocs`
    * distinct documents. One explode + one count-distinct aggregation —
    * the distinct is per (gram, doc) pair first (map-side combinable),
    * then a plain count per gram.
    */
  def boilerplate(
      corpus: DataFrame, docIdCol: String, textCol: String,
      n: Int, minDocs: Int): DataFrame = {
    val gram = Cols.fresh("_gram", corpus.columns)
    corpus
      .select(col(docIdCol), explode(array_distinct(shingles(col(textCol), n))).as(gram))
      .groupBy(col(gram))
      .agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .withColumnRenamed(gram, "gram")
  }

  /** Token-window chunking: split each document into windows of
    * `chunkSize` words advancing by `stride` (final ragged window kept).
    * Emits (original columns…, chunk_idx, n_tokens, chunk). Narrow —
    * one generator per row, no shuffle; chunk boundaries are
    * content-deterministic so re-runs and re-partitions agree.
    */
  def chunk(
      corpus: DataFrame, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val (wsCol, startCol) = (Cols.fresh("_ws", corpus.columns),
      Cols.fresh("_start", corpus.columns :+ "_ws"))
    corpus
      .withColumn(wsCol, words(col(textCol)))
      .filter(size(col(wsCol)) > 0)
      .select(col("*"),
        posexplode(sequence(lit(1), size(col(wsCol)), lit(stride)))
          .as(Seq("chunk_idx", startCol)))
      .select(col("*"),
        least(lit(chunkSize), size(col(wsCol)) - col(startCol) + 1)
          .cast(LongType).as("n_tokens"),
        concat_ws(" ", slice(col(wsCol), col(startCol), lit(chunkSize))).as("chunk"))
      .drop(wsCol, startCol)
  }

  /** Per-term corpus statistics: document frequency (distinct docs
    * containing the term) and total term frequency. The classic two-level
    * aggregation — per (term, doc) first so the wide shuffle carries
    * pre-combined counts, never raw token streams.
    */
  def termStats(
      corpus: DataFrame, docIdCol: String, textCol: String): DataFrame = {
    val term = Cols.fresh("term", corpus.columns)
    corpus
      .select(col(docIdCol), explode(words(col(textCol))).as(term))
      .groupBy(col(term), col(docIdCol))
      .agg(count(lit(1)).as("tf_doc"))
      .groupBy(col(term))
      .agg(count(lit(1)).as("df"), sum("tf_doc").as("tf"))
  }

  /** BM25 ranked retrieval: top-`k` documents for a bag of query terms,
    * scored `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avgdl))` with
    * the Lucene idf `ln((N−df+0.5)/(df+0.5) + 1)` (always ≥ 0).
    *
    * SHUFFLE-FREE except the final top-k: the query's term set is a
    * bounded literal, so per-document term frequencies are ARRAY
    * expressions (`size(filter(words, _ = t))`) instead of the classic
    * explode → (term,doc) shuffle — each document scores itself inside
    * whole-stage codegen. Corpus statistics (N, avgdl, per-term df) are
    * ONE global aggregate producing a single row, broadcast back via
    * crossJoin; ranking is `TakeOrderedAndProject` (per-partition heaps,
    * never a global sort). Two scans of the corpus total, zero wide
    * shuffles — at 100 TB the cost is the scans, not data movement.
    *
    * Scores are rounded to 6 decimals BEFORE ranking: the rounded value
    * is engine-reproducible (log/division ulp differences sit at 1e-15)
    * and makes the (score, docId) ordering — and therefore the top-k
    * cut — deterministic across engines and cluster sizes.
    */
  def bm25TopK(corpus: DataFrame, docIdCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0, "bm25TopK needs k > 0")
    val w = Cols.fresh("_w", corpus.columns)
    val base = corpus.select(col(docIdCol), words(col(textCol)).as(w))
    val tfCols = terms.indices.map { i =>
      size(filter(col(w), x => x === lit(terms(i)))).cast(LongType).as(s"_tf$i")
    }
    val feat = base.select(
      col(docIdCol) +: size(col(w)).cast(LongType).as("_dl") +: tfCols: _*)
    // one reduce: corpus size, average doc length, df per query term.
    // avgdl is exact in ANY summation order: doc lengths are integers and
    // their total stays far below 2^53, so every partial sum is an exact
    // double — the reproducibility trick the money queries get from cents
    val statAggs = count(lit(1)).as("_n") +: avg(col("_dl")).as("_avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i"))
    val stats = feat.agg(statAggs.head, statAggs.tail: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"_tf$i").cast(DoubleType)
      val idf = log(
        (col("_n") - col(s"_df$i") + lit(0.5)) / (col(s"_df$i") + lit(0.5))
          + lit(1.0))
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("_dl") / col("_avgdl")))
    }.reduce(_ + _)
    feat.crossJoin(broadcast(stats))
      .filter(terms.indices.map(i => col(s"_tf$i") > 0).reduce(_ || _))
      .select(col(docIdCol), round(score, 6).as("score"))
      .orderBy(desc("score"), col(docIdCol).asc)
      .limit(k)
  }

  /** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack/Clarke/
    * Buettcher 2009) of a BM25 lexical ranking and an embedding-cosine
    * semantic ranking. Each list contributes `1/(kRrf + rank)` for its
    * top-`n` documents (absent ⇒ 0); final order is fused score desc,
    * then id.
    *
    * Scale shape: the two rankings are independent single-scan
    * `TakeOrderedAndProject` top-`n` pulls ([[bm25TopK]] and the cosine
    * scan), so the fusion join touches ≤ 2`n` rows — driver-bounded,
    * broadcast-joined, irrelevant at any corpus size. Determinism: both
    * per-list scores are rounded to 6 decimals BEFORE their rank cut
    * (ulp-proof across engines), ranks are then integers, and the RRF
    * sum `1/(k+r_lex) + 1/(k+r_sem)` is the identical IEEE expression in
    * any engine — ties (e.g. two docs with swapped ranks) break on id.
    */
  def hybridTopK(corpus: DataFrame, docIdCol: String, textCol: String,
      terms: Seq[String], emb: DataFrame, vecIdCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, n: Int = 50,
      kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= k, "hybridTopK: per-list depth n must be >= k")
    val lex = bm25TopK(corpus, docIdCol, textCol, terms, n)
      .select(col(docIdCol), row_number().over(
        Window.orderBy(desc("score"), col(docIdCol).asc)).as("_rlex"))
    val q = array(queryVec.map(x => lit(x)): _*)
    val sem = emb
      .select(col(vecIdCol).as(docIdCol),
        round(graft.functions.VectorOps.cosineNative(col(vecCol), q), 6)
          .as("_cs"))
      .orderBy(desc("_cs"), col(docIdCol).asc).limit(n)
      .select(col(docIdCol), row_number().over(
        Window.orderBy(desc("_cs"), col(docIdCol).asc)).as("_rsem"))
    lex.join(sem, Seq(docIdCol), "full_outer")
      .select(col(docIdCol),
        (coalesce(lit(1.0) / (lit(kRrf) + col("_rlex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("_rsem")), lit(0.0))).as("rrf"))
      .orderBy(desc("rrf"), col(docIdCol).asc)
      .limit(k)
  }
}
