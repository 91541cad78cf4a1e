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
}
