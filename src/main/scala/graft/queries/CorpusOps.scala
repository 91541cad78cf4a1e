package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Corpus
import graft.sources.Tables

/** Corpus-level training-data pipeline queries: benchmark-contamination
  * detection, boilerplate n-gram discovery, token-window chunking, and
  * term document-frequency statistics. All are exactly SQL-expressible,
  * so each carries a full DuckDB oracle (shingling spelled with
  * string_split + generate_series + list slices).
  */
object CorpusOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** DuckDB-side distinct word n-gram extraction over a docs relation
    * `rel(id, text)` — mirrors Corpus.shingles (whitespace words,
    * space-joined n-grams).
    */
  private def gramsSql(rel: String, id: String, n: Int): String =
    s"""SELECT DISTINCT $id, array_to_string(ws[g:g+${n - 1}], ' ') AS gram
       |FROM (SELECT $id, string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS ws
       |      FROM $rel) w,
       |LATERAL (SELECT unnest(generate_series(1, len(ws)-${n - 1})) AS g) _t""".stripMargin

  def all: Seq[Q] = Seq(

    // CC1 — benchmark-contamination check: the probe set is a simulated
    // benchmark (every 10th doc re-keyed, as the dedup suite does);
    // contaminated = shares ≥10 distinct 5-grams with a probe. The probe
    // side is broadcast; the corpus streams through one explode + join.
    Q("cc1_contamination",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val probes = t(s, dir, "documents")
          .filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("probe_id"),
            col("text").as("probe_text"))
        Corpus.contamination(docs, "doc_id", "text",
            probes, "probe_id", "probe_text", n = 5, minOverlap = 10)
          .orderBy("doc_id", "probe_id")
      },
      Some(s"""WITH dg AS (${gramsSql("documents", "doc_id", 5)}),
              |pg AS (
              | ${gramsSql(
                  "(SELECT doc_id + 1000000 AS probe_id, text FROM documents WHERE doc_id % 10 = 0)",
                  "probe_id", 5)})
              |SELECT dg.doc_id, pg.probe_id, COUNT(*) AS overlap
              |FROM dg JOIN pg USING (gram)
              |GROUP BY 1, 2 HAVING COUNT(*) >= 10
              |ORDER BY doc_id, probe_id""".stripMargin)),

    // CC3 — containment-scored contamination: probes are benchmark-style
    // SHORT quotes (first 20 words of every 10th doc); a doc is flagged
    // when it contains ≥80% of a probe's distinct 5-grams. The asymmetric
    // metric Jaccard can't express: the quoted source doc scores 1000
    // even though its full gram set dwarfs the probe's.
    Q("cc3_containment",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val probes = t(s, dir, "documents")
          .filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("probe_id"),
            concat_ws(" ", slice(Corpus.words(col("text")), 1, 20))
              .as("probe_text"))
        Corpus.containment(docs, "doc_id", "text",
            probes, "probe_id", "probe_text", n = 5, minPermille = 800)
          .orderBy("doc_id", "probe_id")
      },
      Some(s"""WITH dg AS (${gramsSql("documents", "doc_id", 5)}),
              |pg AS (
              | ${gramsSql(
                  "(SELECT doc_id + 1000000 AS probe_id, " +
                  "array_to_string(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')[1:20], ' ') AS text " +
                  "FROM documents WHERE doc_id % 10 = 0)",
                  "probe_id", 5)}),
              |psz AS (SELECT probe_id, COUNT(*) AS probe_grams FROM pg GROUP BY 1),
              |ov AS (SELECT dg.doc_id, pg.probe_id, COUNT(*) AS overlap
              |       FROM dg JOIN pg USING (gram) GROUP BY 1, 2)
              |SELECT ov.doc_id, ov.probe_id, ov.overlap,
              | CAST(ov.overlap * 1000 // psz.probe_grams AS BIGINT) AS containment_permille
              |FROM ov JOIN psz USING (probe_id)
              |WHERE ov.overlap * 1000 // psz.probe_grams >= 800
              |ORDER BY doc_id, probe_id""".stripMargin)),

    // BP1 — boilerplate trigrams: word 3-grams occurring in ≥5 distinct
    // documents (the repeated-template detector of a curation pipeline)
    Q("bp1_boilerplate",
      (s, dir) => Corpus.boilerplate(
          t(s, dir, "documents"), "doc_id", "text", n = 3, minDocs = 5)
        .orderBy("gram"),
      Some(s"""SELECT gram, COUNT(*) AS ndocs
              |FROM (${gramsSql("documents", "doc_id", 3)})
              |GROUP BY 1 HAVING COUNT(*) >= 5
              |ORDER BY gram""".stripMargin)),

    // CH1 — token-window chunking (32-word windows, stride 24, ragged
    // tail kept): the pre-tokenization step of a training pipeline.
    // chunk_idx is the 0-based window ordinal; both engines enumerate
    // starts as 1, 1+24, 1+48, …
    Q("ch1_chunk",
      (s, dir) => Corpus.chunk(
          t(s, dir, "documents").filter(col("doc_id") % 25 === 0)
            .select(col("doc_id"), col("text")),
          "text", chunkSize = 32, stride = 24)
        .select(col("doc_id"), col("chunk_idx").cast(LongType).as("chunk_idx"),
          col("n_tokens"), col("chunk"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""SELECT doc_id, CAST((g - 1) // 24 AS BIGINT) AS chunk_idx,
             | CAST(LEAST(32, len(ws) - g + 1) AS BIGINT) AS n_tokens,
             | array_to_string(ws[g:g+31], ' ') AS chunk
             |FROM (SELECT doc_id,
             |        string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ws
             |      FROM documents WHERE doc_id % 25 = 0) w,
             |LATERAL (SELECT unnest(generate_series(1, len(ws), 24)) AS g) _t
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // HP1 — hive-partition pruning: documents re-laid-out as
    // .../lang=<v>/ directories (Tables.documentsByLang), filtered on the
    // partition column. The scan must show non-empty PartitionFilters and
    // list only the matching directories — planning-time pruning, the
    // 100 TB read posture (PlanQualitySpec asserts exactly that). The
    // oracle reads the ORIGINAL single-file table: same rows by
    // construction, which is itself the layout-invariance check.
    Q("hp1_partition_prune",
      (s, dir) => Tables.documentsByLang(s, dir)
        .filter(col("lang") === "en" && col("n_chars") >= 100)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(asc_nulls_first("source")),
      Some("""SELECT source, COUNT(*) AS n_docs,
             | CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM documents WHERE lang = 'en' AND n_chars >= 100
             |GROUP BY source ORDER BY source NULLS FIRST""".stripMargin)),

    // TF1 — per-term corpus stats: document frequency + total term
    // frequency (exact integers; the idf inputs of a tf-idf ranker)
    Q("tf1_term_stats",
      (s, dir) => Corpus.termStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("term"),
      Some("""SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
             | CAST(SUM(tf_doc) AS BIGINT) AS tf
             |FROM (
             | SELECT term, doc_id, COUNT(*) AS tf_doc
             | FROM (SELECT doc_id,
             |         unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS term
             |       FROM documents)
             | GROUP BY 1, 2)
             |GROUP BY 1 ORDER BY term""".stripMargin)),

    // BM1 — BM25 ranked retrieval for a 3-term query (rare + common
    // terms: df ≈ 25 / 385 / 394 of 500 at sf0.001, so the idf spread is
    // what the ranking exercises). Shuffle-free scoring: tf per doc is an
    // array expression, corpus stats are one 1-row aggregate broadcast
    // back, ranking is TakeOrderedAndProject. Scores round to 6 decimals
    // BEFORE ranking so the top-k cut is engine-deterministic.
    Q("bm1_bm25_topk",
      (s, dir) => Corpus.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        Seq("dup", "vector", "stream"), 20),
      Some("""WITH f2 AS (
             | SELECT doc_id, len(w) AS dl,
             |   len(list_filter(w, x -> x = 'dup')) AS tf0,
             |   len(list_filter(w, x -> x = 'vector')) AS tf1,
             |   len(list_filter(w, x -> x = 'stream')) AS tf2
             | FROM (SELECT doc_id,
             |   CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[])
             |        ELSE string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') END AS w
             |   FROM documents)),
             |stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
             |   SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
             |   SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             |   SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
             | FROM f2)
             |SELECT doc_id, ROUND(
             |   LN((n - df0 + 0.5)/(df0 + 0.5) + 1) * (tf0*(1.2+1))/(tf0 + 1.2*(1 - 0.75 + 0.75*dl/avgdl))
             | + LN((n - df1 + 0.5)/(df1 + 0.5) + 1) * (tf1*(1.2+1))/(tf1 + 1.2*(1 - 0.75 + 0.75*dl/avgdl))
             | + LN((n - df2 + 0.5)/(df2 + 0.5) + 1) * (tf2*(1.2+1))/(tf2 + 1.2*(1 - 0.75 + 0.75*dl/avgdl)), 6) AS score
             |FROM f2, stats
             |WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0
             |ORDER BY score DESC, doc_id
             |LIMIT 20""".stripMargin)),

    // BM2 — hybrid retrieval: reciprocal-rank fusion of the bm1 BM25
    // ranking with embedding-cosine ranking (vec_id 0 is the query
    // vector, as in ss1). Each list is cut at n=50 AFTER rounding its
    // score to 6 decimals (ulp-proof rank determinism); RRF = Σ
    // 1/(60+rank) over the lists a doc appears in; ties break on doc_id.
    // Both rankings are TakeOrderedAndProject top-n pulls, fusion joins
    // ≤ 2n rows — bounded at any corpus size.
    Q("bm2_hybrid_rrf",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val query = emb.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0).toArray
        Corpus.hybridTopK(t(s, dir, "documents"), "doc_id", "text",
          Seq("dup", "vector", "stream"),
          emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          query, 20, n = 50)
      },
      Some("""WITH f2 AS (
             | SELECT doc_id, len(w) AS dl,
             |   len(list_filter(w, x -> x = 'dup')) AS tf0,
             |   len(list_filter(w, x -> x = 'vector')) AS tf1,
             |   len(list_filter(w, x -> x = 'stream')) AS tf2
             | FROM (SELECT doc_id,
             |   CASE WHEN text IS NULL OR trim(text) = '' THEN CAST([] AS VARCHAR[])
             |        ELSE string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') END AS w
             |   FROM documents)),
             |stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
             |   SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
             |   SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             |   SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
             | FROM f2),
             |lex AS (SELECT doc_id, ROUND(
             |   LN((n - df0 + 0.5)/(df0 + 0.5) + 1) * (tf0*(1.2+1))/(tf0 + 1.2*(1 - 0.75 + 0.75*dl/avgdl))
             | + LN((n - df1 + 0.5)/(df1 + 0.5) + 1) * (tf1*(1.2+1))/(tf1 + 1.2*(1 - 0.75 + 0.75*dl/avgdl))
             | + LN((n - df2 + 0.5)/(df2 + 0.5) + 1) * (tf2*(1.2+1))/(tf2 + 1.2*(1 - 0.75 + 0.75*dl/avgdl)), 6) AS s
             | FROM f2, stats
             | WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0
             | ORDER BY s DESC, doc_id LIMIT 50),
             |lexr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r FROM lex),
             |sem AS (SELECT vec_id AS doc_id,
             |   ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q), 6) AS s
             | FROM embeddings,
             |   (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0) _q
             | WHERE vec_id <> 0
             | ORDER BY s DESC, doc_id LIMIT 50),
             |semr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r FROM sem)
             |SELECT COALESCE(lexr.doc_id, semr.doc_id) AS doc_id,
             |   COALESCE(1.0/(60 + lexr.r), 0) + COALESCE(1.0/(60 + semr.r), 0) AS rrf
             |FROM lexr FULL JOIN semr ON lexr.doc_id = semr.doc_id
             |ORDER BY rrf DESC, doc_id
             |LIMIT 20""".stripMargin)))
}
