package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Dedup, Frame, Multimodal, Similarity, TextAnalysis}
import graft.sources.Tables

/** North-star LLM-data-pipeline operators (BASELINE.json): deduplication
  * (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
  * similarity search (brute-force + LSH ANN), text analysis (lang-ID,
  * quality, tokens, fingerprints), multimodal binary columns.
  *
  * Oracle strategy: where the pipeline is hash-free it is expressed 1:1 in
  * DuckDB SQL; the MinHash-LSH and SimHash pipelines end in an *exact
  * verify* stage, so their output equals the brute-force all-pairs oracle
  * whenever blocking recall is 1 — guaranteed probabilistically for
  * MinHash (all true pairs have j ≥ 0.95; P(miss) < 1e-20 at 32 bands × 4
  * rows) and combinatorially for SimHash (pigeonhole over 16 chunks covers
  * hamming ≤ 15; true pairs measure ≤ 12). ANN bucket queries get exact-
  * mode gates (probe everything ⇒ exact top-k: ss2x, ss4); the rolling
  * frame hash is defined mod 1e9+7 so checked-arithmetic engines can
  * replay it. The PRUNED ANN operating points (ss2, ss3) are hash-gated
  * too: their candidate sets are deterministic functions of (data,
  * committed seeds), so the oracle replays the pruned search itself —
  * seed-42 hyperplanes inlined as literals for LSH, the iters=0 lowest-id
  * quantizer reselected from data for IVF — and the rows emit integer
  * (n_probed, recall@10-permille vs the exact twin). Lloyd-TRAINED
  * centroids stay recall-spec-checked (ULP-order-dependent across
  * engines); RECALL_AUDIT carries the at-scale evidence.
  */
object LlmData {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** documents ∪ re-crawl simulation (every 10th doc duplicated under a
    * shifted id) — gives exact dedup real duplicates to find
    */
  private def docsWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val re = t(s, dir, "documents").filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    Frame(d).union(Frame(re), unique = false).df
  }
  private val docsWithDupsSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0""".stripMargin

  // ---- ss2/ss3 pruned-ANN oracle generators --------------------------
  // The pruned candidate set is a deterministic function of (data, seed),
  // so the oracle replays the ENTIRE pruned search: the committed seed-42
  // hyperplanes are inlined as double literals (Double.toString round-trips
  // the exact double), and dot/cosine are sequential double folds in both
  // engines, so sign and ranking decisions agree. Outputs are integers
  // (query_vec, n_probed, recall_permille) per the repo's no-floats rule.

  private def sqlArr(p: Array[Double]): String = p.mkString("[", ", ", "]")

  /** the seed-42 LSH bucket of DOUBLE[] expression `v`, as DuckDB SQL
    * with the hyperplane constants inlined
    */
  private def lshBucketSql(v: String): String = {
    val planes = Similarity.hyperplanes(64, 4, 42L)
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product($v, ${sqlArr(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", "\n      + ", ")")
  }

  /** ss1b's committed EXTERNAL query vector (seed-7 gaussian): a user
    * embedding arriving from outside the corpus — the realistic standing-
    * pipeline shape, and it keeps the bench row a single probe job (no
    * scan to fetch a corpus vector first).
    */
  private lazy val ss1bQuery: Array[Float] = {
    val rnd = new scala.util.Random(7)
    Array.fill(64)(rnd.nextGaussian().toFloat)
  }

  private lazy val ss1bOracleSql: String = {
    // the query's bucket is itself deterministic — computed HERE with the
    // same double arithmetic the Spark driver uses, inlined as a literal
    val planes = Similarity.hyperplanes(64, 4, 42L)
    val qBits = planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(ss1bQuery).map { case (a, b) => a * b.toDouble }.sum >= 0.0)
        1L << i
      else 0L
    }.sum
    val qArr = sqlArr(ss1bQuery.map(_.toDouble))
    s"""SELECT vec_id FROM (
       | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  ${lshBucketSql("CAST(embedding AS DOUBLE[])")} AS bucket
       | FROM embeddings)
       |WHERE bit_count(xor(bucket, $qBits)) <= 1
       |ORDER BY list_cosine_similarity(v, $qArr) DESC, vec_id LIMIT 10""".stripMargin
  }

  private lazy val ss2OracleSql: String = {
    def bucket(v: String) = lshBucketSql(v)
    val per = (0 to 4).map { qid =>
      s"""(WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |    FROM embeddings WHERE vec_id <> $qid),
         |  q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |    FROM embeddings WHERE vec_id = $qid),
         |  bk AS (SELECT vec_id, v, ${bucket("v")} AS bucket FROM b),
         |  qb AS (SELECT ${bucket("qv")} AS qbucket, qv FROM q),
         |  cand AS (SELECT bk.vec_id, bk.v, qb.qv FROM bk, qb
         |    WHERE bit_count(xor(bucket, qbucket)) <= 1),
         |  approx AS (SELECT vec_id FROM cand
         |    ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT 10),
         |  exact AS (SELECT vec_id FROM b, q
         |    ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT 10)
         |SELECT CAST($qid AS BIGINT) AS query_vec,
         |  CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_probed,
         |  CAST((SELECT count(*) FROM approx JOIN exact USING (vec_id)) * 100
         |    AS BIGINT) AS recall_permille)""".stripMargin
    }
    per.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY query_vec")
  }

  private lazy val ss3OracleSql: String = {
    val per = (0 to 4).map { qid =>
      s"""(WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |    FROM embeddings WHERE vec_id <> $qid),
         |  q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |    FROM embeddings WHERE vec_id = $qid),
         |  cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
         |    FROM (SELECT vec_id, v FROM b ORDER BY vec_id LIMIT 8)),
         |  probes AS (SELECT cidx FROM cent, q
         |    ORDER BY COALESCE(list_cosine_similarity(cv, qv), -2.0) DESC, cidx
         |    LIMIT 6),
         |  assign AS (SELECT vec_id, v, cidx FROM (
         |    SELECT b.vec_id, b.v, cent.cidx,
         |      row_number() OVER (PARTITION BY b.vec_id
         |        ORDER BY COALESCE(list_cosine_similarity(b.v, cent.cv), -2.0)
         |          DESC, cent.cidx) AS rn
         |    FROM b CROSS JOIN cent) WHERE rn = 1),
         |  cand AS (SELECT a.vec_id, a.v FROM assign a JOIN probes USING (cidx)),
         |  approx AS (SELECT vec_id FROM cand, q
         |    ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT 10),
         |  exact AS (SELECT vec_id FROM b, q
         |    ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT 10)
         |SELECT CAST($qid AS BIGINT) AS query_vec,
         |  CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_probed,
         |  CAST((SELECT count(*) FROM approx JOIN exact USING (vec_id)) * 100
         |    AS BIGINT) AS recall_permille)""".stripMargin
    }
    per.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY query_vec")
  }

  /** ss7's oracle: the full IVF→PQ pipeline replayed in SQL, at the
    * COMMITTED operating point (pqBlocks = 16 — 4 dims/block — and
    * rerank = 100, the round-13 `ivfpq_min_path` finding promoted in
    * round 14). Coarse quantizer and PQ codebooks are the DETERMINISTIC
    * iters=0 forms (8 / 16 lowest-id vectors), so cell assignment,
    * per-block code assignment (first-max argmax over sub-vector
    * cosines), the ADC table math, and both rankings are pure functions
    * of the data. The per-block dot/norm partials and their 16-block
    * sums are spelled as EXPLICIT left-associated additions in
    * ascending index order — exactly the fold order of the Spark side's
    * driver-computed lookup tables and its `aggregate` over blocks — so
    * the doubles agree bit-for-bit.
    */
  private lazy val ss7OracleSql: String = {
    def terms(f: Int => String) = (1 to 4).map(f).mkString(" + ")
    val pdot = terms(i => s"cv[bk*4+$i]*qv[bk*4+$i]")
    val pn2 = terms(i => s"cv[bk*4+$i]*cv[bk*4+$i]")
    def sum16(l: String) = (1 to 16).map(i => s"$l[$i]").mkString(" + ")
    val qn2 = (1 to 64).map(i => s"qv[$i]*qv[$i]").mkString(" + ")
    val per = (0 to 4).map { qid =>
      s"""(WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |    FROM embeddings WHERE vec_id <> $qid),
         |  q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
         |    FROM embeddings WHERE vec_id = $qid),
         |  qn AS (SELECT sqrt($qn2) AS qnorm FROM q),
         |  cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
         |    FROM (SELECT vec_id, v FROM b ORDER BY vec_id LIMIT 8)),
         |  probes AS (SELECT cidx FROM cent, q
         |    ORDER BY COALESCE(list_cosine_similarity(cv, qv), -2.0) DESC, cidx
         |    LIMIT 6),
         |  assign AS (SELECT vec_id, v, cidx FROM (
         |    SELECT b.vec_id, b.v, cent.cidx,
         |      row_number() OVER (PARTITION BY b.vec_id
         |        ORDER BY COALESCE(list_cosine_similarity(b.v, cent.cv), -2.0)
         |          DESC, cent.cidx) AS rn
         |    FROM b CROSS JOIN cent) WHERE rn = 1),
         |  cand AS (SELECT a.vec_id, a.v FROM assign a JOIN probes USING (cidx)),
         |  cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS cv
         |    FROM (SELECT vec_id, v FROM b ORDER BY vec_id LIMIT 16)),
         |  blks AS (SELECT unnest(generate_series(0, 15)) AS bk),
         |  codes AS (SELECT vec_id, bk, c FROM (
         |    SELECT cand.vec_id, blks.bk, cb.c,
         |      row_number() OVER (PARTITION BY cand.vec_id, blks.bk
         |        ORDER BY COALESCE(list_cosine_similarity(
         |          cand.v[blks.bk*4+1 : blks.bk*4+4],
         |          cb.cv[blks.bk*4+1 : blks.bk*4+4]), -2.0) DESC, cb.c) AS rn
         |    FROM cand, blks, cb) WHERE rn = 1),
         |  pb AS (SELECT cb.c, blks.bk, ($pdot) AS pdot, ($pn2) AS pn2
         |    FROM cb, blks, q),
         |  pl AS (SELECT codes.vec_id,
         |      list(pdot ORDER BY codes.bk) AS dl,
         |      list(pn2 ORDER BY codes.bk) AS nl
         |    FROM codes JOIN pb ON pb.c = codes.c AND pb.bk = codes.bk
         |    GROUP BY codes.vec_id),
         |  adc AS (SELECT pl.vec_id,
         |      CASE WHEN qn.qnorm = 0.0 OR (${sum16("nl")}) = 0.0 THEN -2.0
         |           ELSE (${sum16("dl")}) / (qn.qnorm * sqrt(${sum16("nl")})) END AS a
         |    FROM pl, qn),
         |  pool AS (SELECT cand.vec_id, cand.v FROM adc JOIN cand USING (vec_id)
         |    ORDER BY adc.a DESC, cand.vec_id LIMIT 100),
         |  approx AS (SELECT vec_id FROM pool, q
         |    ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT 10),
         |  exact AS (SELECT vec_id FROM b, q
         |    ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT 10)
         |SELECT CAST($qid AS BIGINT) AS query_vec,
         |  CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_probed,
         |  CAST((SELECT count(*) FROM approx JOIN exact USING (vec_id)) * 100
         |    AS BIGINT) AS recall_permille)""".stripMargin
    }
    per.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY query_vec")
  }

  /** brute-force word-3-shingle Jaccard pairs ≥ 4/5 in DuckDB (the LSH
    * oracle; recall argument in the scaladoc above)
    */
  private val bruteJaccardSql =
    """WITH grams AS (
      |  SELECT DISTINCT doc_id, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS gram
      |  FROM (SELECT doc_id,
      |          string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ws
      |        FROM documents) w,
      |  LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS g) _t
      |), gc AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
      |i AS (SELECT x.doc_id AS ida, y.doc_id AS idb, COUNT(*) AS inter
      |      FROM grams x JOIN grams y ON x.gram = y.gram AND x.doc_id < y.doc_id
      |      GROUP BY 1, 2)
      |SELECT i.ida, i.idb FROM i
      |JOIN gc a ON a.doc_id = i.ida JOIN gc b ON b.doc_id = i.idb
      |WHERE 5 * i.inter >= 4 * (a.n + b.n - i.inter)
      |ORDER BY i.ida, i.idb""".stripMargin

  /** cur8's oracle: farthest-first traversal replayed as chained CTEs —
    * step i's argmax over integer micro-distances (ROUND once, the
    * e16/ss6 convention) with vec_id tie-breaks, selection accumulated
    * via UNION ALL.
    */
  private def diverseSelectOracleSql(k: Int): String = {
    // every CTE is MATERIALIZED and the candidate/selected sides are
    // split into their own CTEs: DuckDB inlines plain CTEs, so the
    // chained selection otherwise re-expands exponentially, and IN /
    // NOT IN inside one cross-join clause plans as a per-pair mark join
    // — >120 s at the 100x replica vs 1.2 s in this shape
    val stages = (2 to k).map { i =>
      s"""cand$i AS MATERIALIZED (
         | SELECT base.* FROM base WHERE vec_id NOT IN (SELECT vec_id FROM sel${i - 1})),
         |sv$i AS MATERIALIZED (
         | SELECT base.v FROM base WHERE vec_id IN (SELECT vec_id FROM sel${i - 1})),
         |c$i AS MATERIALIZED (SELECT b.vec_id,
         | MIN(CAST(ROUND((1 - list_cosine_similarity(b.v, s.v)) * 1000000) AS BIGINT)) AS mind
         | FROM cand$i b, sv$i s GROUP BY 1),
         |s$i AS MATERIALIZED (SELECT CAST($i AS BIGINT) AS rk, vec_id, mind FROM c$i
         |        ORDER BY mind DESC, vec_id LIMIT 1),
         |sel$i AS MATERIALIZED (SELECT vec_id FROM sel${i - 1} UNION ALL SELECT vec_id FROM s$i)""".stripMargin
    }.mkString(",\n")
    val finals = (1 to k).map(i => s"SELECT rk, vec_id, mind AS mind_micro FROM s$i")
      .mkString("\nUNION ALL\n")
    s"""WITH base AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s1 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS rk, vec_id, CAST(NULL AS BIGINT) AS mind
       |       FROM base ORDER BY vec_id LIMIT 1),
       |sel1 AS MATERIALIZED (SELECT vec_id FROM s1),
       |$stages
       |SELECT * FROM (
       |$finals
       |) ORDER BY rk""".stripMargin
  }

  /** langId as a scalar SQL expression over `textExpr` (scalar subquery
    * form, for embedding in larger oracle pipelines)
    */
  private def langCaseSql(textExpr: String): String = {
    def cnt(m: String) =
      s"CAST((length(pp2) - length(replace(pp2, '$m', ''))) / ${m.length} AS BIGINT)"
    val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
      lang -> ms.map(cnt).mkString("(", " + ", ")")
    }
    val scoreCols = scores.map { case (l, e) => s"$e AS s_$l" }.mkString(", ")
    val best = scores.map("s_" + _._1).mkString("GREATEST(", ", ", ")")
    val caseExpr = scores.map { case (l, _) =>
      s"WHEN s_$l = best AND best > 0 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"(SELECT $caseExpr FROM (SELECT $scoreCols, $best AS best " +
      s"FROM (SELECT ' ' || lower($textExpr) || ' ' AS pp2)))"
  }

  /** langId oracle SQL generated from the same marker table the Scala
    * operator uses — one source of truth for the heuristic
    */
  private def langIdSql: String = {
    def cnt(m: String) =
      s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS BIGINT)"
    val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
      lang -> ms.map(cnt).mkString("(", " + ", ")")
    }
    val scoreCols = scores.map { case (l, e) => s"$e AS score_$l" }.mkString(", ")
    val best = scores.map(_._1).map("score_" + _).mkString("GREATEST(", ", ", ")")
    val caseExpr = scores.map { case (l, _) =>
      s"WHEN score_$l = best AND best > 0 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"""SELECT doc_id, $caseExpr AS lang_pred, score_en, score_fr, score_es, score_de
       |FROM (
       |  SELECT doc_id, $scoreCols, $best AS best
       |  FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents)
       |) ORDER BY doc_id""".stripMargin
  }

  def all: Seq[Q] = Seq(

    // DD1 — exact dedup (hash-groupBy representative selection)
    Q("dd1_dedup_exact",
      (s, dir) => Dedup.exact(docsWithDups(s, dir), Seq("text"), "doc_id")
        .select(col("keep_id"), col("copies"))
        .orderBy("keep_id"),
      Some(s"""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS copies
              |FROM ($docsWithDupsSql) GROUP BY text ORDER BY keep_id""".stripMargin)),

    // DD2 — MinHash + LSH near-dup pipeline, exact-verified; equals the
    // brute-force Jaccard oracle at recall 1
    Q("dd2_minhash_lsh",
      (s, dir) => Dedup.minHashDedup(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("ida", "idb"),
      Some(bruteJaccardSql),
      bench = true),

    // DD3 — SimHash near-dup pipeline, gated like dd2/dd5: chunk-equality
    // blocking (recall GUARANTEED by pigeonhole for hamming ≤ 15 over 16
    // chunks; true pairs on this corpus measure ≤ 12 — margin asserted in
    // LlmOpsSpec) → exact shingle-Jaccard verify, so the output equals the
    // brute-force all-pairs oracle. The raw hamming-pairs form stays
    // spec-checked (hash-specific values have no SQL counterpart).
    Q("dd3_simhash",
      (s, dir) => Dedup.simHashDedup(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("ida", "idb"),
      Some(bruteJaccardSql)),

    // DD4 — n-gram Jaccard similarity matrix over a deterministic sample,
    // permille-integerized
    Q("dd4_ngram_jaccard",
      (s, dir) => {
        // length >= 3 on BOTH sides: the oracle's gram CTE drops shorter
        // docs entirely (its JOIN would eliminate their pairs)
        val sample = t(s, dir, "documents")
          .filter(col("doc_id") % 25 === 0 && length(col("text")) >= 3)
          .select(col("doc_id"), Dedup.charNgrams(col("text"), 3).as("grams"))
        val a = sample.select(col("doc_id").as("ida"), col("grams").as("ga"))
        val b = sample.select(col("doc_id").as("idb"), col("grams").as("gb"))
        a.crossJoin(b).filter(col("ida") < col("idb"))
          .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast(LongType))
          .withColumn("uni",
            (size(col("ga")) + size(col("gb"))).cast(LongType) - col("inter"))
          .select(col("ida"), col("idb"),
            (col("inter") * 1000L / col("uni")).cast(LongType).as("jaccard_pm"))
          .orderBy("ida", "idb")
      },
      Some("""WITH s AS (SELECT doc_id, text FROM documents
             |           WHERE doc_id % 25 = 0 AND length(text) >= 3),
             |grams AS (
             |  SELECT DISTINCT doc_id, substring(text, g, 3) AS gram
             |  FROM s, LATERAL (SELECT unnest(generate_series(1, length(text)-2)) AS g) _t
             |), gc AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
             |i AS (SELECT x.doc_id AS ida, y.doc_id AS idb, COUNT(*) AS inter
             |      FROM grams x JOIN grams y ON x.gram = y.gram AND x.doc_id < y.doc_id
             |      GROUP BY 1, 2)
             |SELECT p.ida, p.idb,
             |  CAST(COALESCE(i.inter, 0) * 1000 // (a.n + b.n - COALESCE(i.inter, 0)) AS BIGINT) AS jaccard_pm
             |FROM (SELECT x.doc_id AS ida, y.doc_id AS idb FROM s x JOIN s y ON x.doc_id < y.doc_id) p
             |LEFT JOIN i ON i.ida = p.ida AND i.idb = p.idb
             |JOIN gc a ON a.doc_id = p.ida JOIN gc b ON b.doc_id = p.idb
             |ORDER BY p.ida, p.idb""".stripMargin)),

    // DD5 — embedding-cosine near-dup pairs via banded multi-table LSH:
    // candidates from a (table, bucket) equi-join, exact-scored, so the
    // result equals the all-pairs oracle whenever recall is 1 (verified
    // vs cosinePairs in LlmOpsSpec — same argument as dd2). The O(n²)
    // cosinePairs crossJoin stays as the spec-side verifier only.
    Q("dd5_embed_cosine",
      (s, dir) => Similarity.cosinePairsBandedLsh(
        t(s, dir, "embeddings"), "embedding", "vec_id", threshold = 0.4)
        .orderBy("ida", "idb"),
      Some("""SELECT a.vec_id AS ida, b.vec_id AS idb
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             |  CAST(b.embedding AS DOUBLE[])) >= 0.4
             |ORDER BY ida, idb""".stripMargin)),

    // DD11 — SemDeDup (arXiv:2303.09540): cluster-scoped semantic dedup.
    // The registered variant clusters by a deterministic 3-bit coordinate-
    // sign bucket so DuckDB can recompute the assignment exactly; the
    // k-means (IVF-centroid) clustering the paper uses has no SQL oracle
    // and is spec-verified against the brute-force retention rule instead
    // (LlmOpsSpec). Survivor rule: no same-cluster lower-id neighbor at
    // cosine >= 0.4.
    Q("dd11_semdedup",
      (s, dir) => Similarity.semDedup(
        t(s, dir, "embeddings"), "embedding", "vec_id",
        Similarity.signCluster(col("embedding"), 3), tau = 0.4)
        .select(col("vec_id"), col("label"))
        .orderBy("vec_id"),
      Some("""SELECT a.vec_id, a.label FROM embeddings a WHERE NOT EXISTS (
             | SELECT 1 FROM embeddings b
             | WHERE (CASE WHEN b.embedding[1] >= 0 THEN 4 ELSE 0 END
             |      + CASE WHEN b.embedding[2] >= 0 THEN 2 ELSE 0 END
             |      + CASE WHEN b.embedding[3] >= 0 THEN 1 ELSE 0 END)
             |     = (CASE WHEN a.embedding[1] >= 0 THEN 4 ELSE 0 END
             |      + CASE WHEN a.embedding[2] >= 0 THEN 2 ELSE 0 END
             |      + CASE WHEN a.embedding[3] >= 0 THEN 1 ELSE 0 END)
             |   AND b.vec_id < a.vec_id
             |   AND list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
             |     CAST(a.embedding AS DOUBLE[])) >= 0.4)
             |ORDER BY vec_id""".stripMargin)),

    // DD12 — incremental SemDeDup: a constructed batch (doubled twins of
    // vec_id%7=0 — exact float, cosine 1, MUST drop via the corpus probe;
    // negated vectors of vec_id%7=3 — flipped cluster, mostly novel)
    // deduped against the full embeddings corpus. Corpus always outranks
    // the batch; within the batch, lower id wins.
    Q("dd12_semdedup_incr",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val corpus = emb.select(col("vec_id"), col("embedding"))
        val batch = emb.filter(col("vec_id") % 7 === 0)
          .select((col("vec_id") + 2000000L).as("vec_id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
          .unionAll(emb.filter(col("vec_id") % 7 === 3)
            .select((col("vec_id") + 3000000L).as("vec_id"),
              transform(col("embedding"), x => -x).as("embedding")))
        Similarity.semDedupIncremental(batch, corpus, "embedding", "vec_id",
          Similarity.signCluster(col("embedding"), 3), tau = 0.4)
          .select(col("vec_id")).orderBy("vec_id")
      },
      Some("""WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
             |batch AS (
             | SELECT vec_id + 2000000 AS vec_id,
             |   list_transform(embedding, x -> CAST(x * 2 AS FLOAT)) AS embedding
             | FROM embeddings WHERE vec_id % 7 = 0
             | UNION ALL
             | SELECT vec_id + 3000000 AS vec_id,
             |   list_transform(embedding, x -> CAST(-x AS FLOAT)) AS embedding
             | FROM embeddings WHERE vec_id % 7 = 3)
             |SELECT a.vec_id FROM batch a
             |WHERE NOT EXISTS (SELECT 1 FROM corpus b
             |  WHERE (CASE WHEN b.embedding[1] >= 0 THEN 4 ELSE 0 END
             |       + CASE WHEN b.embedding[2] >= 0 THEN 2 ELSE 0 END
             |       + CASE WHEN b.embedding[3] >= 0 THEN 1 ELSE 0 END)
             |      = (CASE WHEN a.embedding[1] >= 0 THEN 4 ELSE 0 END
             |       + CASE WHEN a.embedding[2] >= 0 THEN 2 ELSE 0 END
             |       + CASE WHEN a.embedding[3] >= 0 THEN 1 ELSE 0 END)
             |    AND list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
             |      CAST(a.embedding AS DOUBLE[])) >= 0.4)
             |  AND NOT EXISTS (SELECT 1 FROM batch b
             |  WHERE (CASE WHEN b.embedding[1] >= 0 THEN 4 ELSE 0 END
             |       + CASE WHEN b.embedding[2] >= 0 THEN 2 ELSE 0 END
             |       + CASE WHEN b.embedding[3] >= 0 THEN 1 ELSE 0 END)
             |      = (CASE WHEN a.embedding[1] >= 0 THEN 4 ELSE 0 END
             |       + CASE WHEN a.embedding[2] >= 0 THEN 2 ELSE 0 END
             |       + CASE WHEN a.embedding[3] >= 0 THEN 1 ELSE 0 END)
             |    AND b.vec_id < a.vec_id
             |    AND list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
             |      CAST(a.embedding AS DOUBLE[])) >= 0.4)
             |ORDER BY vec_id""".stripMargin)),

    // DD7 — near-dup clusters: connected components over the verified
    // MinHash pairs, labeled by minimum member (the kept representative);
    // oracle = DuckDB recursive CTE reachability over the same pairs
    Q("dd7_dedup_clusters",
      (s, dir) => Dedup.connectedComponents(
        Dedup.minHashDedup(t(s, dir, "documents"), "doc_id", "text"))
        .orderBy("id"),
      Some(s"""WITH RECURSIVE base AS ($bruteJaccardSql),
              |nodes AS (SELECT ida AS id FROM base UNION SELECT idb FROM base),
              |edges AS (SELECT ida AS a, idb AS b FROM base
              |          UNION ALL SELECT idb, ida FROM base),
              |reach(id, label) AS (
              | SELECT id, id FROM nodes
              | UNION
              | SELECT e.a, r.label FROM edges e JOIN reach r ON r.id = e.b
              |)
              |SELECT id, MIN(label) AS cluster FROM reach GROUP BY id
              |ORDER BY id""".stripMargin)),

    // DD17 — the same cluster labels via alternating large-star/small-star
    // contraction (Kiveris et al. 2014): O(log n) rounds where dd7's label
    // propagation needs O(component diameter) — the form that survives
    // re-crawl CHAINS at 100 TB. Same recursive-CTE reachability oracle.
    Q("dd17_cc_logstar",
      (s, dir) => Dedup.connectedComponentsLogStar(
        Dedup.minHashDedup(t(s, dir, "documents"), "doc_id", "text"))
        .orderBy("id"),
      Some(s"""WITH RECURSIVE base AS ($bruteJaccardSql),
              |nodes AS (SELECT ida AS id FROM base UNION SELECT idb FROM base),
              |edges AS (SELECT ida AS a, idb AS b FROM base
              |          UNION ALL SELECT idb, ida FROM base),
              |reach(id, label) AS (
              | SELECT id, id FROM nodes
              | UNION
              | SELECT e.a, r.label FROM edges e JOIN reach r ON r.id = e.b
              |)
              |SELECT id, MIN(label) AS cluster FROM reach GROUP BY id
              |ORDER BY id""".stripMargin)),

    // DD18 — incremental cluster MAINTENANCE: the corpus labeling plus a
    // re-crawl batch's pairs (corpus↔batch via the band-index probe,
    // batch↔batch via LSH over the batch alone), merged by relabeling
    // ONLY the affected clusters — the corpus is never re-clustered.
    // Oracle = full recursive-CTE reachability over the union pool, so
    // the gate IS the incremental == full-recompute identity.
    Q("dd18_incremental_cc",
      (s, dir) => {
        val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val batch = t(s, dir, "documents").filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val labels = Dedup.connectedComponentsLogStar(
          Dedup.minHashDedup(corpus, "doc_id", "text"))
        val newPairs = Dedup.incrementalNearDups(corpus, batch, "doc_id", "text")
          .unionByName(Dedup.minHashDedup(batch, "doc_id", "text"))
        Dedup.incrementalComponents(labels, newPairs).orderBy("id")
      },
      Some(s"""WITH RECURSIVE pool AS ($docsWithDupsSql),
              |grams AS (
              |  SELECT DISTINCT doc_id, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS gram
              |  FROM (SELECT doc_id,
              |          string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS ws
              |        FROM pool) w,
              |  LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS g) _t
              |), gc AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
              |i AS (SELECT x.doc_id AS ida, y.doc_id AS idb, COUNT(*) AS inter
              |      FROM grams x JOIN grams y ON x.gram = y.gram AND x.doc_id < y.doc_id
              |      GROUP BY 1, 2),
              |base AS (SELECT i.ida, i.idb FROM i
              | JOIN gc a ON a.doc_id = i.ida JOIN gc b ON b.doc_id = i.idb
              | WHERE 5 * i.inter >= 4 * (a.n + b.n - i.inter)),
              |nodes AS (SELECT ida AS id FROM base UNION SELECT idb FROM base),
              |edges AS (SELECT ida AS a, idb AS b FROM base
              |          UNION ALL SELECT idb, ida FROM base),
              |reach(id, label) AS (
              | SELECT id, id FROM nodes
              | UNION
              | SELECT e.a, r.label FROM edges e JOIN reach r ON r.id = e.b
              |)
              |SELECT id, MIN(label) AS cluster FROM reach GROUP BY id
              |ORDER BY id""".stripMargin)),

    // DD19 — source-overlap audit (mirror-site detection): near-dup
    // pairs rolled up to the (source, source) matrix — a hot off-diagonal
    // cell means two sources carry the same content and one should be
    // dropped wholesale before doc-level dedup spends compute on it.
    // Pairs from the LSH pipeline; source lookup is two broadcastable
    // doc-grain joins on the pair ids only.
    Q("dd19_source_overlap",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.minHashDedup(docs, "doc_id", "text")
        val src = docs.select(col("doc_id"), col("source"))
        pairs
          .join(src.select(col("doc_id").as("ida"), col("source").as("sa")), "ida")
          .join(src.select(col("doc_id").as("idb"), col("source").as("sb")), "idb")
          .select(least(col("sa"), col("sb")).as("source_a"),
            greatest(col("sa"), col("sb")).as("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH base AS ($bruteJaccardSql),
              |j AS (SELECT LEAST(da.source, db.source) AS source_a,
              |        GREATEST(da.source, db.source) AS source_b
              |      FROM base JOIN documents da ON base.ida = da.doc_id
              |                JOIN documents db ON base.idb = db.doc_id)
              |SELECT source_a, source_b, COUNT(*) AS n_pairs
              |FROM j GROUP BY 1, 2
              |ORDER BY source_a, source_b""".stripMargin)),

    // DD8 — the dedup APPLY step: corpus minus non-representative near-
    // dup cluster members (keep the min-id doc per cluster)
    Q("dd8_dedup_apply",
      (s, dir) => Dedup.dropNearDuplicates(
        t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE base AS ($bruteJaccardSql),
              |nodes AS (SELECT ida AS id FROM base UNION SELECT idb FROM base),
              |edges AS (SELECT ida AS a, idb AS b FROM base
              |          UNION ALL SELECT idb, ida FROM base),
              |reach(id, label) AS (
              | SELECT id, id FROM nodes
              | UNION
              | SELECT e.a, r.label FROM edges e JOIN reach r ON r.id = e.b
              |),
              |clusters AS (SELECT id, MIN(label) AS cluster FROM reach GROUP BY id)
              |SELECT doc_id, lang, n_chars FROM documents
              |WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster)
              |ORDER BY doc_id""".stripMargin)),

    // DD6 — edit-distance (Levenshtein) text similarity on a sample
    Q("dd6_edit_distance",
      (s, dir) => {
        val sample = t(s, dir, "documents").filter(col("doc_id") % 50 === 0)
          .select(col("doc_id"), col("text"))
        val a = sample.select(col("doc_id").as("ida"), col("text").as("ta"))
        val b = sample.select(col("doc_id").as("idb"), col("text").as("tb"))
        a.crossJoin(b).filter(col("ida") < col("idb"))
          .select(col("ida"), col("idb"),
            levenshtein(col("ta"), col("tb")).cast(LongType).as("edit_dist"))
          .orderBy("ida", "idb")
      },
      Some("""SELECT a.doc_id AS ida, b.doc_id AS idb,
             | CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
             |FROM (SELECT * FROM documents WHERE doc_id % 50 = 0) a
             |JOIN (SELECT * FROM documents WHERE doc_id % 50 = 0) b
             | ON a.doc_id < b.doc_id
             |ORDER BY ida, idb""".stripMargin)),

    // DD9 — edit-distance near-dups via LOSSLESS length banding (the
    // scale form of dd6: levenshtein >= length difference, so adjacent
    // length bands cover every pair within maxDist — band equi-join,
    // no cross product). Sampled to keep the DuckDB oracle's exact
    // levenshtein affordable; the operator itself runs full-corpus.
    Q("dd9_edit_banded",
      (s, dir) => Dedup.editDistancePairs(
        t(s, dir, "documents").filter(col("doc_id") % 5 === 0),
        "doc_id", "text", maxDist = 20)
        .orderBy("ida", "idb"),
      Some("""SELECT a.doc_id AS ida, b.doc_id AS idb
             |FROM (SELECT * FROM documents WHERE doc_id % 5 = 0) a
             |JOIN (SELECT * FROM documents WHERE doc_id % 5 = 0) b
             | ON a.doc_id < b.doc_id
             | AND abs(length(a.text) - length(b.text)) <= 20
             | AND levenshtein(a.text, b.text) <= 20
             |ORDER BY ida, idb""".stripMargin)),

    // DD10 — incremental dedup: the daily-ingest shape. The re-crawl
    // batch (every 10th doc under a shifted id) probes the corpus's band
    // index; corpus×corpus pairs never materialize. Oracle = brute-force
    // Jaccard over the union, restricted to pairs touching the batch
    // (batch ids are all ≥ 1000000, so idb ≥ 1000000 ⟺ ≥1 new side).
    Q("dd10_incremental_dedup",
      (s, dir) => {
        val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val batch = t(s, dir, "documents").filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        Dedup.incrementalNearDups(corpus, batch, "doc_id", "text")
          .orderBy("ida", "idb")
      },
      Some(s"""WITH pool AS ($docsWithDupsSql),
              |grams AS (
              |  SELECT DISTINCT doc_id, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS gram
              |  FROM (SELECT doc_id,
              |          string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS ws
              |        FROM pool) w,
              |  LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS g) _t
              |), gc AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
              |i AS (SELECT x.doc_id AS ida, y.doc_id AS idb, COUNT(*) AS inter
              |      FROM grams x JOIN grams y ON x.gram = y.gram AND x.doc_id < y.doc_id
              |      GROUP BY 1, 2)
              |SELECT i.ida, i.idb FROM i
              |JOIN gc a ON a.doc_id = i.ida JOIN gc b ON b.doc_id = i.idb
              |WHERE 5 * i.inter >= 4 * (a.n + b.n - i.inter) AND i.idb >= 1000000
              |ORDER BY i.ida, i.idb""".stripMargin)),

    // SS1 — brute-force cosine top-k (query = vec 0's embedding)
    Q("ss1_cosine_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val query = emb.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0).toArray
        Similarity.bruteForceTopK(
          emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", query, 10)
          .select("vec_id")
      },
      Some("""SELECT e.vec_id
             |FROM embeddings e,
             |  (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0) _q
             |WHERE e.vec_id <> 0
             |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q) DESC,
             |  e.vec_id LIMIT 10""".stripMargin)),

    // SS1B — ANN top-k through the bucket-PARTITIONED LSH layout: the
    // bench's standing-pipeline ANN row (replacing ss1's full-scan as
    // the headliner — ss1 stays as the exact-twin correctness row). The
    // corpus is written once partitioned by its seed-42 LSH bucket
    // (fingerprint-keyed, amortized like any database index); the query
    // is a committed EXTERNAL vector (the user-embedding shape), so its
    // bucket is a driver-side constant and the whole query is ONE probe
    // job that prunes to the hamming-1 buckets AT THE FILE INDEX — the
    // scan's PartitionFilters do the work and ~(nbits+1)/2^nbits of the
    // corpus is read (plan-guarded in LlmOpsSpec). The oracle replays
    // the probe from the inlined hyperplanes and query literal.
    Q("ss1b_cosine_topk_indexed",
      (s, dir) => {
        // by-name source: the warm path (layout on disk) never resolves
        // the embeddings relation — only the fingerprint walk runs
        val idxPath = Similarity.ensureLshBucketLayout(
          t(s, dir, "embeddings"), "embedding", dir)
        // resolved ONCE per (session, path) and reused across
        // executions: the layout path is content-keyed, so the cached
        // relation can never serve stale files, and the per-execution
        // partition-spec + footer re-derivation was a fixed driver-side
        // tax on a probe that reads 5 buckets (ss1b_parts, r17)
        val idx = Similarity.layoutRelation(s, idxPath)
        val query = ss1bQuery
        val planes = Similarity.hyperplanes(64, 4)
        val qBits = planes.zipWithIndex.map { case (p, i) =>
          if (p.zip(query).map { case (a, b) => a * b.toDouble }.sum >= 0.0)
            1L << i
          else 0L
        }.sum
        val probes = qBits +: (0 until 4).map(i => qBits ^ (1L << i))
        Similarity.bruteForceTopK(
          idx.filter(col("bucket").isin(probes: _*)),
          "embedding", "vec_id", query, 10)
          .select("vec_id")
      },
      Some(ss1bOracleSql),
      bench = true),

    // SS2 — the PRUNED LSH operating point, driver-checkable: per query
    // vector, (candidate count, recall@10 vs the exact twin computed in
    // the same job) as integers. The candidate membership is a
    // deterministic function of (data, committed seed-42 hyperplanes), so
    // the oracle replays the whole pruned search in SQL — the plane
    // constants are inlined into the oracle text at generation time, and
    // both engines take the same sign decisions because dot products are
    // sequential double folds on both sides. The at-scale recall evidence
    // (10x/100x replicas) stays in RECALL_AUDIT; this row makes the
    // operating point itself hash-gated instead of rows-only.
    Q("ss2_ann_lsh",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val rows = (0L to 4L).map { qid =>
          val query = emb.filter(col("vec_id") === qid)
            .select("embedding").head().getSeq[Float](0).toArray
          val base = emb.filter(col("vec_id") =!= qid)
          val approx = Similarity.lshTopK(
            base, "embedding", "vec_id", query, 10).select("vec_id")
          val exact = Similarity.bruteForceTopK(
            base, "embedding", "vec_id", query, 10).select("vec_id")
          val nProbed = Similarity.lshCandidates(
            base, "embedding", "vec_id", query)
            .agg(count(lit(1)).as("n_probed"))
          val hits = approx.join(exact, Seq("vec_id"))
            .agg(count(lit(1)).as("hits"))
          nProbed.crossJoin(hits).select(
            lit(qid).as("query_vec"), col("n_probed"),
            (col("hits") * 100).as("recall_permille"))
        }
        rows.reduce(_.unionByName(_)).orderBy("query_vec")
      },
      Some(ss2OracleSql)),

    // SS2X — LSH probed exhaustively (probeHamming = nbits): every bucket
    // is probed, the candidate set is the whole corpus, and the result is
    // the exact top-k — which oracle-checks the entire bucketing machinery
    // (plane projection, sign-bit bucket assembly, probe filter, in-bucket
    // scoring), the same trick ss4 plays with IVF's nprobe = nlist. The
    // pruned ss2 operating point stays recall-gated in LlmOpsSpec.
    Q("ss2x_lsh_exhaustive",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val query = emb.filter(col("vec_id") === 2)
          .select("embedding").head().getSeq[Float](0).toArray
        Similarity.lshTopK(
          emb.filter(col("vec_id") =!= 2), "embedding", "vec_id", query, 10,
          probeHamming = 4)
          .select("vec_id")
      },
      Some("""SELECT e.vec_id
             |FROM embeddings e,
             |  (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 2) _q
             |WHERE e.vec_id <> 2
             |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q) DESC,
             |  e.vec_id LIMIT 10""".stripMargin)),

    // CUR1 — end-to-end curation pipeline: exact-dup removal (fingerprint
    // groups keep min id) → quality gate → language routing. The composed
    // form of tx1/tx2/tx4 — one declarative plan, one aggregation + one
    // projection pass at scale.
    Q("cur1_curation_pipeline",
      (s, dir) => {
        val docs = docsWithDups(s, dir)
        val kept = docs
          .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
          .agg(min("doc_id").as("doc_id"), count(lit(1)).as("copies"))
        val scored = kept.join(docs, Seq("doc_id"))
          .select(col("doc_id"), col("copies"),
            TextAnalysis.qualityScore(col("text")).as("quality"),
            TextAnalysis.langId(col("text")).as("lang_pred"))
        scored
          .withColumn("keep", col("quality") >= 40)
          .orderBy("doc_id")
      },
      Some(s"""WITH pool AS ($docsWithDupsSql),
              |kept AS (
              | SELECT MIN(doc_id) AS doc_id, COUNT(*) AS copies
              | FROM (SELECT doc_id,
              |   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
              |   text FROM pool)
              | GROUP BY fp
              |),
              |scored AS (
              | SELECT k.doc_id, k.copies,
              |  (CAST(LEAST(CAST(length(p.text) AS BIGINT), 400) * 40 // 400 AS BIGINT)
              |   + CAST(LEAST(stop_pm, 150) * 40 // 150 AS BIGINT)
              |   + CAST(LEAST(n_tokens, 80) * 20 // 80 AS BIGINT)) AS quality,
              |  lang_pred
              | FROM kept k JOIN pool p ON p.doc_id = k.doc_id
              | CROSS JOIN LATERAL (
              |  SELECT CAST(CASE WHEN nrm = '' THEN 0
              |    ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END AS BIGINT) AS n_tokens
              |  FROM (SELECT trim(regexp_replace(p.text, '\\s+', ' ', 'g')) AS nrm)) _tok
              | CROSS JOIN LATERAL (
              |  SELECT CASE WHEN n_tokens = 0 THEN 0
              |   ELSE stop_raw * 1000 // n_tokens END AS stop_pm
              |  FROM (SELECT CAST(
              |    (length(pp) - length(replace(pp, ' the ', ''))) / 5
              |    + (length(pp) - length(replace(pp, ' a ', ''))) / 3
              |    + (length(pp) - length(replace(pp, ' and ', ''))) / 5
              |    + (length(pp) - length(replace(pp, ' is ', ''))) / 4
              |    + (length(pp) - length(replace(pp, ' of ', ''))) / 4
              |    + (length(pp) - length(replace(pp, ' to ', ''))) / 4 AS BIGINT) AS stop_raw
              |   FROM (SELECT ' ' || lower(p.text) || ' ' AS pp))) _stop
              | CROSS JOIN LATERAL (
              |  SELECT ${langCaseSql("p.text")} AS lang_pred) _lang
              |)
              |SELECT doc_id, copies, quality, lang_pred, quality >= 40 AS keep
              |FROM scored ORDER BY doc_id""".stripMargin)),

    // TX8 — corpus-statistics rarity score (unigram-LM proxy): each
    // document scored by the average inverse corpus frequency of its
    // tokens, integer-rationalized (1e6 // count, then // n_tokens) so
    // both engines agree exactly. Two shuffles at scale: one corpus
    // unigram count, one token→count join back (the count table is
    // vocabulary-sized — broadcastable).
    Q("tx8_rarity_score", {
      (s, dir) =>
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(trim(col("text")), "\\s+")).as("tok"))
          .filter(col("tok") =!= "")
        val counts = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        // no broadcast hint: vocabulary-grain counts can outgrow executor
        // memory at web scale; AQE picks broadcast when they are small
        toks.join(counts, "tok")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(expr("1000000 div n")).as("rarity_sum"))
          .select(col("doc_id"), col("n_tokens"),
            expr("CAST(rarity_sum div n_tokens AS BIGINT)").as("rarity_ppm"))
          .orderBy("doc_id")
    },
      Some("""WITH toks AS (
             | SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
             | FROM documents),
             |toks2 AS (SELECT * FROM toks WHERE tok <> ''),
             |counts AS (SELECT tok, COUNT(*) AS n FROM toks2 GROUP BY 1)
             |SELECT doc_id, COUNT(*) AS n_tokens,
             | CAST(SUM(1000000 // n) // COUNT(*) AS BIGINT) AS rarity_ppm
             |FROM toks2 JOIN counts USING (tok)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // TX14 — hashed n-gram linear quality classifier (fastText-style,
    // the CCNet/Dolma quality gate): salted-md5 1-2-gram buckets →
    // broadcast weight-table join → integer fixed-point dot product
    // per doc. The oracle replays the SAME md5 hashes, so the compare
    // is bit-exact. Scale shape: the per-doc gram array is one codegen
    // scan expression; explode feeds a broadcast join whose partial
    // aggregate collapses back to doc grain before the only exchange —
    // shuffle rows ≈ docs, never grams. The 4096-bucket table is the
    // trained-model stand-in; a real model swaps the table, not the
    // plan.
    Q("tx14_quality_classifier",
      (s, dir) => {
        val b = 4096
        // r17: the weight attach is a pure array index, so the whole
        // dot product folds into ONE scan-side expression — no explode
        // (which multiplied rows ~60× per doc), no broadcast join, no
        // per-gram partial aggregate, and the only remaining exchange
        // is the final orderBy's (guide §3.3/§2.3; measured below).
        // Docs with zero grams stay absent, exactly as the join+group
        // form (and the oracle's JOIN + GROUP BY) dropped them.
        val w = typedlit(TextAnalysis.qualityWeights(b))
        t(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.hashedGramBuckets(col("text"), b).as("_bks"))
          .filter(size(col("_bks")) > 0)
          .select(col("doc_id"),
            size(col("_bks")).cast(LongType).as("n_grams"),
            aggregate(col("_bks"), lit(0L), (acc, x) =>
              acc + element_at(w, (x + 1L).cast("int"))).as("score_milli"))
          .withColumn("keep", (col("score_milli") >= 0L).cast(LongType))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT i AS bucket,
             |  ((i * 2654435761) % 2147483648) % 2001 - 1000 AS w_milli
             | FROM (SELECT unnest(generate_series(0, 4095)) AS i)),
             |d AS (SELECT doc_id,
             |  string_split(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'))), ' ') AS ws
             | FROM documents),
             |grams AS (
             | SELECT doc_id, g FROM
             |  (SELECT doc_id, unnest(ws) AS g FROM d) WHERE g <> ''
             | UNION ALL
             | SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
             | FROM d, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) _i
             | WHERE ws[i] <> '' AND ws[i+1] <> ''),
             |b AS (SELECT doc_id,
             |  CAST(CAST(('0x' || substr(md5('q:' || g), 1, 8)) AS UBIGINT) % 4096 AS BIGINT) AS bucket
             | FROM grams)
             |SELECT doc_id, COUNT(*) AS n_grams,
             | CAST(SUM(w_milli) AS BIGINT) AS score_milli,
             | CAST(SUM(w_milli) >= 0 AS BIGINT) AS keep
             |FROM b JOIN w USING (bucket)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // CUR2 — the full training-data pipeline composed from the scale
    // operators: MinHash near-dup dedup (keep cluster representative) →
    // token-budget gate → deterministic per-language cap. One plan:
    // LSH shuffle + anti-join + scan-side expressions + one window.
    Q("cur2_dedup_budget_cap",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val deduped = Dedup.dropNearDuplicates(docs, "doc_id", "text")
          .select(col("doc_id"), col("lang"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens"))
          .filter(col("n_tokens") >= 10)
        graft.operators.Sampling.stratifiedLimit(
          deduped, Seq("lang"), Seq(col("doc_id")), n = 50)
          .orderBy("lang", "doc_id")
      },
      // Linear-equivalent oracle form: identical normalized texts ALWAYS
      // pair (equal shingle sets -> Jaccard 1 >= 4/5), so the corpus is
      // collapsed to one representative per DISTINCT text before the
      // quadratic gram self-join and the reachability CTE — both then
      // scale with distinct texts, not corpus size (a K-replica corpus
      // costs the same as 1x; the old form's gram join exploded K^2 and
      // timed out the 100x audit referee). Equivalence: a doc survives
      // the dedup+gate iff it IS its component's min doc_id, and since
      // every >=10-token doc carries 3-gram shingles, the component min
      // is exactly the min over per-text minima (the rep labels).
      Some("""WITH RECURSIVE
              |toks AS (
              | SELECT doc_id, lang, nrm,
              |  CAST(CASE WHEN nrm = '' THEN 0
              |   ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END AS BIGINT) AS n_tokens
              | FROM (SELECT doc_id, lang,
              |   trim(regexp_replace(text, '\s+', ' ', 'g')) AS nrm
              |  FROM documents)),
              |texts AS (SELECT nrm, MIN(doc_id) AS rep FROM toks
              |          WHERE n_tokens >= 3 GROUP BY nrm),
              |grams AS (
              | SELECT DISTINCT rep, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS gram
              | FROM (SELECT rep, string_split(nrm, ' ') AS ws FROM texts) w,
              | LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS g) _t),
              |gc AS (SELECT rep, COUNT(*) AS n FROM grams GROUP BY 1),
              |i AS (SELECT x.rep AS ida, y.rep AS idb, COUNT(*) AS inter
              |      FROM grams x JOIN grams y ON x.gram = y.gram AND x.rep < y.rep
              |      GROUP BY 1, 2),
              |base AS (SELECT i.ida, i.idb FROM i
              | JOIN gc a ON a.rep = i.ida JOIN gc b ON b.rep = i.idb
              | WHERE 5 * i.inter >= 4 * (a.n + b.n - i.inter)),
              |edges AS (SELECT ida AS a, idb AS b FROM base
              |          UNION ALL SELECT idb, ida FROM base),
              |reach(id, label) AS (
              | SELECT rep, rep FROM texts
              | UNION
              | SELECT e.a, r.label FROM edges e JOIN reach r ON r.id = e.b
              |),
              |comp AS (SELECT id AS rep, MIN(label) AS cluster FROM reach GROUP BY id),
              |gated AS (
              | SELECT t.doc_id, t.lang, t.n_tokens
              | FROM toks t JOIN texts x ON x.nrm = t.nrm
              | JOIN comp c ON c.rep = x.rep
              | WHERE t.n_tokens >= 10 AND t.doc_id = c.cluster)
              |SELECT lang, doc_id, n_tokens FROM (
              | SELECT lang, doc_id, n_tokens,
              |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
              | FROM gated)
              |WHERE rn <= 50 ORDER BY lang, doc_id""".stripMargin)),

    // CUR3 — token-budget shard packing: greedy sequential assignment of
    // documents to fixed-token-budget training shards, one running sum
    // per language partition (shard = budget-quotient of the doc's START
    // offset, so a doc spilling past a boundary opens the next shard).
    // At scale this is one window per partition key — the packing
    // parallelizes across languages/sources, never a global sort.
    Q("cur3_token_budget_pack",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens"))
          .withColumn("cum_tokens", sum("n_tokens").over(w))
          .withColumn("shard",
            expr("CAST((cum_tokens - n_tokens) div 2000 AS BIGINT)"))
          .orderBy("lang", "doc_id")
      },
      Some("""SELECT doc_id, lang, n_tokens,
             | CAST(cum_tokens AS BIGINT) AS cum_tokens,
             | CAST((cum_tokens - n_tokens) // 2000 AS BIGINT) AS shard
             |FROM (
             | SELECT doc_id, lang, n_tokens,
             |  SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
             | FROM (
             |  SELECT doc_id, lang,
             |   CAST(CASE WHEN nrm = '' THEN 0
             |    ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END AS BIGINT) AS n_tokens
             |  FROM (SELECT doc_id, lang,
             |    trim(regexp_replace(text, '\\s+', ' ', 'g')) AS nrm
             |   FROM documents)))
             |ORDER BY lang, doc_id""".stripMargin)),

    // CUR4 — training-mix rebalancing: per-source token shares and the
    // integer re-weighting factor that equalizes the mix (weight_ppm =
    // what you'd multiply each source's sampling rate by to hit a
    // uniform target). One aggregate + one scalar window over the
    // vocabulary-sized per-source table.
    Q("cur4_source_mix",
      (s, dir) => {
        val perSrc = t(s, dir, "documents")
          .select(col("source"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tot_tokens"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy().rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        perSrc
          .withColumn("grand", sum("tot_tokens").over(w))
          .withColumn("n_sources", count(lit(1)).over(w))
          .select(col("source"), col("n_docs"), col("tot_tokens"),
            expr("CAST(tot_tokens * 1000000 div grand AS BIGINT)").as("share_ppm"),
            expr("CAST((grand div n_sources) * 1000000 div tot_tokens AS BIGINT)")
              .as("weight_ppm"))
          .orderBy("source")
      },
      Some("""SELECT source, n_docs, tot_tokens,
             | CAST(tot_tokens * 1000000 // grand AS BIGINT) AS share_ppm,
             | CAST((grand // n_sources) * 1000000 // tot_tokens AS BIGINT) AS weight_ppm
             |FROM (
             | SELECT source, n_docs, tot_tokens,
             |  SUM(tot_tokens) OVER () AS grand,
             |  COUNT(*) OVER () AS n_sources
             | FROM (
             |  SELECT source, COUNT(*) AS n_docs,
             |   CAST(SUM(CAST(CASE WHEN nrm = '' THEN 0
             |    ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END AS BIGINT)) AS BIGINT) AS tot_tokens
             |  FROM (SELECT source,
             |    trim(regexp_replace(text, '\\s+', ' ', 'g')) AS nrm
             |   FROM documents)
             |  GROUP BY source))
             |ORDER BY source""".stripMargin)),

    // CUR7 — TEMPERATURE-scaled source mixing (the multilingual-sampling
    // rule of mBERT / mT5, arXiv:1910.10683 §3.4.1: sample source i with
    // probability ∝ p_i^α, α = 1/2): rare sources are upsampled, dominant
    // ones damped. Exact-integer: share in ppm, then FLOOR(SQRT(ppm)) —
    // sqrt of an integer-valued double is correctly rounded IEEE in both
    // engines, and fe4 set the one-sqrt precedent. Source-cardinality
    // frames throughout; one scan + one tiny window.
    Q("cur7_temperature_mix",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy().rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        t(s, dir, "documents")
          .select(col("source"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens"))
          .groupBy("source")
          .agg(sum("n_tokens").as("tot_tokens"))
          .withColumn("grand", sum("tot_tokens").over(w))
          .withColumn("share_ppm",
            expr("CAST(tot_tokens * 1000000 div grand AS BIGINT)"))
          .withColumn("root",
            expr("CAST(FLOOR(SQRT(CAST(share_ppm AS DOUBLE))) AS BIGINT)"))
          .withColumn("root_sum", sum("root").over(w))
          .select(col("source"), col("tot_tokens"), col("share_ppm"),
            expr("CAST(root * 1000000 div root_sum AS BIGINT)").as("sampled_ppm"))
          .orderBy("source")
      },
      Some("""SELECT source, tot_tokens, share_ppm,
             | CAST(root * 1000000 // SUM(root) OVER () AS BIGINT) AS sampled_ppm
             |FROM (
             | SELECT source, tot_tokens, share_ppm,
             |  CAST(FLOOR(SQRT(CAST(share_ppm AS DOUBLE))) AS BIGINT) AS root
             | FROM (
             |  SELECT source, tot_tokens,
             |   CAST(tot_tokens * 1000000 // SUM(tot_tokens) OVER () AS BIGINT) AS share_ppm
             |  FROM (
             |   SELECT source, CAST(SUM(CAST(CASE WHEN nrm = '' THEN 0
             |    ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END AS BIGINT)) AS BIGINT) AS tot_tokens
             |   FROM (SELECT source,
             |     trim(regexp_replace(text, '\\s+', ' ', 'g')) AS nrm
             |    FROM documents)
             |   GROUP BY source)))
             |ORDER BY source""".stripMargin)),

    // S9 — Neyman optimal stratified allocation (Neyman 1934): a 10k-doc
    // sample budget split across sources ∝ N_h·σ_h — strata with more
    // internal variance (here: of doc length) get more samples than
    // proportional allocation gives them. σ from exact integer sums
    // (n·Σx² − (Σx)², the fe4 overflow class → DECIMAL), one FLOOR(SQRT)
    // per stratum (the cur7 precedent). Source-cardinality frames only.
    Q("s9_neyman_alloc",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy().rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        t(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_h"),
            sum(col("n_chars")).as("sx"),
            sum(col("n_chars").cast(DecimalType(38, 0)) * col("n_chars"))
              .as("sxx"))
          // integer variance proxy: floor of population variance
          .withColumn("var_h",
            expr("CAST((n_h * sxx - CAST(sx AS DECIMAL(38,0)) * sx) div (CAST(n_h AS DECIMAL(38,0)) * n_h) AS BIGINT)"))
          .withColumn("sd_h",
            expr("CAST(FLOOR(SQRT(CAST(var_h AS DOUBLE))) AS BIGINT)"))
          .withColumn("nsd", col("n_h") * col("sd_h"))
          .withColumn("nsd_tot", sum("nsd").over(w))
          .select(col("source"), col("n_h"), col("var_h"), col("sd_h"),
            expr("CAST(nsd * 10000 div nsd_tot AS BIGINT)").as("alloc"))
          .orderBy("source")
      },
      Some("""SELECT source, n_h, var_h,
             | CAST(FLOOR(SQRT(CAST(var_h AS DOUBLE))) AS BIGINT) AS sd_h,
             | CAST(n_h * CAST(FLOOR(SQRT(CAST(var_h AS DOUBLE))) AS BIGINT) * 10000
             |   // SUM(n_h * CAST(FLOOR(SQRT(CAST(var_h AS DOUBLE))) AS BIGINT)) OVER ()
             |   AS BIGINT) AS alloc
             |FROM (
             | SELECT source, n_h,
             |  CAST((n_h * sxx - sx * sx) // (CAST(n_h AS HUGEINT) * n_h) AS BIGINT) AS var_h
             | FROM (
             |  SELECT source, COUNT(*) AS n_h,
             |   CAST(SUM(n_chars) AS HUGEINT) AS sx,
             |   SUM(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
             |  FROM documents GROUP BY source))
             |ORDER BY source""".stripMargin)),

    // S10 — split LEAKAGE audit: near-duplicate pairs (Jaccard >= 9/10
    // on word sets, the cur6/sj1 join) that cross the s4 train/val/test
    // boundaries — the measurement behind "a near-copy of a test doc
    // sits in train", which is what cluster-grain splitting (s8) exists
    // to prevent and naive content-hash splitting (s4) does not. Output
    // is the (split_a, split_b) pair-count matrix; off-diagonal rows
    // are the leak. Spark side never forms the all-pairs compare (the
    // prefix-filtered join prunes); the oracle spells the quadratic
    // truth, so this row stays out of the large-replica audits like
    // sj1/cur6.
    Q("s10_split_leakage",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bucket = expr(
          "CAST(conv(substring(md5(text), 1, 4), 16, 10) AS BIGINT) % 100")
        val sp = docs.select(col("doc_id"),
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").as("split"))
        val toks = docs.select(col("doc_id"),
          graft.operators.Corpus.words(col("text")).as("toks"))
        val pairs = graft.operators.SetSimJoin
          .jaccardSelfJoin(toks, "doc_id", "toks", tNum = 9, tDen = 10)
        pairs
          .join(sp.select(col("doc_id").as("ida"), col("split").as("split_a")),
            Seq("ida"))
          .join(sp.select(col("doc_id").as("idb"), col("split").as("split_b")),
            Seq("idb"))
          .groupBy("split_a", "split_b")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(asc_nulls_first("split_a"), asc_nulls_first("split_b"))
      },
      Some("""WITH s AS (SELECT doc_id,
             |  list_distinct(string_split(trim(regexp_replace(text,'\s+',' ','g')),' ')) AS toks
             |  FROM documents),
             |sn AS (SELECT doc_id, toks FROM s WHERE len(toks) > 0),
             |sp AS (SELECT doc_id,
             |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
             |       ELSE 'test' END AS split
             | FROM (SELECT doc_id,
             |    CAST(CAST(('0x'||substr(md5(text),1,4)) AS UBIGINT) % 100 AS BIGINT) AS b
             |   FROM documents)),
             |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb
             | FROM sn a JOIN sn b ON a.doc_id < b.doc_id
             | WHERE len(list_intersect(a.toks, b.toks)) * 10
             |   >= (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) * 9)
             |SELECT sa.split AS split_a, sb.split AS split_b, count(*) AS n_pairs
             |FROM p JOIN sp sa ON sa.doc_id = p.ida
             |       JOIN sp sb ON sb.doc_id = p.idb
             |GROUP BY 1, 2
             |ORDER BY split_a NULLS FIRST, split_b NULLS FIRST""".stripMargin)),

    // S11 — temporal split with an embargo gap (the backtesting split:
    // train strictly before day 19, a 2-day embargo absorbing
    // label/feature horizons that straddle the boundary, test from day
    // 21) — the time-series sibling of s4's content-hash split and
    // s8's cluster split. Split assignment is a pure function of event
    // time, so it is reproducible on any cluster. The audit emits per
    // split: events, distinct users, how many of those users also
    // appear in train (time splits share users BY DESIGN — this column
    // is the number a user-level-split decision is made on), and the
    // day range proving the embargo gap is respected.
    Q("s11_temporal_split",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_id"), col("user_id"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
            .cast(LongType).as("day"))
        val sp = e.withColumn("split",
          when(col("day") < 19, "train").when(col("day") < 21, "embargo")
            .otherwise("test"))
        val trainUsers = sp.filter(col("split") === "train")
          .select("user_id").distinct()
        val overlap = sp.select("split", "user_id").distinct()
          .join(trainUsers, Seq("user_id"))
          .groupBy("split").agg(count(lit(1)).as("n_users_in_train"))
        sp.groupBy("split")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            min("day").as("min_day"), max("day").as("max_day"))
          .join(overlap, Seq("split"), "left")
          .select(col("split"), col("n_events"), col("n_users"),
            coalesce(col("n_users_in_train"), lit(0L)).as("n_users_in_train"),
            col("min_day"), col("max_day"))
          .orderBy("split")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
             |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
             |  FROM events),
             |s AS (SELECT event_id, user_id, day,
             |  CASE WHEN day < 19 THEN 'train' WHEN day < 21 THEN 'embargo'
             |       ELSE 'test' END AS split FROM e),
             |tu AS (SELECT DISTINCT user_id FROM s WHERE split = 'train'),
             |ov AS (SELECT du.split,
             |    CAST(count(*) AS BIGINT) AS n_users_in_train
             |  FROM (SELECT DISTINCT split, user_id FROM s) du
             |  JOIN tu USING (user_id) GROUP BY 1)
             |SELECT s.split, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT s.user_id) AS BIGINT) AS n_users,
             |  CAST(COALESCE(any_value(ov.n_users_in_train), 0) AS BIGINT)
             |    AS n_users_in_train,
             |  CAST(min(s.day) AS BIGINT) AS min_day,
             |  CAST(max(s.day) AS BIGINT) AS max_day
             |FROM s LEFT JOIN ov ON ov.split = s.split
             |GROUP BY s.split
             |ORDER BY s.split""".stripMargin)),

    // S4 — deterministic train/val/test split on a PORTABLE content
    // hash: bucket = first 16 bits of md5(text) mod 100 (Spark `conv`,
    // DuckDB hex-digit fold — same value in both engines, unlike
    // xxhash64), 80/10/10. Content-keyed ⇒ identical assignment on any
    // cluster at any scale; the audit output is the per-(split, lang)
    // count matrix.
    Q("s4_three_way_split",
      (s, dir) => {
        val bucket = expr("CAST(conv(substring(md5(text), 1, 4), 16, 10) AS BIGINT) % 100")
        t(s, dir, "documents")
          .withColumn("split",
            when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n"))
          .orderBy("split", "lang")
      },
      Some("""SELECT split, lang, COUNT(*) AS n
             |FROM (
             | SELECT lang,
             |  CASE WHEN bucket < 80 THEN 'train'
             |       WHEN bucket < 90 THEN 'val'
             |       ELSE 'test' END AS split
             | FROM (
             |  SELECT lang,
             |   list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(str_split(substring(md5(text), 1, 4), ''),
             |     c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
             |    (a, d) -> a * 16 + d) % 100 AS bucket
             |  FROM documents))
             |GROUP BY split, lang
             |ORDER BY split, lang""".stripMargin)),

    // S5 — deterministic weighted sampling: APPLY cur4's equalizing
    // weights by content-hash rejection — keep a row iff its portable
    // md5 bucket (ppm) falls below its source's weight. Fully
    // deterministic ⇒ the exact kept row set is oracle-checkable, unlike
    // rand()-based sampling; at scale this is one broadcast join (the
    // weight table is source-cardinality) + a scan-side filter.
    Q("s5_weighted_sample",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val perSrc = docs
          .select(col("source"), TextAnalysis.tokenCount(col("text")).as("nt"))
          .groupBy("source").agg(sum("nt").as("tot"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy().rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        val weights = perSrc
          .withColumn("grand", sum("tot").over(w))
          .withColumn("ns", count(lit(1)).over(w))
          .select(col("source"),
            expr("CAST((grand div ns) * 1000000 div tot AS BIGINT)").as("w_ppm"))
        val bucket = expr(
          "CAST(conv(substring(md5(text), 1, 6), 16, 10) AS BIGINT) % 1000000")
        docs.join(broadcast(weights), "source")
          .filter(bucket < least(col("w_ppm"), lit(1000000L)))
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id")
      },
      Some("""WITH persrc AS (
             | SELECT source, CAST(SUM(CAST(CASE WHEN nrm = '' THEN 0
             |   ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END AS BIGINT)) AS BIGINT) AS tot
             | FROM (SELECT source,
             |   trim(regexp_replace(text, '\\s+', ' ', 'g')) AS nrm
             |  FROM documents)
             | GROUP BY source),
             |weights AS (
             | SELECT source,
             |  CAST((SUM(tot) OVER () // COUNT(*) OVER ()) * 1000000 // tot AS BIGINT) AS w_ppm
             | FROM persrc)
             |SELECT d.doc_id, d.source
             |FROM documents d JOIN weights w ON d.source = w.source
             |WHERE list_reduce(list_prepend(CAST(0 AS BIGINT),
             |   list_transform(str_split(substring(md5(d.text), 1, 6), ''),
             |    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
             |   (a, x) -> a * 16 + x) % 1000000 < LEAST(w.w_ppm, 1000000)
             |ORDER BY d.doc_id""".stripMargin)),

    // S8 — LEAKAGE-SAFE train/val/test split: s4's portable md5 bucket,
    // but keyed on the near-dup CLUSTER representative instead of the
    // doc's own content — every member of a near-dup cluster lands in
    // the same split, so a test doc can never have a near-duplicate in
    // train. The output is the per-split audit (docs, distinct groups,
    // and the PROVEN-zero count of clusters spanning >1 split). At scale:
    // clusters come from the LSH pipeline + log-star contraction; the
    // split itself is one broadcast-sized join + scan-side hash.
    Q("s8_cluster_split",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val clusters = Dedup.connectedComponentsLogStar(
          Dedup.minHashDedup(docs, "doc_id", "text"))
          .withColumnRenamed("id", "doc_id")
        val withRep = docs.join(clusters, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("cluster"), col("doc_id")).as("rep"))
        val bucket = expr(
          "CAST(conv(substring(md5(CAST(rep AS STRING)), 1, 4), 16, 10) AS BIGINT) % 100")
        val assigned = withRep.withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        val leaky = assigned.groupBy("rep")
          .agg(countDistinct("split").as("ns"))
          .filter(col("ns") > 1)
          .agg(count(lit(1)).as("leaky_clusters"))
        assigned.groupBy("split")
          .agg(count(lit(1)).as("n_docs"), countDistinct("rep").as("n_groups"))
          .crossJoin(leaky)
          .orderBy("split")
      },
      Some(s"""WITH RECURSIVE base AS ($bruteJaccardSql),
              |nodes AS (SELECT ida AS id FROM base UNION SELECT idb FROM base),
              |edges AS (SELECT ida AS a, idb AS b FROM base
              |          UNION ALL SELECT idb, ida FROM base),
              |reach(id, label) AS (
              | SELECT id, id FROM nodes
              | UNION
              | SELECT e.a, r.label FROM edges e JOIN reach r ON r.id = e.b
              |),
              |clusters AS (SELECT id, MIN(label) AS cluster FROM reach GROUP BY id),
              |assigned AS (
              | SELECT doc_id, rep,
              |  CASE WHEN bucket < 80 THEN 'train'
              |       WHEN bucket < 90 THEN 'val'
              |       ELSE 'test' END AS split
              | FROM (
              |  SELECT d0.doc_id, COALESCE(c.cluster, d0.doc_id) AS rep,
              |   list_reduce(list_prepend(CAST(0 AS BIGINT),
              |    list_transform(str_split(substring(
              |      md5(CAST(COALESCE(c.cluster, d0.doc_id) AS VARCHAR)), 1, 4), ''),
              |     h -> CAST(strpos('0123456789abcdef', h) - 1 AS BIGINT))),
              |    (a, x) -> a * 16 + x) % 100 AS bucket
              |  FROM documents d0 LEFT JOIN clusters c ON c.id = d0.doc_id)),
              |leaky AS (SELECT COUNT(*) AS leaky_clusters FROM (
              |  SELECT rep FROM assigned GROUP BY rep
              |  HAVING COUNT(DISTINCT split) > 1))
              |SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT rep) AS n_groups,
              | (SELECT leaky_clusters FROM leaky) AS leaky_clusters
              |FROM assigned GROUP BY split
              |ORDER BY split""".stripMargin)),

    // CUR8 — diverse subset selection by farthest-first traversal
    // (Gonzalez 1985 k-center greedy — the coreset/diversity-sampling
    // primitive of embedding-based curation): seed = min vec_id, then 7×
    // add the candidate maximizing its min distance to the selected set.
    // Distances integerize to micro-units after ONE round (the e16/ss6
    // convention), so every argmax is an integer compare with vec_id
    // ties. Each step is one scan + a ≤8-row broadcast join; only the
    // 1-row argmax reaches the driver (the BPE-training loop shape).
    // The oracle replays all 7 steps as chained CTEs.
    Q("cur8_diverse_select",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val k = 8
        val seed = emb.agg(min(col("vec_id"))).head().getLong(0)
        var selected = Vector(seed)
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Long])](
          (1L, seed, None))
        for (step <- 2 to k) {
          val selDf = broadcast(emb.filter(col("vec_id").isin(selected: _*))
            .select(col("embedding").as("sv")))
          val best = emb.filter(!col("vec_id").isin(selected: _*))
            .crossJoin(selDf)
            .select(col("vec_id"),
              round((lit(1.0) - graft.functions.VectorOps.cosineNative(
                col("embedding"), col("sv"))) * 1000000)
                .cast(LongType).as("d"))
            .groupBy("vec_id").agg(min(col("d")).as("mind"))
            .orderBy(desc("mind"), asc("vec_id"))
            .limit(1).collect().head
          selected = selected :+ best.getLong(0)
          out += ((step.toLong, best.getLong(0), Some(best.getLong(1))))
        }
        out.toSeq.toDF("rk", "vec_id", "mind_micro").orderBy("rk")
      },
      Some(diverseSelectOracleSql(8))),

    // E16 — embedding normalization stats + int8 quantization scale
    // (per-vector max-abs), the preprocessing step before ANN indexing
    Q("e16_embed_quantize",
      (s, dir) => {
        val v = transform(col("embedding"), _.cast(DoubleType))
        val norm = sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
        val maxAbs = aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x)))
        t(s, dir, "embeddings").select(
          col("vec_id"),
          round(norm * 1000).cast(LongType).as("norm_pm"),
          round(maxAbs * 10000).cast(LongType).as("maxabs_dm"),
          col("label"))
          .orderBy("vec_id")
      },
      Some("""SELECT vec_id,
             | CAST(ROUND(sqrt(list_sum(list_transform(v, x -> x * x))) * 1000) AS BIGINT) AS norm_pm,
             | CAST(ROUND(list_max(list_transform(v, x -> abs(x))) * 10000) AS BIGINT) AS maxabs_dm,
             | label
             |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings)
             |ORDER BY vec_id""".stripMargin)),

    // SS3 — the PRUNED IVF operating point, driver-checkable the same
    // way as ss2: per query vector, (candidate count, recall@10 vs the
    // exact twin) as integers. The quantizer here is the DETERMINISTIC
    // iters=0 one — centroids are the 8 lowest-id base vectors, a pure
    // function of the data the oracle reselects in SQL (Lloyd-trained
    // centroids are ULP-order-dependent across engines, so the TRAINED
    // operating point stays recall-gated in LlmOpsSpec/RECALL_AUDIT
    // rather than hash-gated). Cell assignment (first-max argmax over
    // centroid cosines) and probe ranking replay exactly.
    Q("ss3_ann_ivf",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val rows = (0L to 4L).map { qid =>
          val query = emb.filter(col("vec_id") === qid)
            .select("embedding").head().getSeq[Float](0).toArray
          val base = emb.filter(col("vec_id") =!= qid)
          val centroids = Similarity.trainIvfCentroids(
            base, "embedding", "vec_id", k = 8, iters = 0)
          val approx = Similarity.ivfTopK(
            base, "embedding", "vec_id", query, 10, centroids, nprobe = 6)
            .select("vec_id")
          val exact = Similarity.bruteForceTopK(
            base, "embedding", "vec_id", query, 10).select("vec_id")
          val nProbed = Similarity.ivfCandidates(
            base, "embedding", "vec_id", query, centroids, nprobe = 6)
            .agg(count(lit(1)).as("n_probed"))
          val hits = approx.join(exact, Seq("vec_id"))
            .agg(count(lit(1)).as("hits"))
          nProbed.crossJoin(hits).select(
            lit(qid).as("query_vec"), col("n_probed"),
            (col("hits") * 100).as("recall_permille"))
        }
        rows.reduce(_.unionByName(_)).orderBy("query_vec")
      },
      Some(ss3OracleSql)),

    // SS4 — IVF probed exhaustively (nprobe = nlist): the candidate set
    // is the whole corpus, so the result is the exact top-k — which makes
    // the entire IVF machinery (k-means training, cell assignment, probe
    // ordering, in-cell scoring) oracle-checkable, unlike the recall-
    // gated ss3 operating point
    Q("ss4_ivf_exhaustive",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val query = emb.filter(col("vec_id") === 1)
          .select("embedding").head().getSeq[Float](0).toArray
        val base = emb.filter(col("vec_id") =!= 1)
        val centroids = Similarity.trainIvfCentroids(base, "embedding", "vec_id", k = 8, iters = 3)
        Similarity.ivfTopK(base, "embedding", "vec_id", query, 10,
          centroids, nprobe = 8)
          .select("vec_id")
      },
      Some("""SELECT e.vec_id
             |FROM embeddings e,
             |  (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 1) _q
             |WHERE e.vec_id <> 1
             |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q) DESC,
             |  e.vec_id LIMIT 10""".stripMargin)),

    // SS5 — product quantization with exhaustive re-rank: ADC (table-
    // lookup approximate cosine over 8×16 codebooks, the 32× memory-
    // compression ANN path) orders the pool; re-ranking the WHOLE corpus
    // exactly makes the result the exact top-k — so codebook training,
    // encoding, the ADC lookup math, and the re-rank plumbing are all
    // oracle-gated, same pattern as ss2x/ss4. The bounded-re-rank
    // operating point is recall-gated in LlmOpsSpec.
    Q("ss5_pq_exhaustive",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val query = emb.filter(col("vec_id") === 3)
          .select("embedding").head().getSeq[Float](0).toArray
        val base = emb.filter(col("vec_id") =!= 3)
        val codebooks = Similarity.trainPqCodebooks(base, "embedding", "vec_id")
        // rerank = corpus size ⇒ the ADC pool is everything ⇒ exact
        Similarity.pqTopK(base, "embedding", "vec_id", query, 10,
          codebooks, rerank = base.count().toInt)
          .select("vec_id")
      },
      Some("""SELECT e.vec_id
             |FROM embeddings e,
             |  (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 3) _q
             |WHERE e.vec_id <> 3
             |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q) DESC,
             |  e.vec_id LIMIT 10""".stripMargin)),

    // SS7 — IVF + PQ combined, the composition a 100 TB ANN index
    // actually runs: the coarse quantizer prunes to nprobe cells, ADC
    // table lookups (16 adds per row over a 256-entry table — no vector
    // math on the scan) order the survivors, and only the top `rerank`
    // are exact-scored. Gated at the COMMITTED operating point —
    // pqBlocks=16, rerank=100, the round-13 recall-audit min-path
    // promoted in round 14 (RECALL_AUDIT params carry the same point).
    // Both quantizers are the deterministic iters=0 forms, so — unlike
    // the recall-gated Lloyd-trained operating point in LlmOpsSpec —
    // the WHOLE pipeline here replays in SQL: ss3's cell replay
    // composed with ss5's ADC math, emitting the same integer
    // (n_probed, recall@10) bookkeeping as ss2/ss3.
    Q("ss7_ann_ivfpq",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val rows = (0L to 4L).map { qid =>
          val query = emb.filter(col("vec_id") === qid)
            .select("embedding").head().getSeq[Float](0).toArray
          val base = emb.filter(col("vec_id") =!= qid)
          val cents = Similarity.trainIvfCentroids(
            base, "embedding", "vec_id", k = 8, iters = 0)
          val books = Similarity.trainPqCodebooks(
            base, "embedding", "vec_id", nBlocks = 16, k = 16, iters = 0)
          val cand = Similarity.ivfCandidates(
            base, "embedding", "vec_id", query, cents, nprobe = 6)
          val approx = Similarity.pqTopK(
            cand, "embedding", "vec_id", query, 10, books, rerank = 100)
            .select("vec_id")
          val exact = Similarity.bruteForceTopK(
            base, "embedding", "vec_id", query, 10).select("vec_id")
          val nProbed = cand.agg(count(lit(1)).as("n_probed"))
          val hits = approx.join(exact, Seq("vec_id"))
            .agg(count(lit(1)).as("hits"))
          nProbed.crossJoin(hits).select(
            lit(qid).as("query_vec"), col("n_probed"),
            (col("hits") * 100).as("recall_permille"))
        }
        rows.reduce(_.unionByName(_)).orderBy("query_vec")
      },
      Some(ss7OracleSql)),

    // SS8 — attribute-FILTERED vector search (the "filtered ANN" shape
    // every production vector store ships): exact cosine top-10
    // restricted to one label value per query. The label predicate is a
    // plain pushed filter on the scan — PushedFilters carries it to
    // parquet, so at 100 TB the search reads only the qualifying row
    // groups and the rank is a TakeOrderedAndProject over the filtered
    // stream; with a label-partitioned layout (ss1b's trick) the same
    // plan prunes whole files. Exact-mode gate like ss1/ss4.
    Q("ss8_filtered_ann",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val rows = (0L to 2L).map { qid =>
          val query = emb.filter(col("vec_id") === qid)
            .select("embedding").head().getSeq[Float](0).toArray
          val lbl = qid % 10
          val q = array(query.map(lit): _*)
          emb.filter(col("vec_id") =!= qid && col("label") === lbl)
            .select(lit(qid).as("query_vec"), col("vec_id"),
              round(graft.functions.VectorOps.cosineNative(col("embedding"), q)
                * 1000000).cast(LongType).as("cos_micro"),
              col("label"))
            .orderBy(desc_nulls_last("cos_micro"), asc_nulls_first("vec_id"))
            .limit(10)
        }
        rows.reduce(_.unionByName(_)).orderBy(col("query_vec"),
          desc("cos_micro"), asc("vec_id"))
      },
      Some {
        val per = (0L to 2L).map { qid =>
          s"""(SELECT CAST($qid AS BIGINT) AS query_vec, e.vec_id,
             |  CAST(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q)
             |    * 1000000) AS BIGINT) AS cos_micro, e.label
             |FROM embeddings e,
             |  (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings
             |   WHERE vec_id = $qid) _q
             |WHERE e.vec_id <> $qid AND e.label = ${qid % 10}
             |ORDER BY cos_micro DESC, e.vec_id LIMIT 10)""".stripMargin
        }
        per.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY query_vec, cos_micro DESC, vec_id")
      }),

    // TX1 — n-gram/stopword language ID with per-language scores
    Q("tx1_langid",
      (s, dir) => {
        val scores = TextAnalysis.langScores(col("text"))
        t(s, dir, "documents").select(
          (col("doc_id") +: TextAnalysis.langId(col("text")).as("lang_pred") +:
            scores.map { case (n, c) => c.as(n) }): _*)
          .orderBy("doc_id")
      },
      Some(langIdSql)),

    // TX2 — quality features + composite score (permille integers)
    Q("tx2_quality",
      (s, dir) => {
        val feats = TextAnalysis.qualityFeatures(col("text"))
        t(s, dir, "documents").select(
          (col("doc_id") +: feats.map { case (n, c) => c.as(n) } :+
            TextAnalysis.qualityScore(col("text")).as("quality")): _*)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars, n_tokens, stop_pm, punct_pm, avg_tok_len_pm,
             | (CAST(LEAST(n_chars, 400) * 40 // 400 AS BIGINT)
             |  + CAST(LEAST(stop_pm, 150) * 40 // 150 AS BIGINT)
             |  + CAST(LEAST(n_tokens, 80) * 20 // 80 AS BIGINT)) AS quality
             |FROM (
             | SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             |  CAST(CASE WHEN nrm = '' THEN 0
             |    ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END AS BIGINT) AS n_tokens,
             |  CAST((length(p) - length(replace(p, ' the ', ''))) / 5
             |   + (length(p) - length(replace(p, ' a ', ''))) / 3
             |   + (length(p) - length(replace(p, ' and ', ''))) / 5
             |   + (length(p) - length(replace(p, ' is ', ''))) / 4
             |   + (length(p) - length(replace(p, ' of ', ''))) / 4
             |   + (length(p) - length(replace(p, ' to ', ''))) / 4 AS BIGINT) AS stop_raw,
             |  CAST(length(text) - length(replace(text, '.', ''))
             |   + length(text) - length(replace(text, ',', ''))
             |   + length(text) - length(replace(text, '!', ''))
             |   + length(text) - length(replace(text, '?', ''))
             |   + length(text) - length(replace(text, ';', '')) AS BIGINT) AS punct_raw,
             |  CAST(length(replace(nrm, ' ', '')) AS BIGINT) AS alpha_chars
             | FROM (SELECT doc_id, text, trim(regexp_replace(text, '\s+', ' ', 'g')) AS nrm,
             |        ' ' || lower(text) || ' ' AS p FROM documents)
             |) base
             |CROSS JOIN LATERAL (SELECT
             |  CASE WHEN n_tokens = 0 THEN 0
             |   ELSE CAST(stop_raw * 1000 // n_tokens AS BIGINT) END AS stop_pm,
             |  CASE WHEN n_chars = 0 THEN 0
             |   ELSE CAST(punct_raw * 1000 // n_chars AS BIGINT) END AS punct_pm,
             |  CASE WHEN n_tokens = 0 THEN 0
             |   ELSE CAST(alpha_chars * 1000 // n_tokens AS BIGINT) END AS avg_tok_len_pm) _d
             |ORDER BY doc_id""".stripMargin)),

    // TX3 — token counting: whitespace + BPE-ish subword regex
    Q("tx3_token_count",
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             | CAST(CASE WHEN nrm = '' THEN 0
             |   ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END AS BIGINT) AS n_tokens,
             | CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_subwords
             |FROM (SELECT doc_id, text,
             |  trim(regexp_replace(text, '\s+', ' ', 'g')) AS nrm FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // TX4 — document fingerprint (md5 of normalized text) + grouping
    Q("tx4_fingerprint",
      (s, dir) => TextAnalysis.fingerprint(col("text")) match {
        case fp => docsWithDups(s, dir).select(col("doc_id"), fp.as("fp"))
          .groupBy("fp").agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))
          .select("keep_id", "copies", "fp")
          .orderBy("keep_id")
      },
      Some(s"""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS copies, fp FROM (
              | SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
              | FROM ($docsWithDupsSql)
              |) GROUP BY fp ORDER BY keep_id""".stripMargin)),

    // TX5 — corpus bigram-frequency scoring: how "typical" each document's
    // word bigrams are for the corpus (integer frequencies — the portable
    // stand-in for LM surprisal). Two shuffles: bigram counts, then a
    // frequency join back per document bigram.
    Q("tx5_bigram_freq",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bigrams = docs.select(col("doc_id"),
          explode(Dedup.wordShingles(col("text"), 2)).as("bg"))
        val counts = bigrams.groupBy("bg").agg(count(lit(1)).as("freq"))
        bigrams.join(counts, Seq("bg"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum("freq").as("sum_freq"))
          .withColumn("avg_freq_pm",
            expr("sum_freq * 1000 div n_bigrams"))
          .orderBy("doc_id")
      },
      Some("""WITH bigrams AS (
             |  SELECT DISTINCT doc_id, ws[g] || ' ' || ws[g+1] AS bg
             |  FROM (SELECT doc_id,
             |          string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ws
             |        FROM documents) w,
             |  LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS g) _t
             |), counts AS (SELECT bg, COUNT(*) AS freq FROM bigrams GROUP BY 1)
             |SELECT doc_id, COUNT(*) AS n_bigrams,
             | CAST(SUM(freq) AS BIGINT) AS sum_freq,
             | CAST(SUM(freq) AS BIGINT) * 1000 // COUNT(*) AS avg_freq_pm
             |FROM bigrams JOIN counts USING (bg)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // TX6 — repetition detector: share of duplicated word bigrams
    // (high values flag boilerplate/spam/generated loops)
    Q("tx6_repetition",
      (s, dir) => {
        val ws = split(trim(regexp_replace(col("text"), "\\s+", " ")), " ")
        val totalBg = (size(ws) - 1).cast(LongType)
        t(s, dir, "documents")
          .select(col("doc_id"), totalBg.as("total_bg"),
            size(Dedup.wordShingles(col("text"), 2)).cast(LongType).as("uniq_bg"))
          .filter(col("total_bg") > 0)
          .withColumn("rep_pm",
            expr("(total_bg - uniq_bg) * 1000 div total_bg"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, total_bg, uniq_bg,
             | (total_bg - uniq_bg) * 1000 // total_bg AS rep_pm
             |FROM (
             | SELECT doc_id,
             |  CAST(len(ws) - 1 AS BIGINT) AS total_bg,
             |  CAST((SELECT COUNT(DISTINCT ws[g] || ' ' || ws[g+1])
             |        FROM (SELECT unnest(generate_series(1, len(ws)-1)) AS g) _g)
             |   AS BIGINT) AS uniq_bg
             | FROM (SELECT doc_id,
             |   string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ws
             |  FROM documents))
             |WHERE total_bg > 0 ORDER BY doc_id""".stripMargin)),

    // TX7 — text cleaning / masking pass (the PII-scrub shape): digit
    // runs and long tokens masked; output fingerprinted to stay compact
    Q("tx7_mask_clean",
      (s, dir) => {
        val masked = regexp_replace(
          regexp_replace(col("text"), "[0-9]+", "<NUM>"),
          "[a-z]{10,}", "<LONG>")
        t(s, dir, "documents")
          .select(col("doc_id"),
            md5(masked).as("masked_fp"),
            (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
              .cast(LongType).as("n_digits_masked"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             | md5(regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
             |   '[a-z]{10,}', '<LONG>', 'g')) AS masked_fp,
             | CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
             |   AS BIGINT) AS n_digits_masked
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // MM1 — multimodal: REAL codec-header round-trip. plantImagePayload
    // writes a genuine PNG/JPEG/GIF header (dims derived from the text)
    // ahead of the body bytes; decodeImageMeta recovers the dims by
    // actually parsing the header; the oracle recomputes them from the
    // source columns — so encoder and parser are checked against each
    // other through an independent referee, not through shared code.
    Q("mm1_image_meta",
      (s, dir) => Multimodal.decodeImageMeta(
        Multimodal.plantImagePayload(
          t(s, dir, "documents"), "doc_id", "text"),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             | n + CASE doc_id % 3
             |   WHEN 0 THEN 20 + 10 + 3 * (CASE WHEN n % 2 = 0 THEN 3 ELSE 1 END)
             |   WHEN 1 THEN 33 ELSE 13 END AS n_bytes,
             | 64 + n % 192 AS width,
             | 64 + (n * 7) % 192 AS height,
             | CAST(CASE doc_id % 3
             |   WHEN 0 THEN CASE WHEN n % 2 = 0 THEN 3 ELSE 1 END
             |   WHEN 1 THEN CASE n % 3 WHEN 0 THEN 3 WHEN 1 THEN 4 ELSE 1 END
             |   ELSE 3 END AS BIGINT) AS channels,
             | CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'gif' END AS format
             |FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // MM3 — resize planning over REAL-parsed metadata: integer
    // aspect-fit; channels flow from the parsed header (1/3/4), so
    // out_bytes exercises the per-format channel arithmetic too
    Q("mm3_resize_meta",
      (s, dir) => Multimodal.resizeMeta(
        Multimodal.decodeImageMeta(
          Multimodal.plantImagePayload(
            t(s, dir, "documents"), "doc_id", "text"),
          "doc_id", "payload"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, width, height,
             | CASE WHEN width >= height THEN 224
             |      ELSE width * 224 // height END AS out_w,
             | CASE WHEN width >= height THEN height * 224 // width
             |      ELSE 224 END AS out_h,
             | channels,
             | (CASE WHEN width >= height THEN 224
             |       ELSE width * 224 // height END) *
             | (CASE WHEN width >= height THEN height * 224 // width
             |       ELSE 224 END) * channels AS out_bytes
             |FROM (SELECT doc_id,
             |  64 + n % 192 AS width,
             |  64 + (n * 7) % 192 AS height,
             |  CAST(CASE doc_id % 3
             |    WHEN 0 THEN CASE WHEN n % 2 = 0 THEN 3 ELSE 1 END
             |    WHEN 1 THEN CASE n % 3 WHEN 0 THEN 3 WHEN 1 THEN 4 ELSE 1 END
             |    ELSE 3 END AS BIGINT) AS channels
             | FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
             |   FROM documents))
             |ORDER BY doc_id""".stripMargin)),

    // MM4 — audio-feature kernel over the byte payload. The oracle is the
    // ASCII specialization of the generic kernel: every payload byte is a
    // codepoint ≤ 127 (the corpus is pure ASCII — octet_length == length,
    // asserted in LlmOpsSpec), so the centered sample v = c − 128 is
    // always in [−128, −1]: peak = 128 − min(code), energy = Σ(c−128)²,
    // and the sign never flips ⇒ zero_crossings ≡ 0. The Scala kernel
    // stays byte-generic; the gate checks it on real data end to end.
    Q("mm4_audio_features",
      (s, dir) => Multimodal.audioFeatures(
        t(s, dir, "documents").select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             | CAST(length(text) AS BIGINT) AS n_samples,
             | CAST(COALESCE(list_sum(list_transform(codes, c -> (c-128)*(c-128))), 0) AS BIGINT) AS energy,
             | CAST(COALESCE(128 - list_min(codes), 0) AS BIGINT) AS peak,
             | CAST(0 AS BIGINT) AS zero_crossings
             |FROM (SELECT doc_id, text,
             |  list_transform(range(1, length(text)+1),
             |    i -> ascii(substring(text, CAST(i AS INTEGER), 1))) AS codes
             | FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // MM2 — frame-sampling UDTF shape (1 row → n frame rows). The frame
    // hash is a mod-1e9+7 base-31 polynomial (see Multimodal.sampleFrames)
    // precisely so that engines with CHECKED integer arithmetic can
    // replay it: DuckDB folds the same recurrence with list_reduce, and
    // ASCII payloads make byte == codepoint.
    Q("mm2_frame_sample",
      (s, dir) => Multimodal.sampleFrames(
        t(s, dir, "documents").select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload")),
        "doc_id", "payload")
        .orderBy("doc_id", "frame_idx"),
      Some("""SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
             | list_reduce(
             |  list_prepend(CAST(0 AS BIGINT),
             |   list_transform(range(1, 65),
             |    i -> CAST(ascii(substring(text, CAST(f*64 + i AS INTEGER), 1)) AS BIGINT))),
             |  (acc, b) -> (acc * 31 + b) % 1000000007) AS frame_hash
             |FROM documents,
             | LATERAL (SELECT unnest(range(0, length(text)//64, 2)) AS f) _f
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // EP1 — deterministic epoch shuffle + batch packing
    // (operators/EpochShuffle): a seeded Lehmer permutation of the corpus
    // ranked WITHOUT a single-partition sort (range shuffle + two-pass
    // count/offset), cut into 64-doc batches. The per-batch id-sum pins
    // the full permutation — any mis-ranked row moves an id across a
    // batch boundary. The oracle replays the identical BIGINT hash and a
    // ROW_NUMBER in DuckDB.
    Q("ep1_epoch_shuffle",
      (s, dir) => graft.operators.EpochShuffle.epoch(
          t(s, dir, "documents").select(col("doc_id")),
          "doc_id", epochNo = 1, batchSize = 64)
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n_docs"),
          min("rank").as("rank_lo"), max("rank").as("rank_hi"),
          sum("doc_id").as("id_sum"))
        .orderBy("batch_id"),
      Some("""WITH ranked AS (
             | SELECT doc_id,
             |  ROW_NUMBER() OVER (
             |   ORDER BY ((doc_id % 2147483647) * 48271) % 2147483647
             |     NULLS FIRST, doc_id NULLS FIRST) AS rnk
             | FROM documents)
             |SELECT (rnk - 1) // 64 AS batch_id, COUNT(*) AS n_docs,
             | MIN(rnk) AS rank_lo, MAX(rnk) AS rank_hi,
             | CAST(SUM(doc_id) AS BIGINT) AS id_sum
             |FROM ranked GROUP BY 1 ORDER BY batch_id""".stripMargin)),

    // fe1 — leave-one-out target encoding: each event's user feature is
    // the mean value of the user's OTHER events, (S − x)/(n−1) — the
    // standard leakage-free categorical encoding for model training.
    // Exact: S and x are cent longs, so the double division is the
    // identical IEEE expression in both engines. One aggregate, stats
    // broadcast back — no raw shuffle.
    Q("fe1_loo_encode",
      (s, dir) => {
        val c = round(col("value") * 100).cast(LongType)
        val base = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("value"), c.as("_c"))
        val stats = base.groupBy("user_id")
          .agg(sum("_c").as("_s"), count(lit(1)).as("_n"))
        // no broadcast hint: user-grain stats are unbounded at scale; AQE
        // broadcasts them at gate scale on its own
        base.join(stats, Seq("user_id"))
          .select(col("user_id"), col("event_id"), col("value"),
            when(col("_n") > 1,
              (col("_s") - col("_c")) / (col("_n") - 1) / 100.0)
              .as("loo_mean"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH c AS (SELECT user_id, event_id, value,
             |   CAST(ROUND(value*100) AS BIGINT) AS cc FROM events),
             |s AS (SELECT user_id, CAST(SUM(cc) AS BIGINT) AS sc,
             |   COUNT(*) AS n FROM c GROUP BY 1)
             |SELECT c.user_id, event_id, value,
             | CASE WHEN n > 1 THEN (sc - cc) / (n - 1) / 100.0 END AS loo_mean
             |FROM c JOIN s ON c.user_id = s.user_id
             |ORDER BY c.user_id, event_id""".stripMargin)),

    // FE5 — k-fold out-of-fold target encoding (the leakage-safe form of
    // fe1's LOO for the train/serve split world): fold = portable md5
    // bucket of the PRIMARY KEY (%5), oof mean for a fold = the OTHER
    // folds' sum/count in exact integer cents. Emitted at (category,
    // fold) grain — category-cardinality × 5 rows, the broadcastable
    // encode table a trainer joins against; NULL when a category lives
    // in one fold only. One scan + two tiny aggregates.
    Q("fe5_kfold_encode",
      (s, dir) => {
        val c = round(col("value") * 100).cast(LongType)
        val fold = expr(
          "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % 5")
        val base = t(s, dir, "events")
          .select(col("event_type"), fold.as("fold"), c.as("cc"))
        val perFold = base.groupBy("event_type", "fold")
          .agg(sum("cc").as("sf"), count(lit(1)).as("nf"))
        val tot = perFold.groupBy("event_type")
          .agg(sum("sf").as("s"), sum("nf").as("n"))
        perFold.join(tot, Seq("event_type"))
          .select(col("event_type"), col("fold"), col("nf"),
            when(col("n") > col("nf"),
              expr("CAST((s - sf) div (n - nf) AS BIGINT)")).as("oof_mean_c"))
          .orderBy("event_type", "fold")
      },
      Some("""WITH c AS (SELECT event_type,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |   list_transform(str_split(substring(md5(CAST(event_id AS VARCHAR)), 1, 4), ''),
             |    h -> CAST(strpos('0123456789abcdef', h) - 1 AS BIGINT))),
             |   (a, x) -> a * 16 + x) % 5 AS fold,
             |  CAST(ROUND(value*100) AS BIGINT) AS cc
             | FROM events),
             |pf AS (SELECT event_type, fold, CAST(SUM(cc) AS BIGINT) AS sf,
             |  COUNT(*) AS nf FROM c GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(SUM(sf) AS BIGINT) AS s,
             |  CAST(SUM(nf) AS BIGINT) AS n FROM pf GROUP BY 1)
             |SELECT pf.event_type, pf.fold, pf.nf,
             | CASE WHEN t.n > pf.nf
             |      THEN CAST((t.s - pf.sf) // (t.n - pf.nf) AS BIGINT) END AS oof_mean_c
             |FROM pf JOIN t USING (event_type)
             |ORDER BY event_type, fold""".stripMargin)),

    // dq1 — distribution drift monitor: population-stability-index (PSI)
    // contribution per event_type between the first and second half of
    // the month. Shares are exact long/long divisions; the ln lands in a
    // 6-decimal rounding (libm last-ulp differences are 1e-15, the same
    // guard bm1 uses). One scan, two conditional aggregates, output one
    // row per category — the shape that monitors 100 TB for free.
    Q("dq1_psi_drift",
      (s, dir) => {
        val half = col("ts").cast(TimestampType) < lit("2024-01-16")
        val agg = t(s, dir, "events")
          .groupBy("event_type")
          .agg(sum(when(half, 1L).otherwise(0L)).as("_na"),
            sum(when(half, 0L).otherwise(1L)).as("_nb"))
        val tot = agg.agg(sum("_na").as("_ta"), sum("_nb").as("_tb"))
        agg.crossJoin(broadcast(tot))
          .select(col("event_type"),
            (col("_na") / col("_ta")).as("share_a"),
            (col("_nb") / col("_tb")).as("share_b"),
            round(((col("_na") / col("_ta")) - (col("_nb") / col("_tb"))) *
              log((col("_na") / col("_ta")) / (col("_nb") / col("_tb"))), 6)
              .as("psi_c"))
          .orderBy("event_type")
      },
      Some("""WITH a AS (SELECT event_type,
             |  SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS na,
             |  SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS nb
             | FROM events GROUP BY 1),
             |t AS (SELECT CAST(SUM(na) AS BIGINT) AS ta,
             |  CAST(SUM(nb) AS BIGINT) AS tb FROM a)
             |SELECT event_type, na / ta AS share_a, nb / tb AS share_b,
             | ROUND((na / ta - nb / tb) * LN((na / ta) / (nb / tb)), 6) AS psi_c
             |FROM a, t ORDER BY event_type""".stripMargin))
  )
}
