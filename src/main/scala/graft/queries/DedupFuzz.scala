package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Seeded fuzz for the dedup surface (r4 verdict task 7): the rf suite
  * covers joins/set-ops/windows with 5-seed matrices, but the dd gates ran
  * on one fixed corpus. Here each seed derives a corpus from `documents`
  * deterministically — a per-seed slice plus planted mutant twins at a
  * controlled distance (one word dropped for the Jaccard pipelines, one
  * character overwritten for edit distance) — and the pipeline's pair set
  * is oracle-checked against DuckDB brute force over the SAME constructed
  * corpus. Mutations are spelled with engine-portable primitives
  * (string_split / list_filter 1-based in DuckDB ↔ split / filter 0-based
  * lambda in Spark), so both engines see byte-identical texts.
  *
  * One registry row per pipeline shape, 5 seed-instances each (the rf
  * convention: `seedoff` column + UNION ALL of seed-shifted oracles).
  */
object DedupFuzz {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val seeds = 0 until 5

  /** whitespace-normalized word array, both engines' starting point */
  private def wsCol: Column =
    split(trim(regexp_replace(col("text"), "\\s+", " ")), " ")
  private val wsSql =
    "string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')"

  // ---- ddf1: MinHash-LSH pipeline on seeded corpora ----

  /** per-seed corpus: slice doc_id % 5 = seed, plus a twin (id+1000000)
    * for every 3rd slice member with word (doc_id*(seed+3)) % nwords
    * dropped — a near-dup at Jaccard ≈ (m-5)/(m-2) for m-word docs, which
    * straddles the 0.8 verify threshold across the corpus's length mix
    * (some twins must be found, some must be rejected — both directions
    * are exercised).
    */
  private def jaccardCorpus(s: SparkSession, dir: String, seed: Int): DataFrame = {
    val base = t(s, dir, "documents")
      .filter(col("doc_id") % 5 === seed)
      .select(col("doc_id"), col("text"))
    val k = pmod(col("doc_id") * (seed + 3), size(wsCol)) // 0-based drop index
    // two-step select: k references doc_id, and Spark's lateral column
    // alias resolution would bind it to a SIBLING alias of the same name
    // (the +1000000 rename) instead of the input column
    val twins = base
      .filter((col("doc_id") / 5).cast("long") % 3 === 0)
      .select(col("doc_id"),
        array_join(filter(wsCol, (_, i) => i =!= k), " ").as("text"))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    base.unionAll(twins)
  }

  private def jaccardCorpusSql(seed: Int): String =
    s"""SELECT doc_id, text FROM documents WHERE doc_id % 5 = $seed
       |UNION ALL
       |SELECT doc_id + 1000000 AS doc_id,
       |  array_to_string(list_filter(ws, (w, i) ->
       |    i <> (doc_id * ${seed + 3}) % len(ws) + 1), ' ') AS text
       |FROM (SELECT doc_id, $wsSql AS ws FROM documents
       |      WHERE doc_id % 5 = $seed AND (doc_id // 5) % 3 = 0)""".stripMargin

  /** brute-force word-3-shingle Jaccard ≥ 4/5 over a corpus relation —
    * the same oracle shape as dd2's, parameterized by the corpus SQL
    */
  private def bruteJaccardOver(corpusSql: String, seed: Int): String =
    s"""SELECT $seed AS seedoff, i.ida, i.idb FROM (
       |WITH corpus AS ($corpusSql),
       |grams AS (
       |  SELECT DISTINCT doc_id, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS gram
       |  FROM (SELECT doc_id, $wsSql AS ws FROM corpus) w,
       |  LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS g) _t
       |), gc AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
       |i AS (SELECT x.doc_id AS ida, y.doc_id AS idb, COUNT(*) AS inter
       |      FROM grams x JOIN grams y ON x.gram = y.gram AND x.doc_id < y.doc_id
       |      GROUP BY 1, 2)
       |SELECT i.ida, i.idb FROM i
       |JOIN gc a ON a.doc_id = i.ida JOIN gc b ON b.doc_id = i.idb
       |WHERE 5 * i.inter >= 4 * (a.n + b.n - i.inter)) i""".stripMargin

  // ---- ddf2: banded edit-distance pipeline on seeded corpora ----

  /** per-seed corpus: slice doc_id % 20 = seed*4 (disjoint across seeds),
    * plus a distance-1 twin for every 2nd member: the character at
    * 1-based position doc_id % len + 1 overwritten with '~'.
    */
  private def editCorpus(s: SparkSession, dir: String, seed: Int): DataFrame = {
    val base = t(s, dir, "documents")
      .filter(col("doc_id") % 20 === seed * 4)
      .select(col("doc_id"), col("text"))
    val p = (pmod(col("doc_id"), greatest(length(col("text")), lit(1))) + 1).cast("int")
    // same two-step rename as jaccardCorpus: p must see the INPUT doc_id,
    // not the lateral alias
    val twins = base
      .filter(col("doc_id") % 40 === seed * 4)
      .select(col("doc_id"),
        concat(substring(col("text"), lit(1), p - 1), lit("~"),
          substring(col("text"), p + 1, lit(Int.MaxValue))).as("text"))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    base.unionAll(twins)
  }

  private def editCorpusSql(seed: Int): String =
    s"""SELECT doc_id, text FROM documents WHERE doc_id % 20 = ${seed * 4}
       |UNION ALL
       |SELECT doc_id + 1000000 AS doc_id,
       |  substring(text, 1, p - 1) || '~' || substring(text, p + 1) AS text
       |FROM (SELECT doc_id, text,
       |        CAST(doc_id % greatest(length(text), 1) + 1 AS INTEGER) AS p
       |      FROM documents WHERE doc_id % 40 = ${seed * 4})""".stripMargin

  private def bruteEditOver(corpusSql: String, seed: Int, maxDist: Int): String =
    s"""SELECT $seed AS seedoff, x.doc_id AS ida, y.doc_id AS idb
       |FROM ($corpusSql) x JOIN ($corpusSql) y ON x.doc_id < y.doc_id
       |WHERE levenshtein(x.text, y.text) <= $maxDist""".stripMargin

  // ---- ddf4: SemDeDup retention on seeded embedding corpora ----

  /** per-seed corpus: slice vec_id % 5 = seed, plus a twin (id+1000000)
    * for every 3rd member whose vector is DOUBLED. ×2 is exact in float
    * in both engines (no rounding, so the corpora are byte-identical),
    * preserves every coordinate sign (same sign-bucket cluster), and has
    * cosine exactly 1 with its original — every twin MUST be dropped,
    * and a-vs-twin(b) cosines equal a-vs-b exactly, so threshold ties
    * break identically in both engines.
    */
  private def embCorpus(s: SparkSession, dir: String, seed: Int): DataFrame = {
    val base = t(s, dir, "embeddings")
      .filter(col("vec_id") % 5 === seed)
      .select(col("vec_id"), col("embedding"))
    val twins = base
      .filter((col("vec_id") / 5).cast("long") % 3 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    base.unionAll(twins)
  }

  private def embCorpusSql(seed: Int): String =
    s"""SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = $seed
       |UNION ALL
       |SELECT vec_id + 1000000 AS vec_id,
       |  list_transform(embedding, x -> CAST(x * 2 AS FLOAT)) AS embedding
       |FROM embeddings WHERE vec_id % 5 = $seed AND (vec_id // 5) % 3 = 0""".stripMargin

  private def bruteSemDedupOver(corpusSql: String, seed: Int, tau: Double): String =
    s"""SELECT $seed AS seedoff, a.vec_id FROM ($corpusSql) a WHERE NOT EXISTS (
       | SELECT 1 FROM ($corpusSql) b
       | WHERE (CASE WHEN b.embedding[1] >= 0 THEN 4 ELSE 0 END
       |      + CASE WHEN b.embedding[2] >= 0 THEN 2 ELSE 0 END
       |      + CASE WHEN b.embedding[3] >= 0 THEN 1 ELSE 0 END)
       |     = (CASE WHEN a.embedding[1] >= 0 THEN 4 ELSE 0 END
       |      + CASE WHEN a.embedding[2] >= 0 THEN 2 ELSE 0 END
       |      + CASE WHEN a.embedding[3] >= 0 THEN 1 ELSE 0 END)
       |   AND b.vec_id < a.vec_id
       |   AND list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
       |     CAST(a.embedding AS DOUBLE[])) >= $tau)""".stripMargin

  def all: Seq[Q] = Seq(

    // DDF1 — MinHash-LSH dedup over 5 seeded corpora with planted
    // one-word-dropped twins: pair set must equal brute-force Jaccard on
    // every seed (the dd2 equality, now across corpora whose true pairs
    // hug the 0.8 threshold from both sides)
    Q("ddf1_minhash_fuzz",
      (s, dir) => seeds.map { seed =>
        Dedup.minHashDedup(jaccardCorpus(s, dir, seed), "doc_id", "text")
          .select(lit(seed).as("seedoff"), col("ida"), col("idb"))
      }.reduce(_ unionAll _).orderBy("seedoff", "ida", "idb"),
      Some(seeds.map(seed => bruteJaccardOver(jaccardCorpusSql(seed), seed))
        .mkString("", "\nUNION ALL\n", "\nORDER BY seedoff, ida, idb"))),

    // DDF2 — banded edit-distance pairs over 5 seeded corpora with
    // planted distance-1 twins: the length-banding must lose nothing vs
    // brute-force levenshtein (dd9's gate found 0 pairs on the natural
    // corpus; the plants make it bite)
    Q("ddf2_edit_fuzz",
      (s, dir) => seeds.map { seed =>
        Dedup.editDistancePairs(editCorpus(s, dir, seed), "doc_id", "text", maxDist = 2)
          .select(lit(seed).as("seedoff"), col("ida"), col("idb"))
      }.reduce(_ unionAll _).orderBy("seedoff", "ida", "idb"),
      Some(seeds.map(seed => bruteEditOver(editCorpusSql(seed), seed, maxDist = 2))
        .mkString("", "\nUNION ALL\n", "\nORDER BY seedoff, ida, idb"))),

    // DDF3 — SimHash dedup on the same seeded corpora as ddf1: the
    // pigeonhole-banded pipeline must reach the identical brute-force
    // pair set (chunk blocking is a different recall mechanism than
    // MinHash banding, so it earns its own fuzz row)
    Q("ddf3_simhash_fuzz",
      (s, dir) => seeds.map { seed =>
        Dedup.simHashDedup(jaccardCorpus(s, dir, seed), "doc_id", "text")
          .select(lit(seed).as("seedoff"), col("ida"), col("idb"))
      }.reduce(_ unionAll _).orderBy("seedoff", "ida", "idb"),
      Some(seeds.map(seed => bruteJaccardOver(jaccardCorpusSql(seed), seed))
        .mkString("", "\nUNION ALL\n", "\nORDER BY seedoff, ida, idb"))),

    // DDF4 — SemDeDup retention over 5 seeded embedding corpora with
    // planted doubled twins (cosine exactly 1, same sign-cluster):
    // survivors must equal the brute-force NOT EXISTS rule on every
    // seed — every twin dropped, every natural decision matched
    Q("ddf4_semdedup_fuzz",
      (s, dir) => seeds.map { seed =>
        graft.operators.Similarity.semDedup(embCorpus(s, dir, seed),
            "embedding", "vec_id",
            graft.operators.Similarity.signCluster(col("embedding"), 3), tau = 0.4)
          .select(lit(seed).as("seedoff"), col("vec_id"))
      }.reduce(_ unionAll _).orderBy("seedoff", "vec_id"),
      Some(seeds.map(seed => bruteSemDedupOver(embCorpusSql(seed), seed, tau = 0.4))
        .mkString("", "\nUNION ALL\n", "\nORDER BY seedoff, vec_id"))))
}
