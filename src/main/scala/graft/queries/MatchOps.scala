package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Corpus, FuzzyJoin}
import graft.sources.Tables

/** Entity-matching and corpus-statistics operators: blocked fuzzy string
  * join, deterministic KMV distinct-count sketch, bottom-k uniform
  * sampling, PMI-style collocation mining, and an inverted index — each
  * exactly SQL-expressible, so each carries a full DuckDB oracle.
  *
  * Determinism conventions: string sides are derived from md5 of row keys
  * (identical lowercase-hex md5 in Spark and DuckDB); all scores are exact
  * integers (integer division spelled `div`/`//` identically on both
  * sides); every query ends in a total ORDER BY.
  */
object MatchOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** DuckDB-side word-split of documents, mirroring Corpus.words. */
  private val wsSql =
    """SELECT doc_id, string_split(trim(regexp_replace(text,'\s+',' ','g')),' ') AS w
      |FROM documents""".stripMargin

  def all: Seq[Q] = Seq(

    // FJ1 — fuzzy string join at edit distance <= 1 via FastSS
    // deletion-neighborhood blocking (operators/FuzzyJoin.scala). The two
    // sides are 5/6-char hex tags derived from orders and customer keys:
    // thousands of strings per side, a few hundred true near-matches. The
    // Spark plan explodes (L+1) deletion keys per string, hash-joins on
    // the key, and verifies only candidates with codegen'd levenshtein —
    // never the 3750 x 1500 cross product the oracle spells.
    Q("fj1_fuzzy_join",
      (s, dir) => {
        def tag(df: DataFrame, key: String, salt: String, id: String, str: String) =
          df.select(col(key).as(id),
            md5(concat(lit(salt), col(key).cast(StringType)))
              .substr(lit(1), lit(5) + pmod(col(key), lit(2))).as(str))
        val l = tag(t(s, dir, "orders").filter(col("o_orderkey") % 4 === 0),
          "o_orderkey", "L", "lid", "ls")
        val r = tag(t(s, dir, "customer"), "c_custkey", "R", "rid", "rs")
        FuzzyJoin.join(l, "lid", "ls", r, "rid", "rs")
          .orderBy("lid", "rid")
      },
      Some("""WITH l AS (SELECT o_orderkey AS lid,
             |  substr(md5('L'||CAST(o_orderkey AS VARCHAR)),1,5+o_orderkey%2) AS ls
             |  FROM orders WHERE o_orderkey%4=0),
             |r AS (SELECT c_custkey AS rid,
             |  substr(md5('R'||CAST(c_custkey AS VARCHAR)),1,5+c_custkey%2) AS rs
             |  FROM customer)
             |SELECT lid, ls, rid, rs, CAST(levenshtein(ls,rs) AS INTEGER) AS dist
             |FROM l, r WHERE levenshtein(ls,rs) <= 1
             |ORDER BY lid, rid""".stripMargin)),

    // SQL2 — the fuzzy join through the SQL FRONTDOOR: plain SQL text
    // with `JOIN ON levenshtein(a,b) <= 1`, no operator API. The
    // injected FuzzyJoinRewrite turns what Spark would plan as a
    // BroadcastNestedLoopJoin into the blocked equi-join (plan-guarded
    // in FuzzyJoinRewriteSpec); the oracle runs the identical SQL in
    // DuckDB, where the all-pairs plan is fine at oracle scale.
    Q("sql2_fuzzy_sql",
      (s, dir) => {
        t(s, dir, "orders").filter(col("o_orderkey") % 4 === 1)
          .select(col("o_orderkey").as("lid"),
            md5(concat(lit("Q"), col("o_orderkey").cast(StringType)))
              .substr(lit(1), lit(5) + pmod(col("o_orderkey"), lit(2))).as("ls"))
          .createOrReplaceTempView("fz_l")
        t(s, dir, "customer")
          .select(col("c_custkey").as("rid"),
            md5(concat(lit("P"), col("c_custkey").cast(StringType)))
              .substr(lit(1), lit(5) + pmod(col("c_custkey"), lit(2))).as("rs"))
          .createOrReplaceTempView("fz_r")
        s.sql("""SELECT lid, ls, rid, rs, levenshtein(ls, rs) AS dist
                 FROM fz_l JOIN fz_r ON levenshtein(ls, rs) <= 1
                 ORDER BY lid, rid""")
      },
      Some("""WITH l AS (SELECT o_orderkey AS lid,
             |  substr(md5('Q'||CAST(o_orderkey AS VARCHAR)),1,5+o_orderkey%2) AS ls
             |  FROM orders WHERE o_orderkey%4=1),
             |r AS (SELECT c_custkey AS rid,
             |  substr(md5('P'||CAST(c_custkey AS VARCHAR)),1,5+c_custkey%2) AS rs
             |  FROM customer)
             |SELECT lid, ls, rid, rs, CAST(levenshtein(ls,rs) AS INTEGER) AS dist
             |FROM l JOIN r ON levenshtein(ls,rs) <= 1
             |ORDER BY lid, rid""".stripMargin)),

    // FJ2 — record linkage, Fellegi-Sunter shape (1969): candidate pairs
    // from the blocked fuzzy join on a name-like tag, scored by integer
    // agreement weights across fields (tag distance + nation equality),
    // kept above a threshold that requires corroboration (a distance-1
    // tag alone does not link; tag + nation does). The "dirty" side is a
    // deterministic perturbation of customers: every 3rd key's tag loses
    // its 3rd char, every 7th key's nation is off by one. The Spark plan
    // is the FastSS blocked join + a broadcast-joined field compare —
    // never the all-pairs compare the oracle spells.
    Q("fj2_record_linkage",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val clean = cust.select(col("c_custkey").as("lid"),
          md5(concat(lit("N"), col("c_custkey").cast(StringType)))
            .substr(1, 6).as("ltag"),
          col("c_nationkey").as("lnation"))
        val dirty = cust.select(col("c_custkey").as("rid"),
          when(col("c_custkey") % 3 === 0,
            concat(
              md5(concat(lit("N"), col("c_custkey").cast(StringType))).substr(1, 2),
              md5(concat(lit("N"), col("c_custkey").cast(StringType))).substr(4, 3)))
            .otherwise(
              md5(concat(lit("N"), col("c_custkey").cast(StringType))).substr(1, 6))
            .as("rtag"),
          (col("c_nationkey") + when(col("c_custkey") % 7 === 0, 1).otherwise(0))
            .as("rnation"))
        FuzzyJoin.join(clean, "lid", "ltag", dirty, "rid", "rtag")
          .join(clean.select(col("lid"), col("lnation")), "lid")
          .join(dirty.select(col("rid"), col("rnation")), "rid")
          .select(col("lid"), col("rid"), col("dist"),
            (lit(12) - col("dist") * 6 +
              when(col("lnation") === col("rnation"), 8).otherwise(0))
              .cast(LongType).as("score"))
          .filter(col("score") >= 14)
          .orderBy("lid", "rid")
      },
      Some("""WITH clean AS (
             |  SELECT c_custkey AS lid,
             |         substr(md5('N'||CAST(c_custkey AS VARCHAR)),1,6) AS ltag,
             |         c_nationkey AS lnation
             |  FROM customer),
             |dirty AS (
             |  SELECT c_custkey AS rid,
             |         CASE WHEN c_custkey % 3 = 0
             |           THEN substr(md5('N'||CAST(c_custkey AS VARCHAR)),1,2)
             |                || substr(md5('N'||CAST(c_custkey AS VARCHAR)),4,3)
             |           ELSE substr(md5('N'||CAST(c_custkey AS VARCHAR)),1,6) END AS rtag,
             |         c_nationkey + CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS rnation
             |  FROM customer)
             |SELECT lid, rid, CAST(levenshtein(ltag, rtag) AS INTEGER) AS dist,
             |       CAST(12 - levenshtein(ltag, rtag) * 6
             |            + CASE WHEN lnation = rnation THEN 8 ELSE 0 END AS BIGINT) AS score
             |FROM clean, dirty
             |WHERE levenshtein(ltag, rtag) <= 1
             |  AND 12 - levenshtein(ltag, rtag) * 6
             |      + CASE WHEN lnation = rnation THEN 8 ELSE 0 END >= 14
             |ORDER BY lid, rid""".stripMargin)),

    // SJ1 — EXACT set-similarity self-join (prefix filtering: SSJoin /
    // All-Pairs / PPJoin family) on word sets of documents, Jaccard >=
    // 9/10. Unlike the MinHash dd2 pipeline this is lossless — and
    // unlike the oracle's all-pairs spelling, the Spark plan blocks on
    // rare-first prefix tokens and never forms the cross product
    // (SetSimJoinSpec proves exactness against brute force; the plan
    // guard proves no cartesian).
    Q("sj1_setsim_join",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), Corpus.words(col("text")).as("toks"))
        graft.operators.SetSimJoin
          .jaccardSelfJoin(docs, "doc_id", "toks", tNum = 9, tDen = 10)
          .orderBy("ida", "idb")
      },
      Some("""WITH s AS (SELECT doc_id,
             |  list_distinct(string_split(trim(regexp_replace(text,'\s+',' ','g')),' ')) AS toks
             |  FROM documents WHERE doc_id % 2 = 0),
             |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
             |        len(list_intersect(a.toks, b.toks)) AS inter,
             |        len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS uni
             |      FROM s a JOIN s b ON a.doc_id < b.doc_id)
             |SELECT ida, idb, CAST(inter * 1000 // uni AS BIGINT) AS jaccard_pm
             |FROM p WHERE inter * 10 >= uni * 9
             |ORDER BY ida, idb""".stripMargin)),

    // SJ2 — EXACT directed CONTAINMENT self-join on 3-gram sets:
    // |A∩B| >= 0.9·|A| — "A quoted/contained in B", the asymmetric
    // relation Jaccard under-scores when the contained doc is small.
    // The contained side prefix-blocks (pigeonhole on its rarest
    // grams); the container side posts all grams (inverted-index-sized
    // shuffle, ii1's shape); the oracle spells the all-pairs compare
    // the plan never forms.
    Q("sj2_containment_join",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"),
            array_distinct(Corpus.shingles(col("text"), 3)).as("toks"))
        graft.operators.SetSimJoin
          .containmentSelfJoin(docs, "doc_id", "toks", tNum = 9, tDen = 10)
          .orderBy("ida", "idb")
      },
      Some("""WITH g AS (
             |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
             |  FROM (SELECT doc_id,
             |          string_split(trim(regexp_replace(text,'\s+',' ','g')), ' ') AS ws
             |        FROM documents) w,
             |  LATERAL (SELECT unnest(generate_series(1, len(ws)-2)) AS i) _t),
             |s AS (SELECT doc_id, list(gram) AS toks FROM g GROUP BY 1)
             |SELECT a.doc_id AS ida, b.doc_id AS idb,
             |  CAST(len(list_intersect(a.toks, b.toks)) * 1000 // len(a.toks) AS BIGINT)
             |    AS containment_pm
             |FROM s a JOIN s b ON a.doc_id <> b.doc_id
             |WHERE len(list_intersect(a.toks, b.toks)) * 10 >= 9 * len(a.toks)
             |ORDER BY ida, idb""".stripMargin)),

    // RF28 — set-similarity-join differential fuzz, 5-seed matrix: per
    // seed, 160 synthetic token sets (sizes 3-8 over a 25-token
    // vocabulary, tokens drawn by portable md5 so both engines construct
    // IDENTICAL sets), prefix-filtered join at Jaccard >= 1/2 vs the
    // oracle's all-pairs list_intersect. Complements SetSimJoinSpec's
    // in-JVM brute force with the DuckDB referee.
    Q("rf28_setsim_fuzz",
      (s, dir) => {
        val insts = Seq(0L, 100L, 200L, 300L, 400L).map { off =>
          val docs = s.range(1, 161).select(col("id").as("doc"),
            expr(s"""transform(sequence(1, 3 + CAST(id % 6 AS INT)),
                     j -> concat('t', CAST(CAST(conv(substring(md5(
                            concat('S$off:', CAST(id AS STRING), ':', CAST(j AS STRING))
                          ), 1, 6), 16, 10) AS BIGINT) % 25 AS STRING)))""").as("toks"))
          graft.operators.SetSimJoin
            .jaccardSelfJoin(docs, "doc", "toks", tNum = 1, tDen = 2)
            .withColumn("seedoff", lit(off))
        }
        insts.reduce(_.unionByName(_)).orderBy("seedoff", "ida", "idb")
      },
      Some {
        val union = Seq(0L, 100L, 200L, 300L, 400L).map { off =>
          s"""SELECT CAST($off AS BIGINT) AS seedoff, a.doc AS ida, b.doc AS idb,
             |  CAST(len(list_intersect(a.toks, b.toks)) * 1000
             |       // (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
             |       AS BIGINT) AS jaccard_pm
             |FROM (
             |  SELECT i AS doc, list_distinct(list('t' || CAST(
             |    CAST(('0x' || substr(md5('S$off:'||CAST(i AS VARCHAR)||':'||CAST(j AS VARCHAR)),1,6)) AS UBIGINT) % 25
             |    AS VARCHAR))) AS toks
             |  FROM generate_series(1, 160) _i(i),
             |       LATERAL (SELECT unnest(generate_series(1, 3 + i % 6)) AS j) _j
             |  GROUP BY i) a
             |JOIN (
             |  SELECT i AS doc, list_distinct(list('t' || CAST(
             |    CAST(('0x' || substr(md5('S$off:'||CAST(i AS VARCHAR)||':'||CAST(j AS VARCHAR)),1,6)) AS UBIGINT) % 25
             |    AS VARCHAR))) AS toks
             |  FROM generate_series(1, 160) _i(i),
             |       LATERAL (SELECT unnest(generate_series(1, 3 + i % 6)) AS j) _j
             |  GROUP BY i) b
             |ON a.doc < b.doc
             |WHERE len(list_intersect(a.toks, b.toks)) * 2
             |      >= (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"SELECT * FROM (\n$union\n) ORDER BY seedoff, ida, idb"
      }),

    // RF30 — containment-join differential fuzz, rf28's sibling for the
    // DIRECTED form: 5 seeds × 160 md5-constructed token sets, the
    // asymmetric prefix-filtered join at containment ≥ 2/3 vs the
    // oracle's all-pairs list_intersect over IDENTICAL sets — both
    // directions of every ordered pair exercised.
    Q("rf30_containment_fuzz",
      (s, dir) => {
        val insts = Seq(0L, 100L, 200L, 300L, 400L).map { off =>
          val docs = s.range(1, 161).select(col("id").as("doc"),
            expr(s"""transform(sequence(1, 3 + CAST(id % 6 AS INT)),
                     j -> concat('t', CAST(CAST(conv(substring(md5(
                            concat('C$off:', CAST(id AS STRING), ':', CAST(j AS STRING))
                          ), 1, 6), 16, 10) AS BIGINT) % 25 AS STRING)))""").as("toks"))
          graft.operators.SetSimJoin
            .containmentSelfJoin(docs, "doc", "toks", tNum = 2, tDen = 3)
            .withColumn("seedoff", lit(off))
        }
        insts.reduce(_.unionByName(_)).orderBy("seedoff", "ida", "idb")
      },
      Some {
        def side(off: Long) =
          s"""SELECT i AS doc, list_distinct(list('t' || CAST(
             |    CAST(('0x' || substr(md5('C$off:'||CAST(i AS VARCHAR)||':'||CAST(j AS VARCHAR)),1,6)) AS UBIGINT) % 25
             |    AS VARCHAR))) AS toks
             |  FROM generate_series(1, 160) _i(i),
             |       LATERAL (SELECT unnest(generate_series(1, 3 + i % 6)) AS j) _j
             |  GROUP BY i""".stripMargin
        val union = Seq(0L, 100L, 200L, 300L, 400L).map { off =>
          s"""SELECT CAST($off AS BIGINT) AS seedoff, a.doc AS ida, b.doc AS idb,
             |  CAST(len(list_intersect(a.toks, b.toks)) * 1000 // len(a.toks)
             |       AS BIGINT) AS containment_pm
             |FROM (
             |${side(off)}) a
             |JOIN (
             |${side(off)}) b
             |ON a.doc <> b.doc
             |WHERE len(list_intersect(a.toks, b.toks)) * 3 >= 2 * len(a.toks)""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"SELECT * FROM (\n$union\n) ORDER BY seedoff, ida, idb"
      }),

    // SK3 — KMV (k-minimum-values) distinct-count sketch, k=256: the
    // mergeable NDV estimator of Bar-Yossef et al. 2002. Fully
    // deterministic — the sketch is the 256 smallest md5 values, so the
    // oracle replays it bit-for-bit (unlike HLL, whose register layout is
    // engine-private; cf. sk2's exact-twin gating). The plan keeps only
    // k hashes per partition (TakeOrdered), so the driver sees k rows —
    // the 100 TB shape for NDV over a fact column.
    Q("sk3_kmv_distinct",
      (s, dir) => {
        val k = 256
        val kth = t(s, dir, "lineitem")
          .select(md5(concat(lit("kmv:"), col("l_partkey").cast(StringType))).as("h"))
          .distinct()
          .orderBy("h").limit(k)
          .agg(max(col("h")).as("kth_hash"))
        val exact = t(s, dir, "lineitem")
          .agg(countDistinct(col("l_partkey")).as("exact_ndv"))
        kth.crossJoin(exact)
          .withColumn("hv",
            conv(substring(col("kth_hash"), 1, 12), 16, 10).cast(LongType))
          .select(lit(k.toLong).as("k"), col("kth_hash"),
            expr(s"${(k - 1).toLong * (1L << 48)} div hv").as("est_ndv"),
            col("exact_ndv"))
      },
      Some("""WITH h AS (SELECT DISTINCT md5('kmv:' || CAST(l_partkey AS VARCHAR)) AS h
             |          FROM lineitem),
             |k AS (SELECT max(h) AS kth_hash
             |      FROM (SELECT h FROM h ORDER BY h LIMIT 256)),
             |x AS (SELECT count(DISTINCT l_partkey) AS exact_ndv FROM lineitem)
             |SELECT CAST(256 AS BIGINT) AS k, kth_hash,
             |  (255 * 281474976710656)
             |    // CAST(CAST(('0x' || substr(kth_hash,1,12)) AS UBIGINT) AS BIGINT)
             |    AS est_ndv,
             |  exact_ndv
             |FROM k, x""".stripMargin)),

    // S7 — bottom-k deterministic uniform sample: the 100 corpus-wide
    // smallest md5(key) rows. Content-keyed like s3/s4 (same sample on
    // any cluster at any parallelism), but a single global sample rather
    // than a per-bucket rate. Physical plan is TakeOrderedAndProject —
    // each partition keeps its local k, the driver merges k-sized heaps;
    // no global sort, no full shuffle, at any scale.
    Q("s7_bottomk_sample",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"),
            md5(concat(lit("s7:"), col("o_orderkey").cast(StringType))).as("h"))
          .orderBy("h").limit(100)
          .orderBy("h"),
      Some("""SELECT o_orderkey, md5('s7:' || CAST(o_orderkey AS VARCHAR)) AS h
             |FROM orders ORDER BY h LIMIT 100""".stripMargin)),

    // TX11 — collocation mining: adjacent word pairs scored by exact-
    // integer PMI lift (Church & Hanks 1990 association ratio).
    // lift = p(ab) / (p(a)p(b)) = c_ab*W^2 / (c_a*c_b*B), emitted in
    // permille via the overflow-safe all-integer form
    // num // (den // 1000) — identical floor on both engines, no floats
    // anywhere. Plan: two exploded passes over documents (unigrams,
    // bigrams) reduced to vocabulary-sized count tables; totals are 1-row
    // broadcast aggregates; the raw corpus never shuffles.
    Q("tx11_collocations",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val uni = docs.select(explode(Corpus.words(col("text"))).as("word"))
        val bi = docs.select(explode(Corpus.shingles(col("text"), 2)).as("g"))
          .select(split(col("g"), " ").getItem(0).as("w1"),
            split(col("g"), " ").getItem(1).as("w2"))
        val ucnt = uni.groupBy("word").agg(count(lit(1)).as("c"))
        val bcnt = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
        val tot = uni.agg(count(lit(1)).as("W"))
          .crossJoin(bi.agg(count(lit(1)).as("B")))
        bcnt
          .join(broadcast(ucnt.select(col("word").as("w1"), col("c").as("c_a"))), Seq("w1"))
          .join(broadcast(ucnt.select(col("word").as("w2"), col("c").as("c_b"))), Seq("w2"))
          .crossJoin(broadcast(tot))
          .filter(col("c_ab") >= 25)
          .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
            // decimal internals: c_ab*W^2 wraps int64 once the corpus
            // passes ~3e7 words (same silent-wrap class the fe4 fix
            // covers; DuckDB's HUGEINT keeps the oracle exact)
            expr("""CAST((CAST(c_ab AS DECIMAL(38,0)) * W * W) div
                         ((CAST(c_a AS DECIMAL(38,0)) * c_b * B) div 1000)
                    AS BIGINT)""").as("lift_permille"))
          .orderBy(col("lift_permille").desc, col("w1"), col("w2"))
      },
      Some(s"""WITH ws AS ($wsSql),
              |uni AS (SELECT unnest(w) AS word FROM ws),
              |bi AS (SELECT w[g] AS w1, w[g+1] AS w2 FROM ws,
              |       LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS g) _t),
              |ucnt AS (SELECT word, count(*) AS c FROM uni GROUP BY 1),
              |bcnt AS (SELECT w1, w2, count(*) AS c_ab FROM bi GROUP BY 1,2),
              |tot AS (SELECT (SELECT count(*) FROM uni) AS W,
              |               (SELECT count(*) FROM bi) AS B)
              |SELECT w1, w2, c_ab, a.c AS c_a, b.c AS c_b,
              |  CAST((CAST(c_ab AS HUGEINT) * W * W)
              |       // ((CAST(a.c AS HUGEINT) * b.c * B) // 1000) AS BIGINT) AS lift_permille
              |FROM bcnt JOIN ucnt a ON w1 = a.word JOIN ucnt b ON w2 = b.word, tot
              |WHERE c_ab >= 25
              |ORDER BY lift_permille DESC, w1, w2""".stripMargin)),

    // II1 — inverted index over word trigrams: term -> sorted posting
    // list (comma-joined doc_ids) for terms in a bounded df band. The df
    // ceiling bounds every posting list, so the collect_set per term is
    // O(dfHi) — the real-system analogue shards hot terms; here hot terms
    // are excluded by the band, which is also what a contamination /
    // boilerplate pipeline wants (bp1 handles the hot end). One shuffle
    // on the term.
    Q("ii1_inverted_index",
      (s, dir) => {
        val grams = t(s, dir, "documents")
          .select(col("doc_id"), explode(Corpus.shingles(col("text"), 3)).as("gram"))
          .distinct()
        grams.groupBy("gram")
          .agg(count(lit(1)).as("df"),
            concat_ws(",",
              transform(sort_array(collect_set(col("doc_id"))),
                d => d.cast(StringType))).as("postings"))
          .filter(col("df").between(4, 7))
          .orderBy("gram")
      },
      Some(s"""WITH ws AS ($wsSql),
              |g AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2],' ') AS gram
              |      FROM ws,
              |      LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i) _t)
              |SELECT gram, count(*) AS df,
              |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
              |FROM g GROUP BY gram HAVING count(*) BETWEEN 4 AND 7
              |ORDER BY gram""".stripMargin))
  )
}
