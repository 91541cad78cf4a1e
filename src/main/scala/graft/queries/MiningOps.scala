package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Corpus, FuzzyJoin}
import graft.sources.Tables

/** Pattern-mining and sketch queries: Count-Min frequency sketch, Benford
  * first-digit audit, clickstream path mining, triangle counting, and the
  * seeded fuzzy-join differential matrix. All-integer outputs; every
  * query carries a full DuckDB oracle.
  */
object MiningOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** DuckDB-side distinct word n-gram extraction (mirrors
    * CorpusOps.gramsSql / Corpus.shingles).
    */
  private def gramsSqlDoc(rel: String, id: String, n: Int): String =
    s"""SELECT DISTINCT $id, array_to_string(ws[g:g+${n - 1}], ' ') AS gram
       |FROM (SELECT $id, string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS ws
       |      FROM $rel) w,
       |LATERAL (SELECT unnest(generate_series(1, len(ws)-${n - 1})) AS g) _t""".stripMargin

  /** pm3's oracle: journey → transition extraction, then 15 ppm value-
    * iteration rounds per variant (base + one per removed channel) as
    * chained MATERIALIZED CTEs — DuckDB inlines plain CTEs, so without
    * MATERIALIZED the journey pipeline would re-expand into every one
    * of the 5×15 iteration steps (the cur8 lesson). The `states` CTE is
    * DERIVED from the transition data (distinct src/dst minus the
    * structural START/CONV/NULL), replaying the engine's derived-channel
    * semantics; only the removal-variant LIST stays enumerated (each
    * variant is its own CTE chain — inherent to SQL codegen), so a
    * vocabulary change diverges as a loud missing-variant row mismatch
    * instead of silently iterating different state sets.
    */
  private lazy val pm3OracleSql: String = {
    val chans = Seq("click", "error", "signup", "view")
    val K = 15
    val prelude =
      """e AS MATERIALIZED (SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |fp AS MATERIALIZED (SELECT user_id, d, min(struct_pack(ts := ts, event_id := event_id)) AS cutr
        |  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
        |pe AS MATERIALIZED (SELECT e.user_id, e.d, e.ts, e.event_id, e.event_type,
        |    fp.cutr IS NOT NULL AS conv
        |  FROM e LEFT JOIN fp USING (user_id, d)
        |  WHERE e.event_type <> 'purchase'
        |    AND (fp.cutr IS NULL OR struct_pack(ts := e.ts, event_id := e.event_id) < fp.cutr)),
        |seqd AS MATERIALIZED (SELECT user_id, d, event_type, conv,
        |    row_number() OVER (PARTITION BY user_id, d ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id, d) AS npath
        |  FROM pe),
        |tr AS MATERIALIZED (
        |  SELECT 'START' AS src, event_type AS dst FROM seqd WHERE rn = 1
        |  UNION ALL
        |  SELECT prev, event_type FROM (
        |    SELECT event_type, lag(event_type) OVER (PARTITION BY user_id, d ORDER BY rn) AS prev
        |    FROM seqd) WHERE prev IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, CASE WHEN conv THEN 'CONV' ELSE 'NULL' END FROM seqd WHERE rn = npath
        |  UNION ALL
        |  SELECT 'START', 'CONV' FROM (
        |    SELECT user_id, d FROM fp
        |    EXCEPT SELECT DISTINCT user_id, d FROM pe) _z),
        |cnt AS MATERIALIZED (SELECT src, dst, count(*) AS c FROM tr GROUP BY 1, 2),
        |mat AS MATERIALIZED (SELECT src, dst, c * 1000000 // SUM(c) OVER (PARTITION BY src) AS p FROM cnt),
        |states AS MATERIALIZED (
        |  SELECT 'START' AS state
        |  UNION
        |  SELECT s AS state
        |  FROM (SELECT src AS s FROM cnt UNION SELECT dst FROM cnt) _u
        |  WHERE s NOT IN ('START', 'CONV', 'NULL'))""".stripMargin
    def variant(tag: String, removed: Option[String]): String = {
      val excl = removed.map(c => s" WHERE s.state <> '$c'").getOrElse("")
      val extra = removed.map(c =>
        s" UNION ALL SELECT '$c', CAST(0 AS BIGINT)").getOrElse("")
      val init = s"""v${tag}0 AS MATERIALIZED (SELECT 'CONV' AS state, CAST(1000000 AS BIGINT) AS v
        | UNION ALL SELECT 'NULL', CAST(0 AS BIGINT)
        | UNION ALL SELECT state, CAST(0 AS BIGINT) FROM states)""".stripMargin
      val steps = (1 to K).map { k =>
        s"""v$tag$k AS MATERIALIZED (SELECT 'CONV' AS state, CAST(1000000 AS BIGINT) AS v
           | UNION ALL SELECT 'NULL', CAST(0 AS BIGINT)$extra
           | UNION ALL SELECT s.state,
           |   CAST(COALESCE((SELECT SUM(m.p * vv.v) FROM mat m JOIN v$tag${k - 1} vv ON vv.state = m.dst
           |     WHERE m.src = s.state), 0) // 1000000 AS BIGINT)
           | FROM states s$excl)""".stripMargin
      }
      (init +: steps).mkString(",\n")
    }
    val variants = variant("B", None) +: chans.zipWithIndex.map {
      case (c, i) => variant(s"R$i", Some(c))
    }
    val resRows =
      s"SELECT 'BASE' AS variant, (SELECT v FROM vB$K WHERE state='START') AS conv_ppm, CAST(0 AS BIGINT) AS re_ppm" +:
        chans.zipWithIndex.map { case (c, i) =>
          s"SELECT '$c', (SELECT v FROM vR$i$K WHERE state='START'), " +
            s"greatest((SELECT v FROM vB$K WHERE state='START') - (SELECT v FROM vR$i$K WHERE state='START'), 0)"
        }
    s"""WITH $prelude,
       |${variants.mkString(",\n")},
       |res AS (${resRows.mkString("\nUNION ALL ")}),
       |tot AS (SELECT CAST(SUM(re_ppm) AS BIGINT) AS t FROM res)
       |SELECT variant, conv_ppm, re_ppm,
       |  CAST(CASE WHEN t > 0 THEN re_ppm * 1000000 // t ELSE 0 END AS BIGINT) AS attr_ppm
       |FROM res, tot ORDER BY variant""".stripMargin
  }

  def all: Seq[Q] = Seq(

    // SK4 — Count-Min sketch (Cormode & Muthukrishnan 2005), d=4 rows x
    // w=64 buckets, probed for part keys 1..10 next to their exact
    // counts. Unlike engine-private HLL registers, CMS counters are pure
    // arithmetic on a portable hash (md5 prefix mod w), so the oracle
    // rebuilds the identical sketch and the estimate matches
    // bit-for-bit. Plan shape: the counter table is d*w = 256 rows built
    // by one map-side-combined aggregate over the fact table; probes are
    // a broadcast join against those 256 rows. The raw table never
    // shuffles — the sketch IS the shuffle payload, which is the whole
    // point at 100 TB.
    Q("sk4_countmin",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        def bucket(r: Column, k: Column): Column =
          pmod(conv(substring(md5(concat(r.cast(StringType), lit(":"),
            k.cast(StringType))), 1, 8), 16, 10).cast(LongType), lit(64L))
        val counters = li
          .select(col("l_partkey"), explode(sequence(lit(0), lit(3))).as("r"))
          .groupBy(col("r"), bucket(col("r"), col("l_partkey")).as("bucket"))
          .agg(count(lit(1)).as("c"))
        val probes = s.range(1, 11).select(col("id").as("probe_key"),
          explode(sequence(lit(0), lit(3))).as("r"))
          .select(col("probe_key"), col("r"),
            bucket(col("r"), col("probe_key")).as("bucket"))
        val est = probes.join(broadcast(counters), Seq("r", "bucket"))
          .groupBy("probe_key").agg(min(col("c")).as("est"))
        val exact = li.filter(col("l_partkey").between(1, 10))
          .groupBy(col("l_partkey").as("probe_key"))
          .agg(count(lit(1)).as("exact"))
        est.join(exact, Seq("probe_key"))
          .select(col("probe_key"), col("est"), col("exact"))
          .orderBy("probe_key")
      },
      Some("""WITH rows4 AS (SELECT unnest(generate_series(0,3)) AS r),
             |counters AS (
             |  SELECT r,
             |    CAST(('0x'||substr(md5(CAST(r AS VARCHAR)||':'||CAST(l_partkey AS VARCHAR)),1,8)) AS UBIGINT) % 64 AS bucket,
             |    count(*) AS c
             |  FROM lineitem, rows4 GROUP BY 1, 2),
             |probes AS (
             |  SELECT k AS probe_key, r,
             |    CAST(('0x'||substr(md5(CAST(r AS VARCHAR)||':'||CAST(k AS VARCHAR)),1,8)) AS UBIGINT) % 64 AS bucket
             |  FROM (SELECT unnest(generate_series(1,10)) AS k), rows4),
             |est AS (
             |  SELECT probe_key, min(c) AS est FROM probes
             |  JOIN counters USING (r, bucket) GROUP BY 1),
             |exact AS (
             |  SELECT l_partkey AS probe_key, count(*) AS exact FROM lineitem
             |  WHERE l_partkey BETWEEN 1 AND 10 GROUP BY 1)
             |SELECT probe_key, est, exact FROM est JOIN exact USING (probe_key)
             |ORDER BY probe_key""".stripMargin)),

    // DQ3 — Benford first-digit audit: the classic fraud/data-quality
    // screen. First significant digit of the exact integer cents of
    // o_totalprice, with observed permille vs the Benford-law expected
    // permille (floor(log10(1+1/d)*1000) precomputed as literals — no
    // floats cross the engines). One map-side-combined aggregate to 9
    // rows.
    Q("dq3_benford",
      (s, dir) => {
        val cents = round(col("o_totalprice") * 100).cast(LongType)
        val expected = typedLit(Map(
          1 -> 301L, 2 -> 176L, 3 -> 124L, 4 -> 96L, 5 -> 79L,
          6 -> 66L, 7 -> 57L, 8 -> 51L, 9 -> 45L))
        val digits = t(s, dir, "orders")
          .select(substring(cents.cast(StringType), 1, 1).cast(IntegerType).as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("cnt"))
        val tot = digits.agg(sum(col("cnt")).as("total"))
        digits.crossJoin(broadcast(tot))
          .select(col("digit"), col("cnt"),
            expr("cnt * 1000 div total").as("permille"),
            expected(col("digit")).as("benford_permille"))
          .orderBy("digit")
      },
      Some("""WITH d AS (
             |  SELECT CAST(substr(CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR),1,1) AS INTEGER) AS digit,
             |         count(*) AS cnt
             |  FROM orders GROUP BY 1),
             |t AS (SELECT sum(cnt) AS total FROM d),
             |e(digit, benford_permille) AS (VALUES (1, 301), (2, 176), (3, 124),
             |  (4, 96), (5, 79), (6, 66), (7, 57), (8, 51), (9, 45))
             |SELECT d.digit, cnt, CAST(cnt * 1000 // total AS BIGINT) AS permille,
             |       CAST(benford_permille AS BIGINT) AS benford_permille
             |FROM d CROSS JOIN t JOIN e ON d.digit = e.digit
             |ORDER BY d.digit""".stripMargin)),

    // PM1 — clickstream path mining: the most common 3-step event-type
    // paths across user journeys (events ordered by ts, event_id per
    // user). Complements fn1's fixed-funnel matching with open-ended
    // sequence discovery. Plan: one shuffle on user_id; each user's
    // sequence is assembled with sort_array(collect_list(struct)) —
    // bounded by per-user activity (a hot-user cap would chunk by
    // session at 100 TB; user fan-in here is bounded by the generator) —
    // then shingled into paths and re-aggregated map-side.
    Q("pm1_path_mining",
      (s, dir) => {
        val seqs = t(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))).as("evs"))
          .select(concat_ws(" ",
            expr("transform(evs, e -> e.event_type)")).as("seq"))
        seqs.select(explode(Corpus.shingles(col("seq"), 3)).as("path"))
          .groupBy("path").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 25)
          .orderBy(col("cnt").desc, col("path"))
      },
      Some("""WITH seqs AS (
             |  SELECT string_split(string_agg(event_type, ' ' ORDER BY ts, event_id), ' ') AS w
             |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
             |paths AS (
             |  SELECT array_to_string(w[i:i+2], ' ') AS path
             |  FROM seqs, LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i) _t)
             |SELECT path, count(*) AS cnt FROM paths
             |GROUP BY path HAVING count(*) >= 25
             |ORDER BY cnt DESC, path""".stripMargin)),

    // GR1 — per-node triangle participation in the word co-occurrence
    // graph (edges = unordered adjacent-word pairs seen >= 60 times).
    // Orientation trick (Suri & Vassilvitskii 2011): count each triangle
    // once by orienting every edge low->high endpoint, join
    // (a,b)x(b,c)x(a,c), then credit all three corners. At 100 TB the
    // orientation would be by degree (bounds the join fanout by sqrt(m));
    // the lexicographic form keeps the oracle a plain 3-way self-join
    // over an edge CTE. Vocabulary-sized frames throughout — the corpus
    // reduces to the edge list in one pass.
    Q("gr1_triangles",
      (s, dir) => {
        val bi = t(s, dir, "documents")
          .select(explode(Corpus.shingles(col("text"), 2)).as("g"))
          .select(split(col("g"), " ").getItem(0).as("x"),
            split(col("g"), " ").getItem(1).as("y"))
          .filter(col("x") =!= col("y"))
          .select(least(col("x"), col("y")).as("a"),
            greatest(col("x"), col("y")).as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
          .filter(col("w") >= 60)
          .select("a", "b")
        val e1 = bi.select(col("a").as("ta"), col("b").as("tb"))
        val e2 = bi.select(col("a").as("tb"), col("b").as("tc"))
        val e3 = bi.select(col("a").as("ta"), col("b").as("tc"))
        val tris = e1.join(e2, "tb").join(e3, Seq("ta", "tc"))
        val corners = tris.select(col("ta").as("word"))
          .unionAll(tris.select(col("tb").as("word")))
          .unionAll(tris.select(col("tc").as("word")))
        corners.groupBy("word").agg(count(lit(1)).as("tri_cnt"))
          .orderBy(col("tri_cnt").desc, col("word"))
      },
      Some("""WITH ws AS (SELECT doc_id, string_split(trim(regexp_replace(text,'\s+',' ','g')),' ') AS w
             |           FROM documents),
             |bi AS (SELECT w[i] AS x, w[i+1] AS y FROM ws,
             |       LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) _t),
             |e AS (SELECT least(x,y) AS a, greatest(x,y) AS b FROM bi
             |      WHERE x <> y GROUP BY 1, 2 HAVING count(*) >= 60),
             |tri AS (SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
             |        FROM e e1 JOIN e e2 ON e1.b = e2.a
             |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |corners AS (SELECT ta AS word FROM tri UNION ALL
             |            SELECT tb FROM tri UNION ALL SELECT tc FROM tri)
             |SELECT word, count(*) AS tri_cnt FROM corners GROUP BY word
             |ORDER BY tri_cnt DESC, word""".stripMargin)),

    // SK5 — KMV mergeability: the property that makes the sketch a
    // distributed aggregate. Split orders into two halves, sketch each
    // (bottom-256 distinct hashes of o_custkey), and check the identity
    // bottomk(sketchA ∪ sketchB) == bottomk(A ∪ B): merging the two
    // 256-row partials gives EXACTLY the sketch of the union — which is
    // why partition-local sketches + one tiny combine replace a global
    // distinct at 100 TB. Both the direct and the merged k-th hash (and
    // the resulting estimate) are emitted; the oracle replays both paths
    // and they must agree bit-for-bit.
    Q("sk5_kmv_merge",
      (s, dir) => {
        val k = 256
        def h(df: DataFrame): DataFrame =
          df.select(md5(concat(lit("kmv:"),
            col("o_custkey").cast(StringType))).as("h")).distinct()
        val orders = t(s, dir, "orders")
        val ha = h(orders.filter(col("o_orderkey") % 2 === 0))
        val hb = h(orders.filter(col("o_orderkey") % 2 === 1))
        val ka = ha.orderBy("h").limit(k)
        val kb = hb.orderBy("h").limit(k)
        val merged = ka.unionAll(kb).distinct().orderBy("h").limit(k)
          .agg(max(col("h")).as("kth_merged"))
        val direct = ha.unionAll(hb).distinct().orderBy("h").limit(k)
          .agg(max(col("h")).as("kth_direct"))
        val exact = orders.agg(countDistinct(col("o_custkey")).as("exact_ndv"))
        direct.crossJoin(merged).crossJoin(exact)
          .withColumn("hv",
            conv(substring(col("kth_merged"), 1, 12), 16, 10).cast(LongType))
          .select(col("kth_direct"), col("kth_merged"),
            (col("kth_direct") === col("kth_merged")).as("merge_exact"),
            expr(s"${(k - 1).toLong * (1L << 48)} div hv").as("est_ndv"),
            col("exact_ndv"))
      },
      Some("""WITH ha AS (SELECT DISTINCT md5('kmv:' || CAST(o_custkey AS VARCHAR)) AS h
             |           FROM orders WHERE o_orderkey % 2 = 0),
             |hb AS (SELECT DISTINCT md5('kmv:' || CAST(o_custkey AS VARCHAR)) AS h
             |       FROM orders WHERE o_orderkey % 2 = 1),
             |ka AS (SELECT h FROM ha ORDER BY h LIMIT 256),
             |kb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
             |m AS (SELECT max(h) AS kth_merged FROM (
             |      SELECT DISTINCT h FROM (SELECT * FROM ka UNION ALL SELECT * FROM kb)
             |      ORDER BY h LIMIT 256)),
             |d AS (SELECT max(h) AS kth_direct FROM (
             |      SELECT DISTINCT h FROM (SELECT * FROM ha UNION ALL SELECT * FROM hb)
             |      ORDER BY h LIMIT 256)),
             |x AS (SELECT count(DISTINCT o_custkey) AS exact_ndv FROM orders)
             |SELECT kth_direct, kth_merged, kth_direct = kth_merged AS merge_exact,
             |  (255 * 281474976710656)
             |    // CAST(CAST(('0x' || substr(kth_merged,1,12)) AS UBIGINT) AS BIGINT)
             |    AS est_ndv,
             |  exact_ndv
             |FROM d, m, x""".stripMargin)),

    // PM2 — Markov transition matrix over event types: per-user adjacent
    // transitions, P(dst|src) in exact-integer permille of src's
    // outgoing count. The first-order model behind pm1's raw paths.
    Q("pm2_markov",
      (s, dir) => {
        val trans = t(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))).as("evs"))
          .select(concat_ws(" ", expr("transform(evs, e -> e.event_type)")).as("seq"))
          .select(explode(Corpus.shingles(col("seq"), 2)).as("g"))
          .select(split(col("g"), " ").getItem(0).as("src"),
            split(col("g"), " ").getItem(1).as("dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
        val out = trans.groupBy("src").agg(sum(col("cnt")).as("out_total"))
        trans.join(broadcast(out), Seq("src"))
          .select(col("src"), col("dst"), col("cnt"),
            expr("cnt * 1000 div out_total").as("permille"))
          .orderBy("src", "dst")
      },
      Some("""WITH seqs AS (
             |  SELECT string_split(string_agg(event_type, ' ' ORDER BY ts, event_id), ' ') AS w
             |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
             |trans AS (
             |  SELECT w[i] AS src, w[i+1] AS dst, count(*) AS cnt
             |  FROM seqs, LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) _t
             |  GROUP BY 1, 2),
             |o AS (SELECT src, sum(cnt) AS out_total FROM trans GROUP BY 1)
             |SELECT src, dst, cnt, CAST(cnt * 1000 // out_total AS BIGINT) AS permille
             |FROM trans JOIN o USING (src)
             |ORDER BY src, dst""".stripMargin)),

    // CC2 — decontamination APPLY: the clean corpus after dropping every
    // document cc1 flags (>= 10 shared distinct 5-grams with a probe).
    // The flagged set arrives as a left-anti join — the corpus-side plan
    // is one pushed-filter scan + the same broadcast shingle join, and
    // the output is the kept per-source doc counts (bounded), not the
    // corpus itself.
    Q("cc2_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val probes = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("probe_id"),
            col("text").as("probe_text"))
        val flagged = Corpus.contamination(
          docs.select(col("doc_id"), col("text")), "doc_id", "text",
          probes, "probe_id", "probe_text", n = 5, minOverlap = 10)
          .select("doc_id").distinct()
        docs.join(flagged, Seq("doc_id"), "left_anti")
          .groupBy("source").agg(count(lit(1)).as("kept_docs"),
            sum(col("n_chars")).as("kept_chars"))
          .orderBy("source")
      },
      Some(s"""WITH dg AS (${gramsSqlDoc("documents", "doc_id", 5)}),
              |pg AS (
              | ${gramsSqlDoc(
                   "(SELECT doc_id + 1000000 AS probe_id, text FROM documents WHERE doc_id % 10 = 0)",
                   "probe_id", 5)}),
              |flagged AS (
              | SELECT DISTINCT dg.doc_id
              | FROM dg JOIN pg USING (gram)
              | GROUP BY dg.doc_id, pg.probe_id HAVING COUNT(*) >= 10)
              |SELECT source, count(*) AS kept_docs, CAST(sum(n_chars) AS BIGINT) AS kept_chars
              |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
              |GROUP BY source ORDER BY source""".stripMargin)),

    // TS3 — Holt's linear-trend forecast (exponential smoothing with
    // trend, alpha=beta=1/2) over per-type daily event counts, in
    // exact-integer milli fixed point: l_t = (1000*y_t + l + b) div 2,
    // b_t = ((l_t - l_{t-1}) + b_{t-1}) div 2 (both engines' integer
    // div truncates toward zero — same convention fe4 established).
    // The recurrence is inherently sequential per series, so the fold
    // runs as aggregate() over each type's sorted count array — series
    // are day-grain aggregates (bounded), never raw events; the oracle
    // replays the identical recurrence as a recursive CTE.
    Q("ts3_holt_forecast",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        daily.groupBy("event_type")
          .agg(sort_array(collect_list(struct(col("d"), col("c")))).as("dc"))
          .select(col("event_type"),
            expr("transform(dc, x -> x.c)").as("cs"))
          .select(col("event_type"),
            size(col("cs")).cast(LongType).as("n_days"),
            expr("""aggregate(
                     slice(cs, 2, greatest(size(cs) - 1, 0)),
                     named_struct('l', element_at(cs, 1) * 1000L, 'b', 0L),
                     (acc, y) -> named_struct(
                       'l', (y * 1000L + acc.l + acc.b) div 2,
                       'b', (((y * 1000L + acc.l + acc.b) div 2) - acc.l + acc.b) div 2))
                 """).as("h"))
          .select(col("event_type"), col("n_days"),
            col("h.l").as("level_milli"), col("h.b").as("trend_milli"),
            (col("h.l") + col("h.b") * 3L).as("forecast3_milli"))
          .orderBy("event_type")
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |seq AS (SELECT event_type, c,
             |        row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
             |        FROM daily),
             |n AS (SELECT event_type, max(rn) AS mx FROM seq GROUP BY 1),
             |holt AS (
             |  SELECT event_type, 1 AS rn, c * 1000 AS l, CAST(0 AS BIGINT) AS b
             |  FROM seq WHERE rn = 1
             |  UNION ALL
             |  SELECT s.event_type, s.rn,
             |    (s.c * 1000 + h.l + h.b) // 2,
             |    (((s.c * 1000 + h.l + h.b) // 2) - h.l + h.b) // 2
             |  FROM holt h JOIN seq s
             |    ON s.event_type = h.event_type AND s.rn = h.rn + 1)
             |SELECT h.event_type AS event_type, CAST(n.mx AS BIGINT) AS n_days,
             |  l AS level_milli, b AS trend_milli,
             |  l + 3 * b AS forecast3_milli
             |FROM holt h JOIN n ON n.event_type = h.event_type AND h.rn = n.mx
             |ORDER BY h.event_type""".stripMargin)),

    // PM3 — Markov removal-effect attribution (Anderl et al. 2014, the
    // "Markov chain attribution" standard): user-day journeys truncate
    // at the first purchase (→CONV, else →NULL), transitions count into
    // a CHANNEL-GRAIN matrix (bounded by the event-type vocabulary, the
    // sketch-frame class), conversion probability is 15 rounds of
    // integer-ppm value iteration, and each channel's credit is the
    // drop in P(conv) when that channel's state is pinned to zero —
    // normalized to ppm. Distributed work is the journey scan +
    // transition count; the ≤6×6 matrix algebra is driver-side exact
    // Long arithmetic, and the oracle replays the SAME iterations as
    // MATERIALIZED chained CTEs (DuckDB would otherwise re-inline the
    // journey pipeline into every one of the 5×15 iteration steps).
    Q("pm3_markov_attribution",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val e = t(s, dir, "events").filter(col("user_id").isNotNull)
          .select(col("user_id"), to_date(col("ts")).as("d"),
            col("ts"), col("event_id"), col("event_type"))
        val fp = e.filter(col("event_type") === "purchase")
          .groupBy("user_id", "d")
          .agg(min(struct(col("ts"), col("event_id"))).as("cutr"))
        val pe = e.filter(col("event_type") =!= "purchase")
          .join(fp, Seq("user_id", "d"), "left")
          .filter(col("cutr").isNull ||
            struct(col("ts"), col("event_id")) < col("cutr"))
          .withColumn("conv", col("cutr").isNotNull)
        val wS = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
        val seqd = pe
          .withColumn("rn", row_number().over(wS))
          .withColumn("npath",
            count(lit(1)).over(Window.partitionBy("user_id", "d")))
          .withColumn("prev", lag(col("event_type"), 1).over(wS))
        val trs = seqd.filter(col("rn") === 1)
          .select(lit("START").as("src"), col("event_type").as("dst"))
          .unionAll(seqd.filter(col("prev").isNotNull)
            .select(col("prev").as("src"), col("event_type").as("dst")))
          .unionAll(seqd.filter(col("rn") === col("npath"))
            .select(col("event_type").as("src"),
              when(col("conv"), "CONV").otherwise("NULL").as("dst")))
          .unionAll(fp.select("user_id", "d")
            .join(pe.select("user_id", "d").distinct(),
              Seq("user_id", "d"), "left_anti")
            .select(lit("START").as("src"), lit("CONV").as("dst")))
        // channels are DERIVED from the transition data (bounded by the
        // spark.graft.attribution.maxChannels seatbelt), not hardcoded:
        // a new event type flows into the matrix instead of silently
        // dropping out of attribution (AttributionSpec plants one)
        val cnt = trs.groupBy("src", "dst").agg(count(lit(1)).as("c"))
        graft.operators.Attribution.removalEffects(cnt,
          maxChannels =
            s.conf.get("spark.graft.attribution.maxChannels", "64").toInt)
      },
      Some(pm3OracleSql)),

    // TS6 — additive Holt–Winters (triple exponential smoothing,
    // Winters 1960): ts3's level+trend recursion extended with a
    // 7-slot weekly seasonal state, α=β=γ=1/2 in milli fixed point so
    // every update is integer division (`div` == `//` on negatives per
    // the repo convention). Same distributed shape as ts3: one day-
    // grain aggregate, then a bounded per-key sequential fold — the
    // `aggregate` HOF carries (level, trend, season[7], t) through the
    // ≤30-element daily array while the oracle's recursive CTE carries
    // the identical list state; parallelism is across keys, the ONLY
    // axis that grows at 100 TB (days per key stay bounded).
    Q("ts6_holt_winters",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        daily.groupBy("event_type")
          .agg(sort_array(collect_list(struct(col("d"), col("c")))).as("dc"))
          .select(col("event_type"),
            expr("transform(dc, x -> x.c)").as("cs"))
          .select(col("event_type"),
            size(col("cs")).cast(LongType).as("n_days"),
            expr("""aggregate(
                     slice(cs, 2, greatest(size(cs) - 1, 0)),
                     named_struct('l', element_at(cs, 1) * 1000L, 'b', 0L,
                       's', array_repeat(0L, 7), 'i', 1L),
                     (acc, y) -> named_struct(
                       'l', ((y * 1000L - element_at(acc.s, CAST(acc.i % 7 + 1 AS INT))) + acc.l + acc.b) div 2,
                       'b', ((((y * 1000L - element_at(acc.s, CAST(acc.i % 7 + 1 AS INT))) + acc.l + acc.b) div 2) - acc.l + acc.b) div 2,
                       's', transform(acc.s, (v, j) -> CASE WHEN j = CAST(acc.i % 7 AS INT)
                             THEN ((y * 1000L - (((y * 1000L - element_at(acc.s, CAST(acc.i % 7 + 1 AS INT))) + acc.l + acc.b) div 2)) + v) div 2
                             ELSE v END),
                       'i', acc.i + 1L))
                 """).as("h"))
          .select(col("event_type"), col("n_days"),
            col("h.l").as("level_milli"), col("h.b").as("trend_milli"),
            expr("element_at(h.s, CAST((n_days + 2) % 7 + 1 AS INT))")
              .as("season3_milli"),
            expr("h.l + 3 * h.b + element_at(h.s, CAST((n_days + 2) % 7 + 1 AS INT))")
              .as("forecast3_milli"))
          .orderBy("event_type")
      },
      Some("""WITH RECURSIVE daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |seq AS (SELECT event_type, c,
             |        row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
             |        FROM daily),
             |n AS (SELECT event_type, max(rn) AS mx FROM seq GROUP BY 1),
             |hw AS (
             |  SELECT event_type, 1 AS rn, c*1000 AS l, CAST(0 AS BIGINT) AS b,
             |    CAST([0,0,0,0,0,0,0] AS BIGINT[]) AS s
             |  FROM seq WHERE rn = 1
             |  UNION ALL
             |  SELECT s2.event_type, s2.rn,
             |    ((s2.c*1000 - h.s[(h.rn % 7) + 1]) + h.l + h.b) // 2,
             |    ((((s2.c*1000 - h.s[(h.rn % 7) + 1]) + h.l + h.b) // 2) - h.l + h.b) // 2,
             |    [CASE WHEN j = (h.rn % 7) + 1
             |       THEN ((s2.c*1000 - (((s2.c*1000 - h.s[(h.rn % 7) + 1]) + h.l + h.b) // 2)) + h.s[j]) // 2
             |       ELSE h.s[j] END FOR j IN range(1, 8)]
             |  FROM hw h JOIN seq s2 ON s2.event_type = h.event_type AND s2.rn = h.rn + 1)
             |SELECT h.event_type AS event_type, CAST(n.mx AS BIGINT) AS n_days,
             |  l AS level_milli, b AS trend_milli,
             |  CAST(h.s[((n.mx + 2) % 7) + 1] AS BIGINT) AS season3_milli,
             |  CAST(l + 3*b + h.s[((n.mx + 2) % 7) + 1] AS BIGINT) AS forecast3_milli
             |FROM hw h JOIN n ON n.event_type = h.event_type AND h.rn = n.mx
             |ORDER BY h.event_type""".stripMargin)),

    // TS4 — lag cross-correlation between event-type daily series: for
    // each ordered type pair and lag 0..7, the integer dot product
    // sum(c_a[d] * c_b[d+lag]); best_lag = argmax (ties to the smaller
    // lag). Day-grain frames only; the lag dimension is an 8-element
    // explode joined by date arithmetic — no window over raw events.
    Q("ts4_lag_corr",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val a = daily.select(col("event_type").as("ta"), col("d").as("da"),
          col("c").as("ca"))
          .crossJoin(broadcast(s.range(0, 8).select(col("id").cast(IntegerType).as("lag"))))
        val b = daily.select(col("event_type").as("tb"), col("d").as("db"),
          col("c").as("cb"))
        val dots = a.join(b,
            col("db") === date_add(col("da"), col("lag")) &&
            col("ta") < col("tb"))
          .groupBy("ta", "tb", "lag")
          // decimal accumulation: daily counts square to ~9e18 per term
          // at ~3e9 events/day — the fe4/tx11 silent-wrap class
          .agg(sum(col("ca").cast(DecimalType(38, 0)) * col("cb"))
            .cast(LongType).as("dot"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("ta", "tb").orderBy(col("dot").desc, col("lag"))
        dots.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .select(col("ta"), col("tb"), col("lag").cast(LongType).as("best_lag"),
            col("dot"))
          .orderBy("ta", "tb")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |dots AS (
             |  SELECT a.event_type AS ta, b.event_type AS tb, l.lag,
             |         CAST(sum(CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS dot
             |  FROM daily a
             |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS lag) l
             |  JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
             |              AND a.event_type < b.event_type
             |  GROUP BY 1, 2, 3),
             |best AS (
             |  SELECT ta, tb, lag, dot,
             |         row_number() OVER (PARTITION BY ta, tb
             |                            ORDER BY dot DESC, lag) AS rn
             |  FROM dots)
             |SELECT ta, tb, CAST(lag AS BIGINT) AS best_lag, dot
             |FROM best WHERE rn = 1
             |ORDER BY ta, tb""".stripMargin)),

    // TS5 — classical seasonal decomposition (ratio-to-moving-average,
    // the Census-I shape) of the per-type daily series, all-integer:
    // trend = centered 7-day moving average in milli (ROWS frame, edge
    // windows average what exists), detrended ratio in permille, weekday
    // seasonal index = integer mean of the ratios per ISO dow, residual
    // = ratio − index. Day-grain frames only; two tiny shuffles (daily
    // agg, dow agg) and one broadcastable (type × 7) index join.
    Q("ts5_seasonal",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        val de = daily
          .withColumn("sum_w", sum(col("c")).over(w))
          .withColumn("cnt_w", count(lit(1)).over(w))
          .withColumn("trend_m", expr("CAST(sum_w * 1000 div cnt_w AS BIGINT)"))
          .withColumn("dow", (weekday(col("d")) + 1).cast(LongType))
          .withColumn("detr_pm", expr("CAST(c * 1000000 div trend_m AS BIGINT)"))
        val seas = de.groupBy("event_type", "dow")
          .agg(expr("CAST(sum(detr_pm) div count(1) AS BIGINT)").as("seas_pm"))
        de.join(broadcast(seas), Seq("event_type", "dow"))
          .select(col("event_type"), col("d"), col("c"), col("trend_m"),
            col("detr_pm"), col("seas_pm"),
            (col("detr_pm") - col("seas_pm")).as("resid_pm"))
          .orderBy("event_type", "d")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |tr AS (
             |  SELECT event_type, d, c,
             |    CAST(SUM(c) OVER w * 1000 // COUNT(*) OVER w AS BIGINT) AS trend_m,
             |    CAST(isodow(d) AS BIGINT) AS dow
             |  FROM daily
             |  WINDOW w AS (PARTITION BY event_type ORDER BY d
             |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |de AS (SELECT *, CAST(c * 1000000 // trend_m AS BIGINT) AS detr_pm
             |       FROM tr),
             |se AS (SELECT event_type, dow,
             |         CAST(SUM(detr_pm) // COUNT(*) AS BIGINT) AS seas_pm
             |       FROM de GROUP BY 1, 2)
             |SELECT de.event_type, de.d, de.c, de.trend_m, de.detr_pm,
             |  se.seas_pm, CAST(de.detr_pm - se.seas_pm AS BIGINT) AS resid_pm
             |FROM de JOIN se USING (event_type, dow)
             |ORDER BY event_type, d""".stripMargin)),

    // AN3 — CUSUM changepoint detection (Page 1954) on the per-type
    // daily series: one-sided cumulative sum of milli-excess over the
    // series mean with 10% slack, alarm when it crosses one mean's
    // worth of accumulated excess. The sequential recurrence folds
    // day-grain arrays via aggregate() (the ts3 shape — never raw
    // events); the oracle replays it as a recursive CTE. Emits per type
    // the max CUSUM, the first alarm day, and the alarm-day count —
    // deterministic whether or not the fixture contains a shift.
    Q("an3_cusum_changepoint",
      (s, dir) => {
        val daily0 = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
        // two arms: the raw series (flat fixture — the no-alarm path) and
        // a planted level shift (2nd half doubled — the alarm path MUST
        // fire), so both sides of the detector are oracle-exercised
        val daily = daily0.withColumn("arm", lit("raw")).unionByName(
          daily0.select(col("event_type"), col("d"),
            when(col("d") >= lit("2024-01-16"), col("c") * 2)
              .otherwise(col("c")).as("c"))
            .withColumn("arm", lit("shifted")))
        daily.groupBy("arm", "event_type")
          .agg(sort_array(collect_list(struct(col("d"), col("c")))).as("dc"),
            sum("c").as("tot"), count(lit(1)).as("nd"))
          .withColumn("mean_m", expr("CAST(tot * 1000 div nd AS BIGINT)"))
          .withColumn("slack", expr("mean_m div 10"))
          .withColumn("r", expr(
            """aggregate(dc,
              |  named_struct('s', 0L, 'mx', 0L,
              |               'fd', CAST(NULL AS DATE), 'al', 0L),
              |  (acc, x) -> named_struct(
              |    's', greatest(0L, acc.s + x.c * 1000L - mean_m - slack),
              |    'mx', greatest(acc.mx,
              |      greatest(0L, acc.s + x.c * 1000L - mean_m - slack)),
              |    'fd', coalesce(acc.fd,
              |      CASE WHEN greatest(0L, acc.s + x.c * 1000L - mean_m - slack)
              |             > mean_m THEN x.d END),
              |    'al', acc.al +
              |      CASE WHEN greatest(0L, acc.s + x.c * 1000L - mean_m - slack)
              |             > mean_m THEN 1L ELSE 0L END))""".stripMargin))
          .select(col("arm"), col("event_type"),
            col("nd").cast(LongType).as("n_days"),
            col("mean_m"), col("r.mx").as("max_cusum_m"),
            col("r.fd").as("first_alarm_d"), col("r.al").as("n_alarms"))
          .orderBy("arm", "event_type")
      },
      Some("""WITH RECURSIVE daily0 AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |daily AS (
             |  SELECT 'raw' AS arm, event_type, d, c FROM daily0
             |  UNION ALL
             |  SELECT 'shifted', event_type, d,
             |    CASE WHEN d >= DATE '2024-01-16' THEN c * 2 ELSE c END
             |  FROM daily0),
             |seq AS (SELECT arm, event_type, d, c,
             |        row_number() OVER (PARTITION BY arm, event_type
             |                           ORDER BY d) AS rn
             |        FROM daily),
             |m AS (SELECT arm, event_type,
             |        CAST(SUM(c) * 1000 // COUNT(*) AS BIGINT) AS mean_m,
             |        COUNT(*) AS nd FROM daily GROUP BY 1, 2),
             |cu AS (
             |  SELECT s.arm, s.event_type, s.rn,
             |    GREATEST(CAST(0 AS BIGINT),
             |      s.c * 1000 - m.mean_m - m.mean_m // 10) AS cs,
             |    GREATEST(CAST(0 AS BIGINT),
             |      s.c * 1000 - m.mean_m - m.mean_m // 10) AS mx,
             |    CASE WHEN GREATEST(CAST(0 AS BIGINT),
             |        s.c * 1000 - m.mean_m - m.mean_m // 10) > m.mean_m
             |      THEN s.d END AS fd,
             |    CAST(CASE WHEN GREATEST(CAST(0 AS BIGINT),
             |        s.c * 1000 - m.mean_m - m.mean_m // 10) > m.mean_m
             |      THEN 1 ELSE 0 END AS BIGINT) AS al
             |  FROM seq s JOIN m USING (arm, event_type) WHERE s.rn = 1
             |  UNION ALL
             |  SELECT s.arm, s.event_type, s.rn,
             |    GREATEST(CAST(0 AS BIGINT),
             |      cu.cs + s.c * 1000 - m.mean_m - m.mean_m // 10),
             |    GREATEST(cu.mx, GREATEST(CAST(0 AS BIGINT),
             |      cu.cs + s.c * 1000 - m.mean_m - m.mean_m // 10)),
             |    COALESCE(cu.fd, CASE WHEN GREATEST(CAST(0 AS BIGINT),
             |        cu.cs + s.c * 1000 - m.mean_m - m.mean_m // 10) > m.mean_m
             |      THEN s.d END),
             |    cu.al + CASE WHEN GREATEST(CAST(0 AS BIGINT),
             |        cu.cs + s.c * 1000 - m.mean_m - m.mean_m // 10) > m.mean_m
             |      THEN 1 ELSE 0 END
             |  FROM cu JOIN seq s ON s.arm = cu.arm
             |                    AND s.event_type = cu.event_type
             |                    AND s.rn = cu.rn + 1
             |  JOIN m ON m.arm = s.arm AND m.event_type = s.event_type)
             |SELECT cu.arm, cu.event_type, CAST(m.nd AS BIGINT) AS n_days,
             |  m.mean_m, cu.mx AS max_cusum_m, cu.fd AS first_alarm_d,
             |  CAST(cu.al AS BIGINT) AS n_alarms
             |FROM cu JOIN m USING (arm, event_type) WHERE cu.rn = m.nd
             |ORDER BY arm, event_type""".stripMargin)),

    // GR2 — link prediction by common neighbors (Liben-Nowell & Kleinberg
    // 2003): for word pairs NOT currently edges of the gr1 graph, the
    // common-neighbor count and neighborhood-Jaccard permille — the
    // "which words will co-occur next" ranking. Everything happens on the
    // vocabulary-sized edge list: neighbors join on the shared middle
    // node, the anti-join removes existing edges.
    Q("gr2_link_pred",
      (s, dir) => {
        val edges = t(s, dir, "documents")
          .select(explode(Corpus.shingles(col("text"), 2)).as("g"))
          .select(split(col("g"), " ").getItem(0).as("x"),
            split(col("g"), " ").getItem(1).as("y"))
          .filter(col("x") =!= col("y"))
          .select(least(col("x"), col("y")).as("a"),
            greatest(col("x"), col("y")).as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
          .filter(col("w") >= 60)
          .select("a", "b")
        val nbrs = edges.select(col("a").as("n"), col("b").as("m"))
          .unionAll(edges.select(col("b").as("n"), col("a").as("m")))
        val deg = nbrs.groupBy(col("n")).agg(count(lit(1)).as("deg"))
        val cn = nbrs.select(col("m").as("mid"), col("n").as("u"))
          .join(nbrs.select(col("m").as("mid"), col("n").as("v")), "mid")
          .filter(col("u") < col("v"))
          .groupBy("u", "v").agg(count(lit(1)).as("common"))
          .join(edges.select(col("a").as("u"), col("b").as("v")),
            Seq("u", "v"), "left_anti")
        cn.join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
          .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
          .select(col("u"), col("v"), col("common"),
            expr("common * 1000 div (du + dv - common)").as("nbr_jaccard_pm"))
          .filter(col("common") >= 3)
          .orderBy(col("nbr_jaccard_pm").desc, col("u"), col("v"))
      },
      Some("""WITH ws AS (SELECT doc_id, string_split(trim(regexp_replace(text,'\s+',' ','g')),' ') AS w
             |           FROM documents),
             |bi AS (SELECT w[i] AS x, w[i+1] AS y FROM ws,
             |       LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) _t),
             |e AS (SELECT least(x,y) AS a, greatest(x,y) AS b FROM bi
             |      WHERE x <> y GROUP BY 1, 2 HAVING count(*) >= 60),
             |nbrs AS (SELECT a AS n, b AS m FROM e UNION ALL SELECT b, a FROM e),
             |deg AS (SELECT n, count(*) AS deg FROM nbrs GROUP BY 1),
             |cn AS (
             |  SELECT x.n AS u, y.n AS v, count(*) AS common
             |  FROM nbrs x JOIN nbrs y ON x.m = y.m AND x.n < y.n
             |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = x.n AND e.b = y.n)
             |  GROUP BY 1, 2)
             |SELECT u, v, common,
             |       common * 1000 // (du.deg + dv.deg - common) AS nbr_jaccard_pm
             |FROM cn JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v
             |WHERE common >= 3
             |ORDER BY nbr_jaccard_pm DESC, u, v""".stripMargin)),

    // DQ4 — referential-integrity audit: orphan counts across the
    // foreign-key chain lineitem->orders->customer, plus a PLANTED
    // violation set (customers with key % 97 == 0 treated as deleted) so
    // the check demonstrably fires. Each arm is a broadcast/shuffled
    // anti-join counted to one row — the Deequ-style complement to dq2's
    // single-table checks.
    Q("dq4_ref_integrity",
      (s, dir) => {
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val orphanLi = li.join(o.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti").agg(count(lit(1)).as("violations"))
          .select(lit("lineitem_orphan_orders").as("check"), col("violations"))
        val orphanO = o.join(c.select(col("c_custkey").as("o_custkey")),
          Seq("o_custkey"), "left_anti").agg(count(lit(1)).as("violations"))
          .select(lit("orders_orphan_customer").as("check"), col("violations"))
        val surviving = c.filter(col("c_custkey") % 97 =!= 0)
        val planted = o.join(surviving.select(col("c_custkey").as("o_custkey")),
          Seq("o_custkey"), "left_anti").agg(count(lit(1)).as("violations"))
          .select(lit("orders_orphan_after_deletes").as("check"), col("violations"))
        orphanLi.unionAll(orphanO).unionAll(planted).orderBy("check")
      },
      Some("""SELECT 'lineitem_orphan_orders' AS "check", count(*) AS violations
             |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
             |UNION ALL
             |SELECT 'orders_orphan_customer', count(*)
             |FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
             |UNION ALL
             |SELECT 'orders_orphan_after_deletes', count(*)
             |FROM orders WHERE o_custkey NOT IN
             |  (SELECT c_custkey FROM customer WHERE c_custkey % 97 <> 0)
             |ORDER BY "check"""".stripMargin)),

    // TX12 — Heaps'-law vocabulary growth: cumulative distinct-word
    // count after each corpus decile (by doc_id order) — the curve that
    // says when a corpus stops teaching a tokenizer new words. First
    // appearances are one word-grain aggregate; the decile join is 10
    // broadcast rows. (The tiny synthetic vocab saturates in decile 1 —
    // the SHAPE of the computation is what scales.)
    Q("tx12_heaps_vocab",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val firstSeen = docs
          .select(col("doc_id"), explode(Corpus.words(col("text"))).as("word"))
          .groupBy("word").agg(min(col("doc_id")).as("first_doc"))
        val mx = docs.agg(max(col("doc_id")).as("mx"))
        val deciles = s.range(1, 11).select(col("id").as("decile"))
          .crossJoin(broadcast(mx))
          .select(col("decile"), expr("decile * mx div 10").as("cutoff"))
        // unhinted non-equi join: Spark then broadcasts the 10-row deciles
        // side, not the vocabulary-grain firstSeen
        deciles.join(firstSeen,
            col("first_doc") <= col("cutoff"), "left_outer")
          .groupBy("decile", "cutoff")
          .agg(count(col("word")).as("vocab"))
          .orderBy("decile")
      },
      Some("""WITH fs AS (
             |  SELECT w.word, min(doc_id) AS first_doc
             |  FROM (SELECT doc_id,
             |          string_split(trim(regexp_replace(text,'\s+',' ','g')),' ') AS ws
             |        FROM documents) d,
             |       LATERAL (SELECT unnest(ws) AS word) w
             |  GROUP BY 1),
             |m AS (SELECT max(doc_id) AS mx FROM documents),
             |dec AS (SELECT d AS decile, d * mx // 10 AS cutoff
             |        FROM (SELECT unnest(generate_series(1, 10)) AS d), m)
             |SELECT CAST(decile AS BIGINT) AS decile, cutoff,
             |       count(word) AS vocab
             |FROM dec LEFT JOIN fs ON first_doc <= cutoff
             |GROUP BY 1, 2 ORDER BY decile""".stripMargin)),

    // MM5 — WAV metadata round-trip: plantWavPayload writes a REAL
    // RIFF/WAVE byte stream (odd-length bodies get a LIST junk chunk so
    // a fixed-offset parser cannot pass), decodeWavMeta chunk-walks it
    // back, and the oracle recomputes the planted parameters from the
    // source text length — an encoder bug and a parser bug cannot
    // cancel. Same plant/parse/arithmetic-oracle design as mm1/mm3.
    Q("mm5_wav_meta",
      (s, dir) => graft.operators.Multimodal.decodeWavMeta(
        graft.operators.Multimodal.plantWavPayload(
          t(s, dir, "documents"), "doc_id", "text"),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(1 + n % 2 AS BIGINT) AS channels,
             |  CAST(8000 + (n % 5) * 4000 AS BIGINT) AS sample_rate,
             |  CAST(CASE WHEN n % 3 = 0 THEN 16 ELSE 8 END AS BIGINT) AS bits,
             |  CAST(n // ((1 + n % 2) * (CASE WHEN n % 3 = 0 THEN 16 ELSE 8 END) // 8) AS BIGINT) AS n_samples,
             |  CAST((n // ((1 + n % 2) * (CASE WHEN n % 3 = 0 THEN 16 ELSE 8 END) // 8)) * 1000
             |       // (8000 + (n % 5) * 4000) AS BIGINT) AS duration_ms
             |FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // MM6 — MP4 metadata round-trip, the video sibling of mm5:
    // plantMp4Payload writes a REAL big-endian ISO-BMFF stream (ftyp /
    // optional `free` junk box / moov>mvhd nested walk / mdat — written
    // in the size==1 + u64 LARGESIZE form on every n%7==0 payload, the
    // >4 GiB edge every real MP4 parser must handle), decodeMp4Meta
    // box-walks it back, and the oracle recomputes the planted
    // parameters from the source text length — an encoder bug and a
    // parser bug cannot cancel.
    Q("mm6_mp4_meta",
      (s, dir) => graft.operators.Multimodal.decodeMp4Meta(
        graft.operators.Multimodal.plantMp4Payload(
          t(s, dir, "documents"), "doc_id", "text"),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(600 + (n % 7) * 100 AS BIGINT) AS timescale,
             |  CAST(n * 100 AS BIGINT) AS duration,
             |  CAST(n AS BIGINT) AS mdat_bytes,
             |  CAST((n * 100) * 1000 // (600 + (n % 7) * 100) AS BIGINT) AS duration_ms,
             |  CAST(3 + n % 2 AS BIGINT) AS n_top_boxes
             |FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // MM7 — WARC metadata round-trip (ISO 28500, the Common Crawl
    // container — the INGESTION-side walk that precedes everything else
    // in a crawl pipeline): plantWarcPayload writes a REAL multi-record
    // WARC stream (warcinfo / odd-length docs get a request record so
    // the walk length varies / response with the text as body and the
    // doc id in the Target-URI), decodeWarcMeta record-walks it back
    // via Content-Length + CRLF framing with hostile-size guards, and
    // the oracle recomputes every planted parameter — including the
    // total container size, which depends on the DIGIT COUNTS of n and
    // doc_id — from the source text length. Same plant/parse/
    // arithmetic-oracle design as mm1/mm5/mm6.
    Q("mm7_warc_meta",
      (s, dir) => graft.operators.Multimodal.decodeWarcMeta(
        graft.operators.Multimodal.plantWarcPayload(
          t(s, dir, "documents"), "doc_id", "text"),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(2 + n % 2 AS BIGINT) AS n_records,
             |  CAST(n % 2 AS BIGINT) AS n_requests,
             |  CAST(n AS BIGINT) AS response_bytes,
             |  CAST(1 AS BIGINT) AS has_warcinfo,
             |  CAST(156 + n + length(CAST(doc_id AS VARCHAR))
             |       + length(CAST(n AS VARCHAR)) + 70 * (n % 2) AS BIGINT)
             |    AS total_bytes
             |FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // MM8 — tar (ustar) metadata round-trip: the ML shard container
    // (WebDataset ships training data as plain tar files). plantTar
    // writes REAL 512-block ustar archives (d<id>.txt with the text as
    // body; odd-n rows add a 20-byte .bin member so the walk length
    // varies; true octal sizes and VALID checksums), decodeTarMeta
    // walks blocks back VERIFYING each header checksum, and the oracle
    // recomputes member counts and the exact 512-rounded container
    // size from the text length. Same plant/parse/arithmetic-oracle
    // design as mm5/mm6/mm7.
    Q("mm8_tar_meta",
      (s, dir) => graft.operators.Multimodal.decodeTarMeta(
        graft.operators.Multimodal.plantTarPayload(
          t(s, dir, "documents"), "doc_id", "text"),
        "doc_id", "payload")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(1 + n % 2 AS BIGINT) AS n_members,
             |  CAST(n + 20 * (n % 2) AS BIGINT) AS payload_bytes,
             |  CAST(n AS BIGINT) AS txt_bytes,
             |  CAST(512 + ((n + 511) // 512) * 512 + (n % 2) * 1024 + 1024
             |    AS BIGINT) AS total_bytes
             |FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // MM9 — WebDataset member pairing: the member-grain tar decode with
    // the (key, role) split WebDataset samples group by — key = basename
    // before the extension, role = extension. The planted archives put
    // the text under d<id>.txt and (odd n) a binary sibling under the
    // SAME key d<id>.bin, so the oracle reconstructs every member row —
    // names, keys, roles, sizes, order — from doc_id and text length.
    Q("mm9_webdataset_members",
      (s, dir) => graft.operators.Multimodal.decodeTarMembers(
        graft.operators.Multimodal.plantTarPayload(
          t(s, dir, "documents"), "doc_id", "text"),
        "doc_id", "payload")
        .orderBy("doc_id", "member_idx"),
      Some("""SELECT doc_id, member_idx, name, key, role, size FROM (
             |  SELECT doc_id, CAST(1 AS BIGINT) AS member_idx,
             |    'd' || CAST(doc_id AS VARCHAR) || '.txt' AS name,
             |    'd' || CAST(doc_id AS VARCHAR) AS key, 'txt' AS role,
             |    CAST(n AS BIGINT) AS size
             |  FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
             |  UNION ALL
             |  SELECT doc_id, CAST(2 AS BIGINT),
             |    'd' || CAST(doc_id AS VARCHAR) || '.bin',
             |    'd' || CAST(doc_id AS VARCHAR), 'bin', CAST(20 AS BIGINT)
             |  FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
             |  WHERE n % 2 = 1)
             |ORDER BY doc_id, member_idx""".stripMargin)),

    // RF34 — container-walk differential fuzz: bodies of EVERY length
    // 0..600 (hex text from repeated md5s — the sweep crosses the tar
    // 512-block boundaries at 511/512/513 and the n=0 empty-member
    // edge) planted into BOTH containers and walked back; the oracle
    // recomputes all five outputs from pure length arithmetic over the
    // SAME generate_series strings. An off-by-one in block rounding,
    // header size, digit-count accounting, or the odd-n member rule
    // shows up as a row mismatch at the exact boundary length.
    Q("rf34_container_fuzz",
      (s, dir) => {
        val gen = s.range(0, 601).select(col("id").as("sid"),
          repeat(md5(concat(lit("T:"), col("id").cast(StringType))), 20)
            .substr(lit(1), col("id").cast(IntegerType)).as("text"))
        val tar = graft.operators.Multimodal.decodeTarMeta(
          graft.operators.Multimodal.plantTarPayload(gen, "sid", "text"),
          "doc_id", "payload")
          .select(col("doc_id").as("sid"), col("n_members"),
            col("payload_bytes"), col("total_bytes").as("tar_bytes"))
        val warc = graft.operators.Multimodal.decodeWarcMeta(
          graft.operators.Multimodal.plantWarcPayload(gen, "sid", "text"),
          "doc_id", "payload")
          .select(col("doc_id").as("sid"), col("n_records"),
            col("total_bytes").as("warc_bytes"))
        tar.join(warc, Seq("sid")).orderBy("sid")
      },
      Some("""SELECT i AS sid,
             |  CAST(1 + n % 2 AS BIGINT) AS n_members,
             |  CAST(n + 20 * (n % 2) AS BIGINT) AS payload_bytes,
             |  CAST(512 + ((n + 511) // 512) * 512 + (n % 2) * 1024 + 1024
             |    AS BIGINT) AS tar_bytes,
             |  CAST(2 + n % 2 AS BIGINT) AS n_records,
             |  CAST(156 + n + length(CAST(i AS VARCHAR))
             |       + length(CAST(n AS VARCHAR)) + 70 * (n % 2) AS BIGINT)
             |    AS warc_bytes
             |FROM (SELECT i, octet_length(encode(
             |        substr(repeat(md5('T:'||CAST(i AS VARCHAR)), 20), 1,
             |          CAST(i AS INT)))) AS n
             |      FROM generate_series(0, 600) _g(i))
             |ORDER BY sid""".stripMargin)),

    // CUR6 — curation v3: EXACT near-dup removal through the prefix-
    // filtered set-similarity join (Jaccard >= 9/10 on word sets),
    // greedy earliest-id-wins (drop any doc similar to an earlier one),
    // then per-source survivors and token budget. Complements cur5's
    // span-exact dedup with whole-doc approximate-content dedup that is
    // still lossless (sj1 semantics) — the Spark side never forms the
    // all-pairs compare the oracle spells.
    Q("cur6_neardup_curation",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          graft.operators.Corpus.words(col("text")).as("toks"))
        val pairs = graft.operators.SetSimJoin
          .jaccardSelfJoin(toks, "doc_id", "toks", tNum = 9, tDen = 10)
        val dropped = pairs.select(col("idb").as("doc_id")).distinct()
        docs.join(dropped, Seq("doc_id"), "left_anti")
          .groupBy("source")
          .agg(count(lit(1)).as("kept_docs"),
            sum(graft.operators.TextAnalysis.tokenCount(col("text")))
              .as("kept_tokens"))
          .orderBy(asc_nulls_first("source"))
      },
      Some("""WITH s AS (SELECT doc_id,
             |  list_distinct(string_split(trim(regexp_replace(text,'\s+',' ','g')),' ')) AS toks
             |  FROM documents),
             |dropped AS (
             |  SELECT DISTINCT b.doc_id FROM s a JOIN s b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.toks, b.toks)) * 10
             |        >= (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) * 9)
             |SELECT source, count(*) AS kept_docs,
             |  CAST(SUM(CASE WHEN nrm = '' THEN 0
             |    ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END) AS BIGINT) AS kept_tokens
             |FROM (SELECT doc_id, source,
             |        trim(regexp_replace(text, '\s+', ' ', 'g')) AS nrm
             |      FROM documents) d
             |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
             |GROUP BY source ORDER BY source NULLS FIRST""".stripMargin)),

    // RF27 — fuzzy-join differential fuzz, 5-seed matrix like rf1-rf26:
    // per seed, 400 left / 300 right hex strings of length 3-5 (4096
    // length-3 combos, so distance-<=1 collisions are dense), blocked
    // join vs the oracle's all-pairs levenshtein over the IDENTICAL
    // generate_series-derived strings. Instance seedoff=500 is the
    // DEGENERATE-KEY case: every string is '' or a shared boilerplate
    // token, so all rows land in two neighborhood buckets — under the
    // default maxBucket nothing is dropped (the dense pair set IS the
    // true result) and the plan must still be the blocked equi-join.
    Q("rf27_fuzzy_join_fuzz",
      (s, dir) => {
        val insts = Seq(0L, 100L, 200L, 300L, 400L).map { off =>
          def side(n: Int, salt: String, id: String, str: String) =
            s.range(1, n + 1).select(col("id").as(id),
              md5(concat(lit(s"$salt$off:"), col("id").cast(StringType)))
                .substr(lit(1), lit(3) + pmod(col("id"), lit(3))).as(str))
          FuzzyJoin.join(
            side(400, "F", "lid", "ls"), "lid", "ls",
            side(300, "G", "rid", "rs"), "rid", "rs")
            .withColumn("seedoff", lit(off))
        }
        def degSide(n: Int, id: String, str: String) =
          s.range(1, n + 1).select(col("id").as(id),
            when(col("id") % 2 === 0, lit("")).otherwise(lit("qq")).as(str))
        val deg = FuzzyJoin.join(
          degSide(400, "lid", "ls"), "lid", "ls",
          degSide(300, "rid", "rs"), "rid", "rs")
          .withColumn("seedoff", lit(500L))
        (insts :+ deg).reduce(_.unionByName(_))
          .orderBy("seedoff", "lid", "rid")
      },
      Some {
        val union = Seq(0L, 100L, 200L, 300L, 400L).map { off =>
          s"""SELECT CAST($off AS BIGINT) AS seedoff, lid, ls, rid, rs,
             |  CAST(levenshtein(ls, rs) AS INTEGER) AS dist
             |FROM (SELECT i AS lid, substr(md5('F$off:'||CAST(i AS VARCHAR)),1,3+i%3) AS ls
             |      FROM generate_series(1,400) _l(i)) l,
             |     (SELECT j AS rid, substr(md5('G$off:'||CAST(j AS VARCHAR)),1,3+j%3) AS rs
             |      FROM generate_series(1,300) _r(j)) r
             |WHERE levenshtein(ls, rs) <= 1""".stripMargin
        }.mkString("\nUNION ALL\n") +
          """
            |UNION ALL
            |SELECT CAST(500 AS BIGINT) AS seedoff, lid, ls, rid, rs,
            |  CAST(levenshtein(ls, rs) AS INTEGER) AS dist
            |FROM (SELECT i AS lid, CASE WHEN i%2=0 THEN '' ELSE 'qq' END AS ls
            |      FROM generate_series(1,400) _l(i)) l,
            |     (SELECT j AS rid, CASE WHEN j%2=0 THEN '' ELSE 'qq' END AS rs
            |      FROM generate_series(1,300) _r(j)) r
            |WHERE levenshtein(ls, rs) <= 1""".stripMargin
        s"SELECT * FROM (\n$union\n) ORDER BY seedoff, lid, rid"
      }),

    // RF29 — incremental-CC differential fuzz, 5-seed matrix: per seed,
    // 250 md5-derived random edges over 200 nodes; the FIRST 150 are the
    // standing corpus (clustered with log-star), the LAST 100 arrive as
    // the batch and merge via incrementalComponents. The oracle computes
    // reachability over ALL 250 edges — so the row gates the
    // incremental == full-recompute identity on graphs with bridges,
    // new nodes, and multi-edges, not just the corpus fixture.
    Q("rf29_inccc_fuzz",
      (s, dir) => {
        val insts = Seq(0L, 100L, 200L, 300L, 400L).map { off =>
          def h(salt: String) = expr(
            s"CAST(conv(substring(md5(concat('$salt$off:', CAST(id AS STRING))), 1, 4), 16, 10) AS BIGINT) % 200")
          val e = s.range(1, 251)
            .select(col("id").as("i"), h("A").as("ida"), h("B").as("idb"))
            .filter(col("ida") =!= col("idb"))
          val base = e.filter(col("i") <= 150).select("ida", "idb")
          val batch = e.filter(col("i") > 150).select("ida", "idb")
          graft.operators.Dedup.incrementalComponents(
              graft.operators.Dedup.connectedComponentsLogStar(base), batch)
            .withColumn("seedoff", lit(off))
        }
        insts.reduce(_.unionByName(_))
          .select(col("seedoff"), col("id"), col("cluster"))
          .orderBy("seedoff", "id")
      },
      Some {
        def hSql(salt: String, off: Long) =
          s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
             | list_transform(str_split(substring(md5('$salt$off:'||CAST(i AS VARCHAR)), 1, 4), ''),
             |  h -> CAST(strpos('0123456789abcdef', h) - 1 AS BIGINT))),
             | (a, x) -> a * 16 + x) % 200""".stripMargin
        val per = Seq(0L, 100L, 200L, 300L, 400L).map { off =>
          s"""(WITH RECURSIVE e AS (
             |  SELECT a, b FROM (
             |   SELECT ${hSql("A", off)} AS a, ${hSql("B", off)} AS b
             |   FROM generate_series(1, 250) _g(i)) WHERE a <> b),
             |ee AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
             |nodes AS (SELECT a AS id FROM ee GROUP BY 1),
             |reach(id, label) AS (
             | SELECT id, id FROM nodes
             | UNION
             | SELECT ee.a, r.label FROM ee JOIN reach r ON r.id = ee.b)
             |SELECT CAST($off AS BIGINT) AS seedoff, id, MIN(label) AS cluster
             |FROM reach GROUP BY 1, 2)""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"SELECT * FROM (\n$per\n) ORDER BY seedoff, id"
      })
  )
}
