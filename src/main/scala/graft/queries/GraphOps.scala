package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Corpus
import graft.sources.Tables

/** Graph-centrality queries over the word co-occurrence graph: the
  * quality signals a web-scale curation pipeline derives from link
  * structure (PageRank-family centrality is the classic Common-Crawl
  * document-quality prior). All arithmetic is integer fixed-point
  * (micro units) with truncating division, so the iterative ranks are
  * bit-identical between Spark (`div`) and the DuckDB oracle (`//`) —
  * no float summation order anywhere.
  *
  * Ref: the reference (slide/utils.py) has no graph operators; these
  * extend the mining family (gr1/gr2 in MiningOps) per the north-star
  * scope.
  */
object GraphOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Undirected co-occurrence edge list (both directions materialized,
    * so every node has out-degree >= 1 and the random-walk loses no
    * dangling mass). Vocabulary-grain: the corpus reduces to this in
    * one scan + one distinct.
    */
  private def coocEdges(docs: DataFrame): DataFrame = {
    val bi = docs
      .select(explode(Corpus.shingles(col("text"), 2)).as("g"))
      .select(split(col("g"), " ").getItem(0).as("x"),
        split(col("g"), " ").getItem(1).as("y"))
      .filter(col("x") =!= col("y"))
    bi.select(col("x").as("src"), col("y").as("dst"))
      .unionAll(bi.select(col("y").as("src"), col("x").as("dst")))
      .distinct()
  }

  /** Shared DuckDB prelude: ws/bi/e/deg CTE chain (mirrors coocEdges). */
  private val edgePrelude: String =
    s"""ws AS (SELECT string_split(trim(regexp_replace(text,'\\s+',' ','g')),' ') AS w
       |       FROM documents),
       |bi AS (SELECT w[i] AS x, w[i+1] AS y FROM ws,
       |       LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) _t
       |       WHERE w[i] <> w[i+1]),
       |e AS (SELECT x AS src, y AS dst FROM bi
       |      UNION SELECT y AS src, x AS dst FROM bi),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1)""".stripMargin

  /** The gr3 power-iteration kernel over an arbitrary `edges(src, dst)`
    * list, public so PlanQualitySpec can assert the per-iteration
    * localCheckpoint barrier holds at 50 iterations (flat logical plan —
    * replacing the checkpoint with cache() grows the plan ~3× per round
    * and OOMs the optimizer near 15; see the ccLogStar lesson).
    */
  def pagerankRanks(edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = edges.join(deg, "src").localCheckpoint()
    var rank = deg.select(col("src").as("node"),
      lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      rank = ed
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("rank_micro div deg").as("c"))
        .groupBy("node")
        .agg(expr("CAST(150000 + (850 * sum(c)) div 1000 AS BIGINT)")
          .as("rank_micro"))
        .localCheckpoint()
    }
    rank
  }

  private def pagerankOracleSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
         |  CAST(150000 + (850 * CAST(sum(r.rank_micro // d.deg) AS BIGINT)) // 1000
         |       AS BIGINT) AS rank_micro
         | FROM e JOIN r${i - 1} r ON r.node = e.src
         |        JOIN deg d ON d.src = e.src
         | GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgePrelude,
       |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank_micro FROM deg),
       |$steps
       |SELECT node AS word, rank_micro FROM r$iters
       |ORDER BY rank_micro DESC, word""".stripMargin
  }

  /** Directed bigram edge list (x precedes y somewhere in the corpus). */
  private val dirPrelude: String =
    s"""ws AS (SELECT string_split(trim(regexp_replace(text,'\\s+',' ','g')),' ') AS w
       |       FROM documents),
       |bi AS (SELECT w[i] AS x, w[i+1] AS y FROM ws,
       |       LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) _t
       |       WHERE w[i] <> w[i+1]),
       |d AS (SELECT DISTINCT x AS src, y AS dst FROM bi)""".stripMargin

  private def hitsOracleSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""h$i AS (SELECT d.src AS node,
         |  CAST(sum(a.auth) AS BIGINT) AS hub
         | FROM d JOIN a${i - 1} a ON a.node = d.dst GROUP BY 1),
         |hn$i AS (SELECT node,
         |  hub * 1000000 // (SELECT max(hub) FROM h$i) AS hub FROM h$i),
         |a$i AS (SELECT d.dst AS node,
         |  CAST(sum(h.hub) AS BIGINT) AS auth
         | FROM d JOIN hn$i h ON h.node = d.src GROUP BY 1),
         |an$i AS (SELECT node,
         |  auth * 1000000 // (SELECT max(auth) FROM a$i) AS auth FROM a$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH $dirPrelude,
       |nodes AS (SELECT src AS node FROM d UNION SELECT dst FROM d),
       |a0 AS (SELECT node, CAST(1000000 AS BIGINT) AS auth FROM nodes),
       |$steps
       |SELECT n.node AS word,
       |       COALESCE(a.auth, 0) AS auth_micro,
       |       COALESCE(h.hub, 0) AS hub_micro
       |FROM nodes n
       |LEFT JOIN an$iters a ON a.node = n.node
       |LEFT JOIN hn$iters h ON h.node = n.node
       |ORDER BY auth_micro DESC, hub_micro DESC, word""".stripMargin
  }

  /** gr7's oracle: replay the personalized recurrence — teleport mass
    * only on the src0 seed vocabulary, contributions damped 850/1000
    * with truncating division, zero-rank rows retained until output.
    */
  private def pprOracleSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT t.node,
         |  CAST(150000 * t.tele + (850 * COALESCE(c.s, 0)) // 1000 AS BIGINT) AS rank_micro
         | FROM tele t LEFT JOIN (
         |   SELECT e.dst AS node, CAST(sum(r.rank_micro // d.deg) AS BIGINT) AS s
         |   FROM e JOIN p${i - 1} r ON r.node = e.src
         |          JOIN deg d ON d.src = e.src
         |   GROUP BY 1) c ON c.node = t.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgePrelude,
       |sw AS (SELECT string_split(trim(regexp_replace(text,'\\s+',' ','g')),' ') AS w
       |       FROM documents WHERE source = 'src0' AND trim(text) <> ''),
       |seeds AS (SELECT DISTINCT wd FROM (SELECT unnest(w) AS wd FROM sw) _u
       |          WHERE wd <> ''),
       |tele AS (SELECT d.src AS node,
       |         CAST(CASE WHEN s.wd IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS tele
       |         FROM deg d LEFT JOIN seeds s ON s.wd = d.src),
       |p0 AS (SELECT node, CAST(1000000 * tele AS BIGINT) AS rank_micro FROM tele),
       |$steps
       |SELECT node AS word, rank_micro FROM p$iters
       |WHERE rank_micro > 0
       |ORDER BY rank_micro DESC, word""".stripMargin
  }

  private def kcoreOracleSql(k: Int, peels: Int): String = {
    val steps = (1 to peels).map { i =>
      s"""n$i AS (SELECT src AS node FROM deg$i WHERE deg >= $k),
         |deg${i + 1} AS (SELECT e.src, count(*) AS deg FROM e
         |  JOIN n$i a ON a.node = e.src JOIN n$i b ON b.node = e.dst
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgePrelude,
       |deg1 AS (SELECT src, deg FROM deg),
       |$steps
       |SELECT src AS word, deg FROM deg${peels + 1}
       |ORDER BY deg DESC, word""".stripMargin
  }

  private def bfsOracleSql(hops: Int): String = {
    val steps = (1 to hops).map { i =>
      s"""r$i AS (SELECT node, min(hop) AS hop FROM (
         |  SELECT e.dst AS node, r.hop + 1 AS hop
         |    FROM r${i - 1} r JOIN e ON e.src = r.node
         |  UNION ALL SELECT node, hop FROM r${i - 1}) _u GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgePrelude,
       |r0 AS (SELECT min(src) AS node, 0 AS hop FROM e),
       |$steps
       |SELECT node AS word, hop FROM r$hops ORDER BY hop, word""".stripMargin
  }

  def all: Seq[Q] = Seq(

    // GR3 — PageRank, 5 power iterations, damping 0.85, integer micro
    // fixed point: rank_{i+1}(u) = 0.15 + 0.85 * sum_{v~u} rank_i(v)/deg(v),
    // scaled by 1e6 with truncating division so both engines replay the
    // identical recurrence (contributions are `rank div deg`; the damped
    // sum is `(850 * sum) div 1000`). The undirected construction means
    // no dangling nodes, so mass bookkeeping needs no teleport-residual
    // term. Plan shape per iteration: one node-grain equi-join
    // (edge list x rank vector, both co-partitioned on src at scale) and
    // one node-grain aggregate; the edge list is materialized ONCE
    // (localCheckpoint) and re-read every iteration, and each rank
    // vector is checkpointed so lineage stays flat across iterations —
    // the same discipline as Dedup.ccLogStar, which is what keeps a
    // 50-iteration web-graph run from exponential plan growth. Per-node
    // sums are bounded by total mass (~N * 1e6), far inside int64.
    Q("gr3_pagerank",
      (s, dir) =>
        pagerankRanks(coocEdges(t(s, dir, "documents")).localCheckpoint(), 5)
          .select(col("node").as("word"), col("rank_micro"))
          .orderBy(col("rank_micro").desc, col("word")),
      Some(pagerankOracleSql(5))),

    // GR4 — HITS hubs & authorities (Kleinberg 1999), 3 power iterations
    // on the DIRECTED bigram graph, integer micro fixed point. Each half
    // step max-normalizes with truncating division (score * 1e6 div max)
    // so the recurrence never overflows and both engines replay it
    // bit-identically — the max is a 1-row aggregate broadcast into the
    // node-grain frame (structurally bounded, safe to hint). Per
    // iteration: two node-grain equi-joins + aggregates over the
    // vocabulary-grain edge list; lineage is flattened per half step via
    // localCheckpoint, same discipline as gr3.
    Q("gr4_hits",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bi = docs
          .select(explode(Corpus.shingles(col("text"), 2)).as("g"))
          .select(split(col("g"), " ").getItem(0).as("x"),
            split(col("g"), " ").getItem(1).as("y"))
          .filter(col("x") =!= col("y"))
        val d = bi.select(col("x").as("src"), col("y").as("dst"))
          .distinct().localCheckpoint()
        val nodes = d.select(col("src").as("node"))
          .union(d.select(col("dst").as("node"))).distinct().localCheckpoint()
        var auth = nodes.select(col("node"), lit(1000000L).as("auth"))
        var hub: org.apache.spark.sql.DataFrame = null
        for (_ <- 1 to 3) {
          val h = d.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
            .groupBy(col("src").as("node"))
            .agg(expr("CAST(sum(auth) AS BIGINT)").as("hub"))
          val hmax = h.agg(max(col("hub")).as("hmax"))
          hub = h.crossJoin(broadcast(hmax))
            .select(col("node"), expr("hub * 1000000 div hmax").as("hub"))
            .localCheckpoint()
          val a = d.join(hub.withColumnRenamed("node", "src"), Seq("src"))
            .groupBy(col("dst").as("node"))
            .agg(expr("CAST(sum(hub) AS BIGINT)").as("auth"))
          val amax = a.agg(max(col("auth")).as("amax"))
          auth = a.crossJoin(broadcast(amax))
            .select(col("node"), expr("auth * 1000000 div amax").as("auth"))
            .localCheckpoint()
        }
        nodes
          .join(auth, Seq("node"), "left")
          .join(hub, Seq("node"), "left")
          .select(col("node").as("word"),
            coalesce(col("auth"), lit(0L)).as("auth_micro"),
            coalesce(col("hub"), lit(0L)).as("hub_micro"))
          .orderBy(col("auth_micro").desc, col("hub_micro").desc, col("word"))
      },
      Some(hitsOracleSql(3))),

    // GR5 — k-core peeling (k=16, 5 rounds): repeatedly drop nodes whose
    // degree in the SURVIVING subgraph is < k; emit the round-5 degree
    // table. Each round is one edge-grain double semi-join + node-grain
    // aggregate (never all-pairs); the fixed round count makes the
    // result a deterministic prefix of the true k-core fixpoint that the
    // chained-CTE oracle replays exactly. At web scale the edge list is
    // the co-partitioned join input and survivors shrink monotonically.
    Q("gr5_kcore",
      (s, dir) => {
        val edges = coocEdges(t(s, dir, "documents")).localCheckpoint()
        var deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        for (_ <- 1 to 5) {
          val keep = deg.filter(col("deg") >= 16)
            .select(col("src").as("node")).localCheckpoint()
          deg = edges
            .join(keep.withColumnRenamed("node", "src"), Seq("src"), "semi")
            .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "semi")
            .groupBy("src").agg(count(lit(1)).as("deg"))
            .localCheckpoint()
        }
        deg.select(col("src").as("word"), col("deg"))
          .orderBy(col("deg").desc, col("word"))
      },
      Some(kcoreOracleSql(16, 5))),

    // GR6 — BFS hop distance from the lexicographically-first word, 4
    // frontier expansions as min-plus propagation: hop(u) =
    // min(hop(u), 1 + min over neighbors). Each round is one node-grain
    // join + union + min-aggregate; min() makes re-discovery idempotent
    // so no visited-set state is needed — the shape that scales to
    // billion-edge graphs (it is one Pregel superstep per round).
    Q("gr6_bfs_hops",
      (s, dir) => {
        val edges = coocEdges(t(s, dir, "documents")).localCheckpoint()
        var front = edges.agg(min(col("src")).as("node"))
          .withColumn("hop", lit(0))
        for (_ <- 1 to 4) {
          front = front.join(edges, front("node") === edges("src"))
            .select(col("dst").as("node"), (col("hop") + lit(1)).as("hop"))
            .unionAll(front)
            .groupBy("node").agg(min(col("hop")).as("hop"))
            .localCheckpoint()
        }
        front.select(col("node").as("word"), col("hop"))
          .orderBy(col("hop"), col("word"))
      },
      Some(bfsOracleSql(4))),

    // GR7 — PERSONALIZED PageRank (Haveliwala 2002, "Topic-Sensitive
    // PageRank"): the random walk teleports only to the target-domain
    // seed vocabulary (words of src0 documents) instead of uniformly, so
    // the stationary mass measures proximity to the domain — the graph
    // counterpart of imp1's bag-of-ngrams importance score, usable as a
    // curation prior for off-domain corpora. Same integer micro fixed
    // point and truncating recurrence as gr3; the teleport vector is a
    // node-grain frame joined once per iteration, zero-mass nodes kept
    // in the vector (they can re-gain mass through neighbors) and
    // dropped only at output. Scale shape: per iteration one
    // co-partitioned node-grain join + aggregate + one left join against
    // the checkpointed teleport frame; lineage flattened per round.
    Q("gr7_ppr_domain",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val edges = coocEdges(docs).localCheckpoint()
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        val ed = edges.join(deg, "src").localCheckpoint()
        val seeds = docs.filter(col("source") === "src0")
          .select(explode(Corpus.words(col("text"))).as("node")).distinct()
        val tele = deg.select(col("src").as("node"))
          .join(seeds.withColumn("t1", lit(1L)), Seq("node"), "left")
          .select(col("node"), coalesce(col("t1"), lit(0L)).as("tele"))
          .localCheckpoint()
        var rank = tele.select(col("node"),
          (col("tele") * lit(1000000L)).as("rank_micro"))
        for (_ <- 1 to 5) {
          val contrib = ed
            .join(rank.withColumnRenamed("node", "src"), Seq("src"))
            .select(col("dst").as("node"), expr("rank_micro div deg").as("c"))
            .groupBy("node").agg(sum(col("c")).as("s"))
          rank = tele.join(contrib, Seq("node"), "left")
            .select(col("node"),
              expr("CAST(150000 * tele + (850 * coalesce(s, 0)) div 1000 AS BIGINT)")
                .as("rank_micro"))
            .localCheckpoint()
        }
        rank.filter(col("rank_micro") > 0)
          .select(col("node").as("word"), col("rank_micro"))
          .orderBy(col("rank_micro").desc, col("word"))
      },
      Some(pprOracleSql(5))))
}
