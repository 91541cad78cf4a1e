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
      (s, dir) => {
        val edges = coocEdges(t(s, dir, "documents")).localCheckpoint()
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        val ed = edges.join(deg, "src").localCheckpoint()
        var rank = deg.select(col("src").as("node"),
          lit(1000000L).as("rank_micro"))
        for (_ <- 1 to 5) {
          rank = ed
            .join(rank.withColumnRenamed("node", "src"), Seq("src"))
            .select(col("dst").as("node"), expr("rank_micro div deg").as("c"))
            .groupBy("node")
            .agg(expr("CAST(150000 + (850 * sum(c)) div 1000 AS BIGINT)")
              .as("rank_micro"))
            .localCheckpoint()
        }
        rank.select(col("node").as("word"), col("rank_micro"))
          .orderBy(col("rank_micro").desc, col("word"))
      },
      Some(pagerankOracleSql(5))))
}
