package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ProtoPrune, Similarity}
import graft.sources.Tables

/** Embedding-space curation operators: prototype-based cluster pruning
  * (the SSL-prototypes / D4 recipe — Sorscher et al. 2022 "Beyond neural
  * scaling laws", Tirumala et al. 2023 "D4") and Johnson–Lindenstrauss
  * sign random projection (Achlioptas 2003) with a measured distortion
  * audit.
  *
  * Everything runs in integer micro fixed point (floor of 1e6 times the
  * float-widened-to-double component — floor, not round, so there is no
  * half-way tie to disagree on) over md5-derived signs, so the DuckDB
  * oracle replays each pipeline bit-for-bit.
  *
  * Ref: the reference (slide/utils.py) has no embedding surface; these
  * extend the selection family (imp, fe) per the north-star scope.
  */
object EmbedOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Integer micro embedding: FLOAT widened exactly to DOUBLE, scaled,
    * floored — both engines do the identical IEEE multiply and floor
    * ([[graft.operators.ProtoPrune.micro]] is the shared definition).
    */
  private val microVec = ProtoPrune.micro

  def all: Seq[Q] = Seq(

    // IMP7 — prototype pruning (SSL-prototypes, Sorscher 2022; the
    // second half of the D4 pipeline after dd11's SemDeDup): within each
    // cluster, the docs CLOSEST to the cluster centroid are the most
    // prototypical — the easy, redundant examples — and pruning them
    // beats random subsampling when data is abundant. Drop the closest
    // quarter (rank by squared L2 to the integer centroid, ties by
    // vec_id), keep the rest.
    //
    // Scale shape: one explode to component grain (linear, 64x), one
    // (cl, j) aggregate for the centroids (bounded: clusters x dim
    // rows, broadcast back), one vec-grain aggregate for distances, and
    // a rank window PER CLUSTER — partitions are cluster-sized, the
    // same bound SemDeDup already lives with; nothing is all-pairs.
    Q("imp7_prototype_prune",
      (s, dir) => ProtoPrune.pruneSelf(t(s, dir, "embeddings"))
        .orderBy("vec_id"),
      Some("""WITH m AS (SELECT vec_id,
             |    (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
             |    +CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
             |    +CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
             |    +CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END) AS cl,
             |    list_transform(embedding,
             |      x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS mv
             |  FROM embeddings),
             |e AS (SELECT vec_id, cl, i AS j, mv[i] AS v
             |  FROM m, LATERAL (SELECT unnest(generate_series(1, len(mv))) AS i) _t),
             |c AS (SELECT cl, j, CAST(CAST(sum(v) AS BIGINT) // count(*) AS BIGINT) AS cj
             |  FROM e GROUP BY 1, 2),
             |d AS (SELECT e.vec_id, e.cl,
             |    CAST(sum((e.v - c.cj) * (e.v - c.cj)) AS BIGINT) AS dist2
             |  FROM e JOIN c ON c.cl = e.cl AND c.j = e.j GROUP BY 1, 2),
             |r AS (SELECT vec_id, cl, dist2,
             |   ROW_NUMBER() OVER (PARTITION BY cl ORDER BY dist2, vec_id) AS rk,
             |   COUNT(*) OVER (PARTITION BY cl) AS n FROM d)
             |SELECT vec_id, CAST(cl AS BIGINT) AS cl, dist2,
             |  CAST(CASE WHEN rk <= n // 4 THEN 0 ELSE 1 END AS BIGINT) AS kept
             |FROM r ORDER BY vec_id""".stripMargin)),

    // FE7 — sign random projection (Achlioptas 2003's database-friendly
    // JL transform): project 64-dim embeddings to 8 dims with a
    // deterministic ±1 matrix drawn from md5 nibbles, then AUDIT the
    // distortion the way the JL lemma promises: for sampled neighbor
    // pairs, est2 = (squared L2 in projected space) div k is an
    // unbiased estimate of the original squared L2 (cross terms cancel
    // in expectation for iid signs). Emitted per pair: original dist2,
    // est2, and their ratio in permille — the measured operating point
    // for running ANN on 8x-smaller vectors.
    //
    // Scale shape: the sign matrix is a CONSTANT 64x8 = 512-row frame
    // (structurally bounded, broadcast); projection is one explode +
    // one (vec, k) aggregate; the pair sample is id-keyed (consecutive
    // ids, every 10th), so both pair joins are equi-joins on vec_id —
    // linear end to end.
    Q("fe7_random_projection",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .filter(col("vec_id") % 10 <= 1)
        val e = emb.select(col("vec_id"), posexplode(microVec).as(Seq("j0", "v")))
          .withColumn("j", col("j0") + 1)
        val sg = s.range(1, 65).toDF("j")
          .crossJoin(s.range(0, 8).toDF("k"))
          .withColumn("sgn", expr(
            """IF(CAST(conv(substr(md5(concat('rp-', CAST(j AS STRING),
              |'-', CAST(k AS STRING))), 1, 1), 16, 10) AS BIGINT) % 2 = 0,
              |1L, -1L)""".stripMargin.replace("\n", " ")))
        val p = e.join(broadcast(sg), Seq("j"))
          .groupBy("vec_id", "k").agg(sum(col("v") * col("sgn")).as("p"))
        val pd = p.as("a")
          .join(p.as("b"),
            col("b.vec_id") === col("a.vec_id") + 1 &&
              col("a.vec_id") % 10 === 0 && col("a.k") === col("b.k"))
          .groupBy(col("a.vec_id").as("ida"))
          .agg(expr("sum((a.p - b.p) * (a.p - b.p)) div 8").as("est2"))
        val od = e.as("a")
          .join(e.as("b"),
            col("b.vec_id") === col("a.vec_id") + 1 &&
              col("a.vec_id") % 10 === 0 && col("a.j") === col("b.j"))
          .groupBy(col("a.vec_id").as("ida"))
          .agg(expr("sum((a.v - b.v) * (a.v - b.v))").as("dist2"))
        od.join(pd, Seq("ida"))
          .filter(col("dist2") > 0)
          .select(col("ida"), col("dist2"), col("est2"),
            expr("est2 * 1000 div dist2").as("ratio_pm"))
          .orderBy("ida")
      },
      Some("""WITH m AS (SELECT vec_id,
             |    list_transform(embedding,
             |      x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS mv
             |  FROM embeddings WHERE vec_id % 10 <= 1),
             |e AS (SELECT vec_id, i AS j, mv[i] AS v
             |  FROM m, LATERAL (SELECT unnest(generate_series(1, len(mv))) AS i) _t),
             |sg AS (SELECT j, k,
             |    CASE WHEN CAST(('0x'||substr(md5('rp-'||j||'-'||k),1,1)) AS UBIGINT)
             |      % 2 = 0 THEN 1 ELSE -1 END AS s
             |  FROM generate_series(1,64) _a(j), generate_series(0,7) _b(k)),
             |p AS (SELECT e.vec_id, sg.k, CAST(sum(e.v * sg.s) AS BIGINT) AS p
             |  FROM e JOIN sg ON sg.j = e.j GROUP BY 1, 2),
             |pd AS (SELECT a.vec_id AS ida,
             |    CAST(sum((a.p - b.p) * (a.p - b.p)) // 8 AS BIGINT) AS est2
             |  FROM p a JOIN p b ON b.vec_id = a.vec_id + 1
             |    AND a.vec_id % 10 = 0 AND a.k = b.k
             |  GROUP BY 1),
             |od AS (SELECT a.vec_id AS ida,
             |    CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS dist2
             |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
             |    AND a.vec_id % 10 = 0 AND a.j = b.j
             |  GROUP BY 1)
             |SELECT od.ida, od.dist2, pd.est2,
             |  CAST(pd.est2 * 1000 // od.dist2 AS BIGINT) AS ratio_pm
             |FROM od JOIN pd ON pd.ida = od.ida
             |WHERE od.dist2 > 0
             |ORDER BY od.ida""".stripMargin)),

    // DD20 — the full D4 pipeline (Tirumala et al. 2023): SemDeDup first
    // (dd11's rule — drop docs with a lower-id same-cluster neighbor at
    // cosine >= 0.4), then prototype pruning on the SURVIVORS (imp7's
    // rule — drop the quarter closest to each cluster's centroid,
    // centroids computed over survivors, where D4 recomputes clusters
    // after dedup). Output is the per-cluster funnel: raw -> after
    // semdedup -> after prune, the accounting a curation run reports.
    //
    // Scale shape: semdedup is the cluster-key anti-join (pairwise work
    // bounded by cluster size), the prune is imp7's explode + bounded
    // centroid frame + per-cluster rank window; the funnel rollup is a
    // 3-frame join at CLUSTER grain (16 rows here, centroid-catalog
    // sized in production).
    Q("dd20_d4_pipeline",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cl4 = Similarity.signCluster(col("embedding"), 4)
        val raw = emb.select(cl4.as("cl"))
          .groupBy("cl").agg(count(lit(1)).as("n_raw"))
        val surv = Similarity.semDedup(emb, "embedding", "vec_id", cl4, tau = 0.4)
        val kept = ProtoPrune.pruneSelf(surv).groupBy("cl")
          .agg(count(lit(1)).as("n_semdedup"), sum("kept").as("n_kept"))
        raw.join(kept, Seq("cl"), "left")
          .select(col("cl").cast("long").as("cl"), col("n_raw"),
            coalesce(col("n_semdedup"), lit(0L)).as("n_semdedup"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
          .orderBy("cl")
      },
      Some("""WITH m AS (SELECT vec_id,
             |    (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
             |    +CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
             |    +CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
             |    +CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END) AS cl,
             |    embedding,
             |    list_transform(embedding,
             |      x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS mv
             |  FROM embeddings),
             |surv AS (SELECT a.vec_id, a.cl, a.mv FROM m a WHERE NOT EXISTS (
             |  SELECT 1 FROM m b WHERE b.cl = a.cl AND b.vec_id < a.vec_id
             |    AND list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
             |      CAST(a.embedding AS DOUBLE[])) >= 0.4)),
             |e AS (SELECT vec_id, cl, i AS j, mv[i] AS v
             |  FROM surv, LATERAL (SELECT unnest(generate_series(1, len(mv))) AS i) _t),
             |c AS (SELECT cl, j, CAST(CAST(sum(v) AS BIGINT) // count(*) AS BIGINT) AS cj
             |  FROM e GROUP BY 1, 2),
             |d AS (SELECT e.vec_id, e.cl,
             |    CAST(sum((e.v - c.cj) * (e.v - c.cj)) AS BIGINT) AS dist2
             |  FROM e JOIN c ON c.cl = e.cl AND c.j = e.j GROUP BY 1, 2),
             |r AS (SELECT vec_id, cl, dist2,
             |   ROW_NUMBER() OVER (PARTITION BY cl ORDER BY dist2, vec_id) AS rk,
             |   COUNT(*) OVER (PARTITION BY cl) AS n FROM d),
             |raw AS (SELECT cl, count(*) AS n_raw FROM m GROUP BY 1)
             |SELECT CAST(raw.cl AS BIGINT) AS cl,
             |  CAST(raw.n_raw AS BIGINT) AS n_raw,
             |  CAST(count(r.vec_id) AS BIGINT) AS n_semdedup,
             |  CAST(COALESCE(sum(CASE WHEN r.rk > r.n // 4 THEN 1 ELSE 0 END), 0)
             |    AS BIGINT) AS n_kept
             |FROM raw LEFT JOIN r ON r.cl = raw.cl
             |GROUP BY raw.cl, raw.n_raw
             |ORDER BY cl""".stripMargin)),

    // RF32 — ProtoPrune differential fuzz: 5 seed-offset instances of
    // 160 constructed 8-dim vectors whose components are EXACT binary
    // fractions ((md5-derived k in -16..15) / 32 — float-representable,
    // so the micro integerization has no rounding edge to disagree on),
    // pruned by the shared kernel and replayed CTE-for-CTE by the
    // oracle. The rf-matrix discipline (rf27-rf31) for the embedding
    // family: sf-independent generated data, full output compared.
    Q("rf32_protoprune_fuzz",
      (s, dir) => {
        val insts = Seq(0L, 100L, 200L, 300L, 400L).map { off =>
          val emb = s.range(1, 161).select(
            col("id").as("vec_id"),
            expr(s"""transform(sequence(1, 8), j -> CAST(
                     (CAST(conv(substring(md5(concat('V$off:',
                        CAST(id AS STRING), ':', CAST(j AS STRING))), 1, 2),
                       16, 10) AS BIGINT) % 32 - 16) / 32.0
                     AS FLOAT))""").as("embedding"))
          ProtoPrune.pruneSelf(emb)
            .select(lit(off).as("seedoff"), col("vec_id"), col("cl"),
              col("dist2"), col("kept"))
        }
        insts.reduce(_.unionByName(_)).orderBy("seedoff", "vec_id")
      },
      Some {
        def chain(off: Long, x: String): String =
          s"""emb$x AS (SELECT i AS vec_id,
             |    list(CAST((CAST(CAST(('0x'||substr(md5('V$off:'||CAST(i AS VARCHAR)||':'||CAST(j AS VARCHAR)),1,2)) AS UBIGINT) AS BIGINT) % 32 - 16) / 32.0 AS FLOAT)
             |      ORDER BY j) AS embedding
             |  FROM generate_series(1, 160) _i(i),
             |    LATERAL (SELECT unnest(generate_series(1, 8)) AS j) _j
             |  GROUP BY 1),
             |m$x AS (SELECT vec_id,
             |    (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
             |    +CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
             |    +CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
             |    +CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END) AS cl,
             |    list_transform(embedding,
             |      x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS mv
             |  FROM emb$x),
             |e$x AS (SELECT vec_id, cl, i AS j, mv[i] AS v
             |  FROM m$x, LATERAL (SELECT unnest(generate_series(1, len(mv))) AS i) _t),
             |c$x AS (SELECT cl, j, CAST(CAST(sum(v) AS BIGINT) // count(*) AS BIGINT) AS cj
             |  FROM e$x GROUP BY 1, 2),
             |d$x AS (SELECT e$x.vec_id, e$x.cl,
             |    CAST(sum((e$x.v - c$x.cj) * (e$x.v - c$x.cj)) AS BIGINT) AS dist2
             |  FROM e$x JOIN c$x ON c$x.cl = e$x.cl AND c$x.j = e$x.j GROUP BY 1, 2),
             |r$x AS (SELECT vec_id, cl, dist2,
             |   ROW_NUMBER() OVER (PARTITION BY cl ORDER BY dist2, vec_id) AS rk,
             |   COUNT(*) OVER (PARTITION BY cl) AS n FROM d$x)""".stripMargin
        val offs = Seq(0L, 100L, 200L, 300L, 400L)
        val withs = offs.zipWithIndex
          .map { case (off, i) => chain(off, s"_$i") }.mkString(",\n")
        val union = offs.zipWithIndex.map { case (off, i) =>
          s"""SELECT CAST($off AS BIGINT) AS seedoff, vec_id,
             |  CAST(cl AS BIGINT) AS cl, dist2,
             |  CAST(CASE WHEN rk <= n // 4 THEN 0 ELSE 1 END AS BIGINT) AS kept
             |FROM r_$i""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"WITH $withs\nSELECT * FROM (\n$union\n) ORDER BY seedoff, vec_id"
      }),

    // DQ6 — embedding-table quality audit (the dq2/dq4 shape for the
    // vector column): per arm, vectors whose integer micro norm-squared
    // is zero, far below or far above the unit band, or whose
    // dimensionality is wrong — the four ways an encoder batch job
    // corrupts a 100 TB embedding table (dead inputs, double-scaled
    // outputs, truncated writes). Three PLANTED defect arms (the dq4
    // planted-deletion discipline) prove each check demonstrably fires;
    // the corpus arm is the release gate that should read all zeros.
    // One scan of the pool, no shuffle past the 4-row rollup.
    Q("dq6_embedding_quality",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val pool = emb
          .select(lit("corpus").as("arm"), col("vec_id"), col("embedding"))
          .unionAll(emb.filter(col("vec_id") % 97 === 0)
            .select(lit("planted_zero").as("arm"),
              (col("vec_id") + 1000000L).as("vec_id"),
              transform(col("embedding"), _ => lit(0f)).as("embedding")))
          .unionAll(emb.filter(col("vec_id") % 89 === 1)
            .select(lit("planted_scale").as("arm"),
              (col("vec_id") + 2000000L).as("vec_id"),
              transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
          .unionAll(emb.filter(col("vec_id") % 83 === 2)
            .select(lit("planted_dim").as("arm"),
              (col("vec_id") + 3000000L).as("vec_id"),
              slice(col("embedding"), 1, 32).as("embedding")))
        pool
          .select(col("arm"), size(col("embedding")).as("dim"),
            expr("""aggregate(transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
              0L, (a, v) -> a + v * v)""").as("norm2"))
          .groupBy("arm")
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("norm2") === 0L, 1L).otherwise(0L)).as("n_zero"),
            sum(when(col("norm2") > 0L && col("norm2") < 900000000000L, 1L)
              .otherwise(0L)).as("n_low"),
            sum(when(col("norm2") > 1100000000000L, 1L).otherwise(0L)).as("n_high"),
            sum(when(col("dim") =!= 64, 1L).otherwise(0L)).as("n_dim"),
            min(col("norm2")).as("min_norm2"),
            max(col("norm2")).as("max_norm2"))
          .orderBy("arm")
      },
      Some("""WITH pool AS (
             |  SELECT 'corpus' AS arm, vec_id, embedding FROM embeddings
             |  UNION ALL
             |  SELECT 'planted_zero', vec_id + 1000000,
             |    list_transform(embedding, x -> CAST(0 AS FLOAT))
             |  FROM embeddings WHERE vec_id % 97 = 0
             |  UNION ALL
             |  SELECT 'planted_scale', vec_id + 2000000,
             |    list_transform(embedding, x -> CAST(x * 2 AS FLOAT))
             |  FROM embeddings WHERE vec_id % 89 = 1
             |  UNION ALL
             |  SELECT 'planted_dim', vec_id + 3000000, embedding[1:32]
             |  FROM embeddings WHERE vec_id % 83 = 2),
             |n AS (SELECT arm, vec_id, len(embedding) AS dim,
             |    CAST(list_sum(list_transform(
             |      list_transform(embedding,
             |        x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)),
             |      v -> v*v)) AS BIGINT) AS norm2
             |  FROM pool)
             |SELECT arm, CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST(sum(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
             |  CAST(sum(CASE WHEN norm2 > 0 AND norm2 < 900000000000 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_low,
             |  CAST(sum(CASE WHEN norm2 > 1100000000000 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_high,
             |  CAST(sum(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_dim,
             |  CAST(min(norm2) AS BIGINT) AS min_norm2,
             |  CAST(max(norm2) AS BIGINT) AS max_norm2
             |FROM n GROUP BY 1 ORDER BY arm""".stripMargin)))
}
