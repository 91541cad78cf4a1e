package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** At-scale recall evidence for every pruned ANN operating point, run
  * against a ScaleUp replica:
  *
  *   Test/runMain graft.RecallAudit <replicaDir> <outJson>
  *
  * Audited paths: ss2's LSH (nbits=4/seed=42/probe=1), the
  * Lloyd-TRAINED IVF behind ss3 (k=8/iters=3/nprobe=6), the trained
  * IVF+PQ composition behind ss7 at its COMMITTED operating point
  * (same coarse quantizer; PQ 16×16 blocks — the round-13
  * ivfpq_min_path promoted in round 14 — with the headline rerank
  * derived as the cheapest depth whose per-query MIN ≥ 0.95; the full
  * (blocks × rerank) grid stays recorded in ivfpq_rerank_sweep /
  * ivfpq_blocks_sweep / ivfpq_min_path so the knee and the 8-block
  * plateau remain visible), and
  * ss8's filtered path (exact within
  * one label — recall must be exactly 1.0, so a partition/filter bug at
  * replica scale fails the gate loudly). Each is measured against the
  * exact brute-force twin on the same corpus. The registry rows
  * hash-gate deterministic twins at sf0.01; the trained operating
  * points' at-scale evidence lives here.
  *
  * The replica is itself the planted-near-neighbor construction: ScaleUp
  * copies every vector K times under offset ids, so each query's true
  * top-10 contains its K−1 EXACT duplicates (cosine 1.0) — any pruning
  * scheme that drops a bucket/cell loses planted hits immediately, which
  * makes the measurement strict (the ddf4 twin-planting idea applied
  * corpus-wide).
  *
  * Emits one JSON artifact (committed as RECALL_AUDIT_<scale>.json by
  * the round loop) and exits nonzero when mean recall@10 < 0.9 for
  * either index.
  */
object RecallAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx10")
    val outPath = if (args.length > 1) args(1) else "RECALL_AUDIT_10x.json"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.load(spark, dir, "embeddings").cache()
    val n = emb.count()
    val queryIds = Seq(0L, 7L, 42L, 99L, 123L)
    val queries = queryIds.map { id =>
      id -> emb.filter(col("vec_id") === id).select("embedding")
        .head().getSeq[Float](0).toArray
    }

    def topIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet

    val exact = queries.map { case (id, q) =>
      id -> topIds(Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= id), "embedding", "vec_id", q, 10))
    }.toMap

    // ss2's exact parameters (LlmData ss2_ann_lsh: lshTopK defaults)
    val lsh = queries.map { case (id, q) =>
      id -> (topIds(Similarity.lshTopK(emb.filter(col("vec_id") =!= id),
        "embedding", "vec_id", q, 10)).intersect(exact(id)).size / 10.0)
    }
    // the Lloyd-TRAINED IVF operating point (k=8, iters=3, nprobe=6):
    // the registry's ss3 row hash-gates its deterministic iters=0 twin;
    // trained centroids are ULP-order-dependent across engines, so their
    // at-scale recall evidence lives here instead
    val centroids = Similarity.trainIvfCentroids(emb, "embedding", "vec_id",
      k = 8, iters = 3)
    val ivf = queries.map { case (id, q) =>
      id -> (topIds(Similarity.ivfTopK(emb.filter(col("vec_id") =!= id),
        "embedding", "vec_id", q, 10, centroids, nprobe = 6))
        .intersect(exact(id)).size / 10.0)
    }
    // ss7's composition at TRAINED operating points: coarse-prune to
    // nprobe cells, ADC-order the survivors, exact-rerank the top R.
    // COMMITTED operating point (round 14, promoting the round-13
    // ivfpq_min_path finding): pqBlocks = 16 — 4 dims/block halves the
    // per-block ADC quantization error that kept two queries' recall at
    // 0.90 under 8 blocks until rerank=400 — with the headline rerank
    // derived as the cheapest depth whose per-query MIN clears the 0.95
    // margin target (min, not mean: the gate the round-12/13 findings
    // were about). Rerank cost is R exact cosines per query
    // (independent of corpus size), so margin bought by depth stays
    // cheap at any scale; the full (blocks × rerank) grid is still
    // recorded so the knee and the 8-block plateau remain visible.
    def ivfpqAt(cb: Array[Array[Array[Float]]],
        rerank: Int): Seq[(Long, Double)] = queries.map {
      case (id, q) =>
        val base = emb.filter(col("vec_id") =!= id)
        val cand = Similarity.ivfCandidates(base, "embedding", "vec_id",
          q, centroids, nprobe = 6)
        id -> (topIds(Similarity.pqTopK(cand, "embedding", "vec_id", q, 10,
          cb, rerank = rerank).select("vec_id"))
          .intersect(exact(id)).size / 10.0)
    }
    val ivfpqTarget = 0.95
    val reranks = Seq(20, 50, 100, 200, 400)
    val codebooks8 = Similarity.trainPqCodebooks(emb, "embedding", "vec_id",
      nBlocks = 8, k = 16, iters = 3)
    val sweep8 = reranks.map(rr => rr -> ivfpqAt(codebooks8, rr))
    val opBlocks = 16
    val cb16 = Similarity.trainPqCodebooks(emb, "embedding", "vec_id",
      nBlocks = opBlocks, k = 16, iters = 3)
    val sweep16 = reranks.map(rr => rr -> ivfpqAt(cb16, rr))
    // headline = cheapest rerank at the committed 16 blocks whose
    // per-query MIN clears the margin; mean-criterion fallback only if
    // no depth does (that would itself fail the pass gate below, loudly)
    val (opRerank, ivfpq) = sweep16
      .find { case (_, xs) => xs.map(_._2).min >= ivfpqTarget }
      .orElse(sweep16.find { case (_, xs) =>
        xs.map(_._2).sum / xs.size >= ivfpqTarget })
      .getOrElse(sweep16.last)
    val blocksSweep = Seq(8 -> sweep8, 16 -> sweep16)
    val minPoint = (for {
      rr <- reranks
      (nb, sweep) <- blocksSweep
      xs = sweep.find(_._1 == rr).get._2
      if xs.map(_._2).min >= ivfpqTarget
    } yield (rr, nb)).headOption
    // ss8's filtered path: exact within one label, so its gate is
    // EXACTLY 1.0 — measured as filter-before-rank (the pushed-filter
    // scan ss8 runs) vs rank-before-filter (score every row, then
    // restrict) on the replica. The two plans must agree including tie
    // order; a pushed-filter or replica-id bug diverges them at scale.
    val filtered = queries.map { case (id, q) =>
      val lbl = id % 10
      val pushed = topIds(Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= id && col("label") === lbl),
        "embedding", "vec_id", q, 10))
      val qLit = array(q.map(x => lit(x)): _*)
      val rankedThenFiltered = topIds(
        emb.filter(col("vec_id") =!= id)
          .select(col("vec_id"), col("label"),
            graft.functions.VectorOps.cosineNative(col("embedding"), qLit)
              .as("_cos"))
          .filter(col("label") === lbl)
          .orderBy(desc_nulls_last("_cos"), asc_nulls_first("vec_id"))
          .limit(10).select("vec_id"))
      id -> (pushed.intersect(rankedThenFiltered).size / 10.0)
    }

    def stats(xs: Seq[(Long, Double)]): (Double, Double, String) = {
      val vals = xs.map(_._2)
      (vals.sum / vals.size, vals.min,
        xs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    }
    val (lshMean, lshMin, lshPer) = stats(lsh)
    val (ivfMean, ivfMin, ivfPer) = stats(ivf)
    val (pqMean, pqMin, pqPer) = stats(ivfpq)
    val (flMean, flMin, flPer) = stats(filtered)
    // the rerank sweep at the COMMITTED blocks (16); the 8-block sweep
    // stays visible in ivfpq_blocks_sweep
    val sweepJson = sweep16.map { case (rr, xs) =>
      val (m, mn, per) = stats(xs)
      s""""$rr":{"mean":$m,"min":$mn,"per_query":$per}"""
    }.mkString("{", ",", "}")
    val blocksJson = blocksSweep.map { case (nb, sweep) =>
      val cells = sweep.map { case (rr, xs) =>
        val (m, mn, per) = stats(xs)
        s""""$rr":{"mean":$m,"min":$mn,"per_query":$per}"""
      }.mkString("{", ",", "}")
      s""""$nb":$cells"""
    }.mkString("{", ",", "}")
    val minPathJson = minPoint match {
      case Some((rr, nb)) =>
        s"""{"rerank":$rr,"pq_blocks":$nb,"min_target":$ivfpqTarget}"""
      case None =>
        s"""{"plateau":"no (blocks, rerank<400) cell reaches per-query""" +
          s""" min >= $ivfpqTarget — ADC quantization is the operating""" +
          s""" limit at this corpus; see ivfpq_blocks_sweep"}"""
    }
    val gate = 0.9
    // the committed ivfpq operating point must clear the margin target
    // on its per-query MIN (the round-13 promotion), not just the mean —
    // sitting exactly on 0.90 means any drift flips the audit
    val pass = lshMean >= gate && ivfMean >= gate && pqMean >= ivfpqTarget &&
      pqMin >= ivfpqTarget && flMean == 1.0
    val head = scala.sys.process.Process(
      Seq("git", "rev-parse", "--short", "HEAD")).!!.trim
    val json =
      s"""{"metric":"ann_recall_audit","replica":"$dir","corpus_rows":$n,
         |"head":"$head","query_ids":[${queryIds.mkString(",")}],
         |"params":{"lsh":{"nbits":4,"seed":42,"probeHamming":1},
         |"ivf":{"k":8,"iters":3,"nprobe":6},
         |"ivfpq":{"k":8,"iters":3,"nprobe":6,"pqBlocks":$opBlocks,"pqK":16,"rerank":$opRerank},
         |"filtered":{"label":"query_id % 10","exact":true}},
         |"recall_at_10":{
         |"lsh":{"mean":$lshMean,"min":$lshMin,"per_query":$lshPer},
         |"ivf":{"mean":$ivfMean,"min":$ivfMin,"per_query":$ivfPer},
         |"ivfpq":{"mean":$pqMean,"min":$pqMin,"per_query":$pqPer},
         |"filtered":{"mean":$flMean,"min":$flMin,"per_query":$flPer}},
         |"ivfpq_rerank_sweep":$sweepJson,
         |"ivfpq_blocks_sweep":$blocksJson,
         |"ivfpq_min_path":$minPathJson,
         |"ivfpq_operating_rerank":$opRerank,"ivfpq_target":$ivfpqTarget,
         |"gate_mean":$gate,"filtered_gate":1.0,"pass":$pass}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(s"[recall] LSH mean=$lshMean min=$lshMin | " +
      s"IVF mean=$ivfMean min=$ivfMin | IVF+PQ mean=$pqMean min=$pqMin | " +
      s"filtered mean=$flMean | corpus=$n rows -> $outPath")
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
