package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** At-scale recall evidence for the two pruned (no-SQL-oracle) ANN
  * queries, run against a ScaleUp replica:
  *
  *   Test/runMain graft.RecallAudit <replicaDir> <outJson>
  *
  * ss2 (LSH) and ss3 (IVF) are the registry's only rows the DuckDB
  * referee cannot hash-check (pruned search is hash/centroid-specific);
  * their recall@10 gates run in-spec at sf0.001 only. This audit
  * re-measures recall at the replica scale with the SAME parameters the
  * registered queries use (LSH nbits=4/seed=42/probe=1; IVF k=8/iters=3/
  * nprobe=6), against the exact brute-force twin on the same corpus.
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

    def stats(xs: Seq[(Long, Double)]): (Double, Double, String) = {
      val vals = xs.map(_._2)
      (vals.sum / vals.size, vals.min,
        xs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    }
    val (lshMean, lshMin, lshPer) = stats(lsh)
    val (ivfMean, ivfMin, ivfPer) = stats(ivf)
    val gate = 0.9
    val pass = lshMean >= gate && ivfMean >= gate
    val head = scala.sys.process.Process(
      Seq("git", "rev-parse", "--short", "HEAD")).!!.trim
    val json =
      s"""{"metric":"ann_recall_audit","replica":"$dir","corpus_rows":$n,
         |"head":"$head","query_ids":[${queryIds.mkString(",")}],
         |"params":{"lsh":{"nbits":4,"seed":42,"probeHamming":1},
         |"ivf":{"k":8,"iters":3,"nprobe":6}},
         |"recall_at_10":{
         |"lsh":{"mean":$lshMean,"min":$lshMin,"per_query":$lshPer},
         |"ivf":{"mean":$ivfMean,"min":$ivfMin,"per_query":$ivfPer}},
         |"gate_mean":$gate,"pass":$pass}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(s"[recall] LSH mean=$lshMean min=$lshMin | " +
      s"IVF mean=$ivfMean min=$ivfMin | corpus=$n rows -> $outPath")
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
