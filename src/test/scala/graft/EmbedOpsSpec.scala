package graft

import graft.operators.RankMetrics
import graft.queries.EmbedOps

/** Properties of the embedding-space curation rows (imp7, fe7) and the
  * rank-AUC kernel behind an5 that the value-hash oracle gate can't
  * express: per-cluster prune fractions, rank monotonicity, JL
  * unbiasedness, and the AUC kernel's closed-form anchors.
  */
class EmbedOpsSpec extends SparkSpec {

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("imp7 drops exactly n div 4 per cluster, the closest first") {
    val rows = q("imp7_prototype_prune")
      .select("cl", "dist2", "kept").collect()
    val byCl = rows.groupBy(_.getLong(0))
    assert(byCl.nonEmpty)
    byCl.foreach { case (_, rs) =>
      val n = rs.length
      val dropped = rs.filter(_.getLong(2) == 0L)
      assert(dropped.length == n / 4)
      if (dropped.nonEmpty) {
        val maxDropped = dropped.map(_.getLong(1)).max
        val minKept = rs.filter(_.getLong(2) == 1L).map(_.getLong(1)).min
        assert(maxDropped <= minKept)
      }
    }
  }

  test("fe7 JL estimate is unbiased within a broad band on the fixture") {
    val rows = q("fe7_random_projection").select("ratio_pm").collect()
    assert(rows.nonEmpty)
    val mean = rows.map(_.getLong(0)).sum / rows.length
    assert(mean >= 700 && mean <= 1300,
      s"mean distortion ratio $mean permille is outside [700, 1300]")
  }

  test("rank-AUC kernel hits its closed-form anchors") {
    import spark.implicits._
    val perfect = Seq((10L, 1L), (10L, 1L), (0L, 0L), (0L, 0L), (0L, 0L))
      .toDF("s", "y")
    assert(RankMetrics.aucPermille(perfect, "s", "y")
      .collect().head.getAs[Long]("auc_pm") == 1000L)
    val inverted = Seq((0L, 1L), (0L, 1L), (10L, 0L), (10L, 0L))
      .toDF("s", "y")
    assert(RankMetrics.aucPermille(inverted, "s", "y")
      .collect().head.getAs[Long]("auc_pm") == 0L)
    val allTied = Seq((5L, 1L), (5L, 1L), (5L, 0L), (5L, 0L))
      .toDF("s", "y")
    assert(RankMetrics.aucPermille(allTied, "s", "y")
      .collect().head.getAs[Long]("auc_pm") == 500L)
    // interleaved: pos at 3 and 1, neg at 2 and 0 -> U = 3 of 4 pairs
    val mixed = Seq((3L, 1L), (2L, 0L), (1L, 1L), (0L, 0L)).toDF("s", "y")
    assert(RankMetrics.aucPermille(mixed, "s", "y")
      .collect().head.getAs[Long]("auc_pm") == 750L)
  }

  test("dd20 funnel is monotone per cluster and prune keeps 3/4 of survivors") {
    val rows = q("dd20_d4_pipeline").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nRaw, nSd, nKept) =
        (r.getAs[Long]("n_raw"), r.getAs[Long]("n_semdedup"), r.getAs[Long]("n_kept"))
      assert(nRaw >= nSd && nSd >= nKept)
      assert(nKept == nSd - nSd / 4)
    }
  }

  test("dq6 planted arms each fire exactly; corpus arm is clean") {
    val rows = q("dq6_embedding_quality").collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    val corpus = rows("corpus")
    assert(corpus.getAs[Long]("n_zero") == 0 && corpus.getAs[Long]("n_low") == 0
      && corpus.getAs[Long]("n_high") == 0 && corpus.getAs[Long]("n_dim") == 0)
    assert(rows("planted_zero").getAs[Long]("n_zero") ==
      rows("planted_zero").getAs[Long]("n_vecs"))
    assert(rows("planted_scale").getAs[Long]("n_high") ==
      rows("planted_scale").getAs[Long]("n_vecs"))
    assert(rows("planted_dim").getAs[Long]("n_dim") ==
      rows("planted_dim").getAs[Long]("n_vecs"))
  }

  test("registry exposes the new rows") {
    assert(EmbedOps.all.map(_.name) == Seq("imp7_prototype_prune",
      "fe7_random_projection", "dd20_d4_pipeline", "rf32_protoprune_fuzz",
      "dq6_embedding_quality"))
    assert(graft.SparkEntry.queries.contains("an5_score_auc"))
    assert(graft.SparkEntry.queries.contains("an6_score_calibration"))
    assert(graft.SparkEntry.queries.contains("cur10_ccnet_buckets"))
  }
}
