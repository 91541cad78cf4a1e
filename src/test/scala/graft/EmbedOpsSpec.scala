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

  test("registry exposes the new rows") {
    assert(EmbedOps.all.map(_.name) ==
      Seq("imp7_prototype_prune", "fe7_random_projection"))
    assert(graft.SparkEntry.queries.contains("an5_score_auc"))
    assert(graft.SparkEntry.queries.contains("cur10_ccnet_buckets"))
  }
}
