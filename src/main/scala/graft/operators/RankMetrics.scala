package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based evaluation metrics for curation signals — "does this score
  * actually separate the docs we want from the docs we don't", answered
  * without floats so a DuckDB oracle replays it exactly.
  *
  * Ref: the reference (slide/utils.py) has no evaluation surface; this
  * extends the analysis family (an*) per the north-star scope.
  */
object RankMetrics {

  /** AUC (= Mann–Whitney U / (P·N)) of `scoreCol` predicting the 0/1
    * `labelCol`, in permille, with the standard half-credit for ties:
    *
    *   AUC = [ #{(p,n): s_p > s_n} + ½·#{(p,n): s_p = s_n} ] / (P·N)
    *
    * Computed by rank algebra on the SCORE-GRAIN count table, never on
    * pairs: group docs by score (for an integerized permille score that
    * is a bounded frame — ≤1001 rows at any corpus size), take the
    * running count of negatives strictly below each score, and fold
    *
    *   2·U = Σ_s  2·np(s)·cum_nn(<s) + np(s)·nn(s).
    *
    * The products of corpus-grain counts wrap int64 silently in
    * non-ANSI Spark at ~1e9 docs, so internals are Decimal(38,0)
    * (HUGEINT in the oracle) per the repo convention; the result is one
    * row (n_pos, n_neg, auc_pm), all BIGINT.
    *
    * The one window runs over the score-grain frame — bounded by the
    * score domain, not the corpus, so the lone-partition sort is
    * constant work at 100 TB.
    */
  def aucPermille(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val g = df
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(col(labelCol)).as("np"),
        (count(lit(1)) - sum(col(labelCol))).as("nn"))
    val below = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cnn", coalesce(sum(col("nn")).over(below), lit(0L)))
      .agg(
        sum(col("np")).as("n_pos"),
        sum(col("nn")).as("n_neg"),
        expr("""CAST(sum(2 * CAST(np AS DECIMAL(38,0)) * cnn
                    + CAST(np AS DECIMAL(38,0)) * nn) * 1000
                div (2 * CAST(sum(np) AS DECIMAL(38,0)) * sum(nn))
                AS BIGINT)""").as("auc_pm"))
  }

  /** Full precision/recall/F1 threshold curve for the rule "predict
    * positive when score >= t", one row per DISTINCT score value — the
    * operating-point table that turns an AUC into a deployable cutoff.
    *
    * Same scale posture as [[aucPermille]]: all cumulative counts run
    * on the score-grain table (bounded by the score domain, ≤1001 rows
    * for a permille score at any corpus size), so the unpartitioned
    * descending window is constant work at 100 TB; the corpus
    * contributes one aggregate scan. All-integer fixed point (permille)
    * so the oracle replays every cell.
    *
    * Output: (threshold, tp, fp, fn, precision_pm, recall_pm, f1_pm)
    * ordered by threshold.
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df
      .groupBy(col(scoreCol).as("threshold"))
      .agg(sum(col(labelCol)).as("np"),
        (count(lit(1)) - sum(col(labelCol))).as("nn"))
    val above = Window.orderBy(desc("threshold"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = broadcast(g.agg(sum(col("np")).as("pos")))
    g.withColumn("tp", sum(col("np")).over(above))
      .withColumn("fp", sum(col("nn")).over(above))
      .crossJoin(tot)
      // permille products in Decimal(38,0) like aucPermille: tp*1000
      // wraps int64 silently past ~9.2e15 positives in non-ANSI Spark
      // while the oracle's HUGEINT promotes — the fe4/tx11 class
      .select(col("threshold"), col("tp"), col("fp"),
        (col("pos") - col("tp")).as("fn"),
        expr("CAST(CAST(tp AS DECIMAL(38,0)) * 1000 div (tp + fp) AS BIGINT)")
          .as("precision_pm"),
        expr("CAST(CAST(tp AS DECIMAL(38,0)) * 1000 div pos AS BIGINT)")
          .as("recall_pm"),
        expr("""CAST(2 * CAST(tp AS DECIMAL(38,0)) * 1000
                div (2 * tp + fp + (pos - tp)) AS BIGINT)""").as("f1_pm"))
      .orderBy("threshold")
  }
}
