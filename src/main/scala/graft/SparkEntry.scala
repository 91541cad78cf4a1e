package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are organized per SURVEY §2 area under [[graft.queries]];
  * each carries its own DuckDB oracle SQL.
  */
object SparkEntry {

  def registry: Seq[Q] =
    Headline.all ++ Relational.all ++ Expressions.all ++ Gapfill.all ++
      LlmData.all ++ Advanced.all ++ Tpch.all ++ Functions.all ++
      RandDiff.all ++ Temporal.all ++ CorpusOps.all ++ DedupFuzz.all ++
      SketchOps.all ++ LayoutOps.all ++ PipelineOps.all ++ MatchOps.all ++
      MiningOps.all ++ ScanOps.all ++ GraphOps.all ++ SelectionOps.all ++
      EmbedOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Subset used by Bench (headline analytical queries). */
  def benchQueries: Seq[String] = registry.filter(_.bench).map(_.name)
}
