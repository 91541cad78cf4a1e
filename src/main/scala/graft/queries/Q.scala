package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A registered query: the Spark-side implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL over the same parquet
  * tables. Conventions that make the driver's hash compare deterministic:
  *
  *  - every query ends in a total ORDER BY; oracle SQL spells NULLS
  *    FIRST/LAST explicitly (DuckDB defaults to NULLS LAST, Spark's ASC
  *    defaults to NULLS FIRST);
  *  - floating aggregates are integerized per row (`ROUND(x*100)` cents)
  *    before SUM so group sums are exact integers in both engines,
  *    independent of summation order;
  *  - every output column is aliased identically on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)
