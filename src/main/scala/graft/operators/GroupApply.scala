package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** R7 `sql_groupby_apply` — GROUP BY + arbitrary per-group dataframe→
  * dataframe transform with a declared output schema (ref:
  * slide/utils.py:765-788; pandas impl slide_pandas/utils.py:76-131; dask
  * impl slide_dask/utils.py:84-103; tests suite:2020-2153).
  *
  * This is the reference's entire UDF/UDAF/UDTF surface (SURVEY §2.5).
  * Spark mapping: `groupByKey(...).flatMapGroups` — the same
  * closure-to-executor boundary as dask's cloudpickled `apply`, with the
  * declared schema playing dask's `meta` role.
  *
  * Semantics preserved:
  *  - NULL group keys are retained (Spark groupByKey keeps them natively;
  *    the reference needs `dropna=False` + a pre-1.2 null-marker fallback,
  *    slide_pandas/utils.py:91-131).
  *  - Empty `cols` applies the function per partition (the dask
  *    `map_partitions` behavior, slide_dask/utils.py:97-98) — at 100 TB a
  *    whole-frame apply cannot exist; per-partition is the scalable
  *    contract.
  *
  * Scale note: a per-group closure defeats codegen — the SQL-aggregate
  * fast path (`Frame.groupAgg`) should always be preferred when the
  * transform is expressible as aggregates (SURVEY §7.4).
  */
object GroupApply {
  def apply(df: DataFrame, cols: Seq[String], outSchema: StructType)(
      func: Iterator[Row] => Iterator[Row]): DataFrame = {
    val outEnc = Encoders.row(outSchema)
    if (cols.isEmpty) {
      df.mapPartitions(func)(outEnc)
    } else {
      val keyIdx = cols.map(df.schema.fieldIndex).toArray
      val keySchema = StructType(cols.map(c => df.schema(c)))
      val keyEnc = Encoders.row(keySchema)
      df.groupByKey { row: Row =>
        Row.fromSeq(keyIdx.toIndexedSeq.map(i => row.get(i)))
      }(keyEnc).flatMapGroups { (_: Row, it: Iterator[Row]) => func(it) }(outEnc)
    }
  }
}
