package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.ArrowBridge

/** Arrow IPC interchange — the `as_arrow` surface
  * (ref: slide/utils.py:627-639).
  *
  * [[toStream]] serializes a frame to a complete Arrow IPC stream
  * (schema header + record batches + EOS) readable by any Arrow
  * implementation (pyarrow, DuckDB, Polars, Arrow Java). The batch
  * encoding runs distributed on the executors (`toArrowBatchRdd`);
  * only the already-columnar payload is collected, which is the
  * contract of an interchange call — it hands the dataset to a
  * single-process consumer, same as `as_pandas`. Don't call it on a
  * 100 TB frame any more than you'd call `collect()`; for bulk export
  * write parquet instead. Batch sizing follows
  * `spark.sql.execution.arrow.maxRecordsPerBatch` (default 10000).
  *
  * [[fromStream]] is the inverse: the schema is read from the stream
  * header, batches become a DataFrame without row-by-row transposition.
  */
object ArrowInterchange {

  def toStream(df: DataFrame): Array[Byte] =
    ArrowBridge.writeIpcStream(df.schema,
      ArrowBridge.collectArrowBatches(df).iterator,
      ArrowBridge.sessionTimeZone(df))

  def fromStream(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    // schema travels in the stream header — read it with Arrow Java,
    // then hand the raw batches over without transposing
    val allocator = ArrowBridge.newChildAllocator("graft-from-arrow")
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new ByteArrayInputStream(bytes), allocator)
    val schema =
      try ArrowBridge.fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
      finally { reader.close(); allocator.close() }
    ArrowBridge.toDataFrame(ArrowBridge.batchesFromIpcStream(bytes),
      schema.json, spark)
  }
}
