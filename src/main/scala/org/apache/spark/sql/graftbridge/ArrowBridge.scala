package org.apache.spark.sql.graftbridge

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels

import org.apache.arrow.memory.BufferAllocator
import org.apache.arrow.vector.types.pojo.{Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.arrow.{ArrowBatchStreamWriter, ArrowConverters}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

/** The minimal `private[sql]` surface graft's Arrow interchange needs,
  * re-exported from inside the package boundary: batch-RDD export, the
  * IPC stream writer, batch→DataFrame import, and the schema converter.
  * Logic lives in `graft.operators.ArrowInterchange`; this object only
  * crosses the access boundary.
  */
object ArrowBridge {

  /** distributed Arrow record-batch encoding, collected as IPC payloads */
  def collectArrowBatches(df: DataFrame): Array[Array[Byte]] =
    df.asInstanceOf[ClassicDataset[Row]].toArrowBatchRdd.collect()

  /** complete IPC stream: schema header + batches + end-of-stream */
  def writeIpcStream(schema: StructType, batches: Iterator[Array[Byte]],
      timeZoneId: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = new ArrowBatchStreamWriter(schema, out, timeZoneId,
      true /* errorOnDuplicatedFieldNames */, false /* largeVarTypes */)
    writer.writeBatches(batches)
    writer.end()
    out.toByteArray
  }

  /** raw record-batch messages of an IPC stream (schema header skipped) */
  def batchesFromIpcStream(bytes: Array[Byte]): Iterator[Array[Byte]] =
    ArrowConverters.getBatchesFromStream(
      Channels.newChannel(new ByteArrayInputStream(bytes)))

  def toDataFrame(batches: Iterator[Array[Byte]], schemaJson: String,
      spark: SparkSession): DataFrame =
    ArrowConverters.toDataFrame(batches, schemaJson,
      spark.asInstanceOf[ClassicSession])

  def fromArrowSchema(schema: ArrowSchema): StructType =
    ArrowUtils.fromArrowSchema(schema)

  def newChildAllocator(name: String): BufferAllocator =
    ArrowUtils.rootAllocator.newChildAllocator(name, 0, Long.MaxValue)

  def sessionTimeZone(df: DataFrame): String =
    df.asInstanceOf[ClassicDataset[Row]].sparkSession
      .sessionState.conf.sessionLocalTimeZone
}

/** `private[sql]` plan-construction surface: build a DataFrame from a
  * hand-assembled logical plan (used by graft.operators.ClusteredAgg to
  * insert its verified-clustering node).
  */
object PlanBridge {
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[ClassicDataset[Row]].queryExecution.analyzed

  def semanticHash(df: DataFrame): Int =
    analyzed(df).canonicalized.hashCode()

  /** Wrap a hand-built Expression as a Column (used by operators that
    * construct expressions holding runtime state — e.g. a Broadcast
    * handle — which the FunctionRegistry builder path cannot carry).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
