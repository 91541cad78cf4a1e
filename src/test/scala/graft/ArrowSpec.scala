package graft

import java.io.ByteArrayInputStream

import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ArrowBridge
import graft.operators.{ArrowInterchange, Frame}

/** §2.4 `as_arrow`: the stream must be valid Arrow IPC (readable by the
  * Arrow Java reference reader), carry the schema, and round-trip values
  * including nested and temporal types.
  */
class ArrowSpec extends SparkSpec {
  import spark.implicits._

  private def nestedDf = Seq(
    (1L, "a", Seq(1, 2, 3), Map("x" -> 1L), 1.5, java.sql.Date.valueOf("1996-01-02")),
    (2L, null, Seq.empty[Int], Map.empty[String, Long], Double.NaN, null)
  ).toDF("id", "s", "arr", "m", "d", "dt")
    .withColumn("nested", struct(col("id").as("i"), col("s").as("t")))

  test("toArrowStream is readable by the Arrow Java reference reader") {
    val bytes = Frame(nestedDf).toArrowStream
    val alloc = ArrowBridge.newChildAllocator("spec")
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      // schema survives, mapped back through the official converter
      assert(ArrowBridge.fromArrowSchema(root.getSchema) === nestedDf.schema)
      var rows = 0L
      while (reader.loadNextBatch()) rows += root.getRowCount
      assert(rows === 2L)
    } finally { reader.close(); alloc.close() }
  }

  test("toArrowStream/fromStream round-trips schema and values") {
    val bytes = Frame(nestedDf).toArrowStream
    val back = ArrowInterchange.fromStream(spark, bytes)
    assert(back.schema === nestedDf.schema)
    val orig = nestedDf.orderBy("id").collect()
    val got = back.orderBy("id").collect()
    assert(got.length === orig.length)
    orig.zip(got).foreach { case (a, b) =>
      // Row equality handles nested structs/arrays/maps; NaN == NaN here
      // because Spark Row equality is element-wise with NaN-safe doubles
      assert(a === b, s"row mismatch: $a vs $b")
    }
  }

  test("empty frame round-trips as schema-only stream") {
    val empty = nestedDf.filter(lit(false))
    val bytes = Frame(empty).toArrowStream
    val back = ArrowInterchange.fromStream(spark, bytes)
    assert(back.schema === empty.schema)
    assert(back.count() === 0L)
  }

  test("timestamps survive with the session time zone") {
    val ts = Seq((1L, java.sql.Timestamp.valueOf("1996-01-02 03:04:05.678")))
      .toDF("id", "ts")
    val back = ArrowInterchange.fromStream(spark, Frame(ts).toArrowStream)
    assert(back.schema === ts.schema)
    assert(back.head().getTimestamp(1) === ts.head().getTimestamp(1))
  }
}
