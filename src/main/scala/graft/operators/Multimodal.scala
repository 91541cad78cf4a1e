package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `BinaryType`
  * columns with typed metadata structs, processed by partition-local
  * decoders (the Scala analog of `mapInPandas` — an iterator-of-batches
  * boundary per partition, no driver collect).
  *
  * The actual codec step is a STUB — this container has no image/audio
  * libraries — implemented as a deterministic fake clearly marked below.
  * Everything around it is real and load-bearing: the binary column
  * plumbing, the declared output schema, the per-partition iterator
  * boundary, and the partitioning behavior are exactly what a real decoder
  * plugs into (swap `fakeDecode` for an actual JPEG/PNG parser and nothing
  * else changes).
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("channels", LongType),
    StructField("format", StringType)))

  /** STUB decoder: deterministic pseudo-metadata derived from the payload
    * bytes (length + first byte). A real implementation parses the codec
    * header here. Pure function of the bytes → reproducible and
    * oracle-expressible.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte]): Row = {
    val n = bytes.length.toLong
    val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xff).toLong
    val width = 64L + n % 192L
    val height = 64L + (n * 7L) % 192L
    val format = (first % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    Row(id, n, width, height, 3L, format)
  }

  /** Decode image metadata from a binary column via a partition-local
    * iterator (batch boundary identical to a real decoder's).
    */
  def decodeImageMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r => fakeDecode(r.getLong(idIdx), r.getAs[Array[Byte]](binIdx)) }
    }(Encoders.row(imageMetaSchema))
  }

  /** Resize planning over decoded metadata: fit the longest side to
    * `target` preserving aspect ratio, integer arithmetic only (so the
    * plan is oracle-expressible). This is the transform step of a real
    * resize pipeline; the pixel work happens wherever [[decodeImageMeta]]'s
    * stub would hand off to a codec. Output bytes = out_w × out_h ×
    * channels — the column a storage planner sizes batches with.
    */
  def resizeMeta(meta: DataFrame, target: Long = 224L): DataFrame =
    meta.select(col("doc_id"), col("width"), col("height"),
      when(col("width") >= col("height"), lit(target))
        .otherwise(expr(s"width * $target div height")).as("out_w"),
      when(col("width") >= col("height"), expr(s"height * $target div width"))
        .otherwise(lit(target)).as("out_h"),
      col("channels"))
      .withColumn("out_bytes", col("out_w") * col("out_h") * col("channels"))

  /** Audio-feature stub over a binary column: per-payload energy /
    * peak / zero-crossing count computed in one partition-local pass
    * (the batch shape of a real DSP kernel — swap the byte loop for an
    * FFT and nothing else changes). The kernel is byte-generic; on ASCII
    * payloads it reduces to codepoint arithmetic, which is how the mm4
    * DuckDB oracle replays it (see LlmData).
    */
  def audioFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_samples", LongType),
      StructField("energy", LongType),
      StructField("peak", LongType),
      StructField("zero_crossings", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        var energy = 0L; var peak = 0L; var zc = 0L
        var prevSign = 0
        var i = 0
        while (i < bytes.length) {
          val v = (bytes(i) & 0xff) - 128 // center like a PCM sample
          energy += v.toLong * v
          if (math.abs(v) > peak) peak = math.abs(v).toLong
          val sign = Integer.signum(v)
          if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
          if (sign != 0) prevSign = sign
          i += 1
        }
        Row(id, bytes.length.toLong, energy, peak, zc)
      }
    }(Encoders.row(out))
  }

  /** Frame-sampling stub for video-like payloads: emits every k-th
    * "frame" (fixed-size byte slice) as its own row — the UDTF shape
    * (one row in, n rows out) a real frame sampler has.
    *
    * The frame hash is a base-31 polynomial over the slice bytes reduced
    * mod 1e9+7 at every step, NOT a wrapping 64-bit hash: the intermediate
    * stays < 31×(1e9+7)+255, so engines with checked integer arithmetic
    * (DuckDB errors on BIGINT overflow where a Long silently wraps) compute
    * the identical value — which is what makes this stub oracle-checkable.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int = 64, every: Int = 2): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", LongType),
      StructField("frame_hash", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by every).iterator.map { f =>
          val slice = java.util.Arrays.copyOfRange(bytes, f * frameBytes, (f + 1) * frameBytes)
          Row(id, f.toLong,
            slice.foldLeft(0L)((acc, b) => (acc * 31L + (b & 0xff)) % 1000000007L))
        }
      }
    }(Encoders.row(out))
  }
}
