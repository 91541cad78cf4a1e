package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `BinaryType`
  * columns with typed metadata structs, processed by partition-local
  * decoders (the Scala analog of `mapInPandas` — an iterator-of-batches
  * boundary per partition, no driver collect).
  *
  * The image step is a REAL codec-header parser ([[parseImageHeader]]):
  * PNG IHDR, JPEG SOF segment scan, GIF logical-screen descriptor —
  * pure JVM byte inspection, no libraries, no full decode. That is also
  * the right 100 TB posture: metadata extraction reads a few dozen bytes
  * per payload, so the operator is scan-bound, and the pixel-level work
  * (an actual resize/decode) plugs in behind the same partition-local
  * iterator without changing the plumbing. Audio/video feature kernels
  * below are honest byte-level DSP-shaped passes (energy/peak/zero-cross,
  * frame slicing), byte-generic by design.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("channels", LongType),
    StructField("format", StringType)))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** (width, height, channels, format) parsed from a real encoded image
    * header, or None for payloads that are not a recognized image.
    *
    *  - PNG: 8-byte signature, then the IHDR chunk — width/height as
    *    big-endian u32 at offsets 16/20, color type at 25 (0 gray → 1
    *    channel, 2 RGB → 3, 3 palette → 1, 4 gray+α → 2, 6 RGBA → 4).
    *  - JPEG: SOI then a marker-segment scan to the frame header (SOF0,
    *    SOF1, SOF2, … — any C0–CF except DHT C4 / JPG C8 / DAC CC);
    *    height/width as big-endian u16 at +3/+5 in the segment payload,
    *    component count (channels) at +7. APPn/DQT/COM segments are
    *    skipped by their declared length, like any real reader.
    *  - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor —
    *    width/height as LITTLE-endian u16 at 6/8; palette RGB → 3.
    */
  def parseImageHeader(bytes: Array[Byte]): Option[(Long, Long, Long, String)] = {
    if (bytes.length >= 33 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G' && (bytes(4) & 0xff) == 0x0d && (bytes(5) & 0xff) == 0x0a &&
        (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0x0a &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
      val channels = (bytes(25) & 0xff) match {
        case 0 => 1L; case 2 => 3L; case 3 => 1L; case 4 => 2L; case 6 => 4L
        case _ => return None
      }
      Some((be32(bytes, 16), be32(bytes, 20), channels, "png"))
    } else if (bytes.length >= 4 &&
        (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      // JPEG: scan marker segments for the first frame header
      var i = 2
      while (i + 3 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return None // desynced: not a marker
        var j = i
        while (j < bytes.length && (bytes(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= bytes.length) return None
        val marker = bytes(j) & 0xff
        if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS before SOF
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) { i = j + 1 }
        else {
          if (j + 2 >= bytes.length) return None
          val len = be16(bytes, j + 1)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (j + 8 >= bytes.length) return None
            val h = be16(bytes, j + 4).toLong
            val w = be16(bytes, j + 6).toLong
            val ncomp = (bytes(j + 8) & 0xff).toLong
            return Some((w, h, ncomp, "jpeg"))
          }
          i = j + 1 + len
        }
      }
      None
    } else if (bytes.length >= 13 &&
        bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
      Some((le16(bytes, 6).toLong, le16(bytes, 8).toLong, 3L, "gif"))
    } else None
  }

  /** Decode image metadata from a binary column via a partition-local
    * iterator (batch boundary identical to a full decoder's). Unparseable
    * payloads keep their byte count with NULL dims and format "unknown" —
    * a corrupt blob must not kill a 100 TB scan.
    */
  def decodeImageMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        parseImageHeader(bytes) match {
          case Some((w, h, c, fmt)) => Row(id, bytes.length.toLong, w, h, c, fmt)
          case None => Row(id, bytes.length.toLong, null, null, null, "unknown")
        }
      }
    }(Encoders.row(imageMetaSchema))
  }

  /** Deterministic REAL-header image payload for gate/spec data: a
    * genuine PNG / baseline-or-progressive JPEG / GIF header carrying
    * dims derived from the text, followed by the text bytes as body.
    * This is the "plant real encoded headers in the data" half of the
    * mm1/mm3 round-trip: [[decodeImageMeta]] must recover the dims by
    * actually parsing, and the SQL oracle recomputes them from the
    * source columns — so an encoder bug and a parser bug cannot cancel.
    *
    * Encoding rules (all oracle-expressible):
    *   format  = doc_id % 3 → 0 jpeg, 1 png, 2 gif
    *   width   = 64 + n % 192,  height = 64 + (n*7) % 192   (n = |text| bytes)
    *   png colorType = [2,6,0][n % 3] → channels 3/4/1
    *   jpeg: APP0/JFIF segment, then SOF0 (n even) or SOF2 (n odd),
    *         channels = 3 (n even) or 1 (n odd)
    *   gif:  GIF89a, channels 3
    */
  def plantImagePayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val body = r.getString(txtIdx).getBytes("UTF-8")
        val n = body.length
        val w = 64 + n % 192
        val h = 64 + (n * 7) % 192
        val header: Array[Byte] = (id % 3) match {
          case 0 =>
            val sof: Byte = if (n % 2 == 0) 0xc0.toByte else 0xc2.toByte
            val ncomp: Byte = if (n % 2 == 0) 3 else 1
            Array[Byte](0xff.toByte, 0xd8.toByte, // SOI
              0xff.toByte, 0xe0.toByte, 0, 16, // APP0 len=16
              'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
              0xff.toByte, sof, 0, (8 + 3 * ncomp).toByte, // SOF len
              8, (h >> 8).toByte, (h & 0xff).toByte,
              (w >> 8).toByte, (w & 0xff).toByte, ncomp) ++
              Array.tabulate(3 * ncomp)(k => (k % 3 match {
                case 0 => k / 3 + 1; case 1 => 0x11; case _ => 0
              }).toByte)
          case 1 =>
            val colorType: Byte = Seq[Byte](2, 6, 0)(n % 3)
            Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
              0, 0, 0, 13, 'I', 'H', 'D', 'R',
              (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, (w & 0xff).toByte,
              (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, (h & 0xff).toByte,
              8, colorType, 0, 0, 0,
              0, 0, 0, 0) // CRC (unchecked by header parsers)
          case _ =>
            Array[Byte]('G', 'I', 'F', '8', '9', 'a',
              (w & 0xff).toByte, (w >> 8).toByte,
              (h & 0xff).toByte, (h >> 8).toByte,
              0, 0, 0)
        }
        Row(id, header ++ body)
      }
    }(Encoders.row(out))
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

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  val wavMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("channels", LongType),
    StructField("sample_rate", LongType),
    StructField("bits", LongType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType)))

  /** (channels, sampleRate, bitsPerSample, dataBytes) parsed from a real
    * RIFF/WAVE payload, or None when the payload is not WAV. A genuine
    * chunk WALK, not fixed offsets: after "RIFF"<u32 size>"WAVE", chunks
    * are (fourcc, u32le size, payload, odd-size pad byte) — LIST/JUNK/
    * fact chunks before "fmt " are skipped by declared size exactly as a
    * real reader does (and plantWavPayload plants one on odd-length
    * bodies so a fixed-offset cheat cannot pass the round-trip).
    */
  def parseWavHeader(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Long, Long, Long)] = None
    var data: Option[Long] = None
    while (i + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val cc = fourcc(bytes, i)
      val size = le32(bytes, i + 4)
      if (cc == "fmt " && size >= 16 && i + 8 + 16 <= bytes.length) {
        fmt = Some((le16(bytes, i + 10).toLong, // channels
          le32(bytes, i + 12), // sample rate
          le16(bytes, i + 22).toLong)) // bits per sample
      } else if (cc == "data") {
        data = Some(size)
      }
      // size is an UNSIGNED u32: a malformed/hostile size >= 2^31 would
      // make size.toInt negative and the walk could stop advancing
      // (size 0xFFFFFFF8 gives advance 0 — an executor-task spin). Any
      // declared size past Int.MaxValue cannot fit a JVM array anyway:
      // reject the payload instead of trusting the chunk.
      if (size > Int.MaxValue.toLong) return None
      i += 8 + size.toInt + (size.toInt & 1)
    }
    // a zero-channel / zero-bit fmt chunk would divide-by-zero downstream
    // (blockAlign = channels*bits/8); malformed ⇒ not WAV
    fmt match {
      case Some((ch, rate, bits))
        if ch <= 0 || bits <= 0 || rate <= 0 || ch * bits < 8 => None
      case _ => for ((ch, rate, bits) <- fmt; d <- data) yield (ch, rate, bits, d)
    }
  }

  /** Deterministic REAL-header WAV payload (the audio half of the
    * plant/parse round-trip, mirroring [[plantImagePayload]]):
    *
    *   channels   = 1 + n % 2            (n = |text| bytes = data size)
    *   sampleRate = 8000 + (n % 5) * 4000
    *   bits       = 16 when n % 3 = 0 else 8
    *   odd n additionally gets a 10-byte LIST chunk before "fmt " so the
    *   parser must walk chunks
    */
  def plantWavPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val body = r.getString(txtIdx).getBytes("UTF-8")
        val n = body.length
        val channels = 1 + n % 2
        val rate = 8000 + (n % 5) * 4000
        val bits = if (n % 3 == 0) 16 else 8
        val blockAlign = channels * bits / 8
        val byteRate = rate * blockAlign
        val bb = java.nio.ByteBuffer
          .allocate(12 + (if (n % 2 == 1) 18 else 0) + 24 + 8 + n + (n & 1))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(0) // size patched below
        bb.put("WAVE".getBytes("US-ASCII"))
        if (n % 2 == 1) { // junk chunk forces the walk
          bb.put("LIST".getBytes("US-ASCII")).putInt(10)
          bb.put(Array.fill[Byte](10)(0x4a))
        }
        bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        bb.putShort(1).putShort(channels.toShort).putInt(rate)
          .putInt(byteRate).putShort(blockAlign.toShort).putShort(bits.toShort)
        bb.put("data".getBytes("US-ASCII")).putInt(n).put(body)
        if ((n & 1) == 1) bb.put(0.toByte) // RIFF odd-size pad
        val payload = bb.array()
        val riffSize = payload.length - 8
        payload(4) = (riffSize & 0xff).toByte
        payload(5) = ((riffSize >> 8) & 0xff).toByte
        payload(6) = ((riffSize >> 16) & 0xff).toByte
        payload(7) = ((riffSize >> 24) & 0xff).toByte
        Row(id, payload)
      }
    }(Encoders.row(out))
  }

  /** Parsed WAV metadata + derived sample count / duration:
    * n_samples = dataBytes div blockAlign, duration_ms = n_samples *
    * 1000 div sampleRate — the columns an audio-curation pipeline
    * filters on (clip length, mono/stereo, bandwidth).
    */
  def decodeWavMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        parseWavHeader(r.getAs[Array[Byte]](binIdx)) match {
          case Some((ch, rate, bits, dataBytes)) =>
            val nSamples = dataBytes / (ch * bits / 8)
            Row(id, ch, rate, bits, nSamples, nSamples * 1000L / rate)
          case None => Row(id, null, null, null, null, null)
        }
      }
    }(Encoders.row(wavMetaSchema))
  }

  // ---- ISO-BMFF (MP4) — the video sibling of the WAV chunk walk ----

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  val mp4MetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("timescale", LongType),
    StructField("duration", LongType),
    StructField("mdat_bytes", LongType),
    StructField("duration_ms", LongType),
    StructField("n_top_boxes", LongType)))

  /** (timescale, duration, mdatBytes, nTopBoxes) parsed from a real
    * ISO-BMFF byte stream, or None when the payload is not MP4. A
    * genuine BOX WALK over the big-endian container: every top-level
    * box is (u32be size, fourcc, payload) with the two real size edge
    * forms handled — size == 1 means a u64be LARGESIZE follows the
    * fourcc (how >4 GiB mdat boxes are written in practice; planted on
    * every n%7==0 payload so a parser that ignores it fails the
    * round-trip), size == 0 means the box runs to end-of-file. The
    * movie header is found by a NESTED walk inside `moov` (mvhd
    * version 0: timescale u32be at +20, duration u32be at +24).
    *
    * Hostile-size guards (the mm5 u32 lesson, big-endian edition): a
    * box smaller than its own header, a largesize past Int.MaxValue,
    * or a box overrunning the buffer rejects the payload — the walk
    * can never stall or read out of bounds.
    */
  def parseMp4Meta(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    if (bytes.length < 8 || fourcc(bytes, 4) != "ftyp") return None
    var i = 0
    var ts: Option[Long] = None
    var dur: Option[Long] = None
    var mdat: Option[Long] = None
    var nBoxes = 0L
    while (i + 8 <= bytes.length) {
      val size32 = be32(bytes, i)
      val cc = fourcc(bytes, i + 4)
      val (payloadStart, boxLen): (Int, Long) =
        if (size32 == 1L) {
          if (i + 16 > bytes.length) return None
          (i + 16, be64(bytes, i + 8))
        } else if (size32 == 0L) (i + 8, (bytes.length - i).toLong)
        else (i + 8, size32)
      val hdr = (payloadStart - i).toLong
      if (boxLen < hdr || boxLen > Int.MaxValue.toLong) return None
      if (i + boxLen > bytes.length) return None
      nBoxes += 1
      if (cc == "moov") {
        var k = payloadStart
        val end = (i + boxLen).toInt
        while (k + 8 <= end && ts.isEmpty) {
          val s2 = be32(bytes, k)
          if (s2 < 8 || k + s2 > end) return None
          if (fourcc(bytes, k + 4) == "mvhd" && s2 >= 32 &&
              (bytes(k + 8) & 0xff) == 0) {
            ts = Some(be32(bytes, k + 20))
            dur = Some(be32(bytes, k + 24))
          }
          k += s2.toInt
        }
      } else if (cc == "mdat") {
        mdat = Some(boxLen - hdr)
      }
      i += boxLen.toInt
    }
    for (t <- ts; d <- dur; m <- mdat; if t > 0) yield (t, d, m, nBoxes)
  }

  /** Deterministic REAL-container MP4 payload (the video half of the
    * plant/parse round-trip, mirroring [[plantWavPayload]]):
    *
    *   timescale  = 600 + (n % 7) * 100     (n = |text| bytes)
    *   duration   = n * 100 timescale units
    *   mdat body  = the n text bytes; n % 7 == 0 writes the mdat in the
    *                size==1 + u64 LARGESIZE form
    *   odd n additionally gets a 12-byte `free` junk box before `moov`
    *   so the parser must walk boxes
    */
  def plantMp4Payload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val body = r.getString(txtIdx).getBytes("UTF-8")
        val n = body.length
        val timescale = 600 + (n % 7) * 100
        val duration = n * 100
        val large = n % 7 == 0
        val freeLen = if (n % 2 == 1) 12 else 0
        val mvhdLen = 108
        val moovLen = 8 + mvhdLen
        val mdatLen = (if (large) 16 else 8) + n
        // ISO-BMFF is big-endian — ByteBuffer's default order
        val bb = java.nio.ByteBuffer.allocate(16 + freeLen + moovLen + mdatLen)
        bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
          .put("isom".getBytes("US-ASCII")).putInt(0)
        if (freeLen > 0) {
          bb.putInt(12).put("free".getBytes("US-ASCII")).putInt(0x4a4a4a4a)
        }
        bb.putInt(moovLen).put("moov".getBytes("US-ASCII"))
        bb.putInt(mvhdLen).put("mvhd".getBytes("US-ASCII"))
        bb.putInt(0) // version 0 + flags
        bb.putInt(0).putInt(0) // creation, modification
        bb.putInt(timescale).putInt(duration)
        bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, reserved
        bb.putInt(0).putInt(0) // reserved[2]
        for (_ <- 0 until 9) bb.putInt(0) // matrix
        for (_ <- 0 until 6) bb.putInt(0) // pre_defined
        bb.putInt(2) // next_track_id
        if (large) {
          bb.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(16L + n)
        } else {
          bb.putInt(8 + n).put("mdat".getBytes("US-ASCII"))
        }
        bb.put(body)
        Row(id, bb.array())
      }
    }(Encoders.row(out))
  }

  /** Parsed MP4 metadata + derived duration_ms = duration * 1000 div
    * timescale — the columns a video-curation pipeline filters on
    * (clip length, payload size) before any frame is decoded.
    */
  def decodeMp4Meta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        parseMp4Meta(r.getAs[Array[Byte]](binIdx)) match {
          case Some((ts, dur, mdatBytes, nBoxes)) =>
            Row(id, ts, dur, mdatBytes, dur * 1000L / ts, nBoxes)
          case None => Row(id, null, null, null, null, null)
        }
      }
    }(Encoders.row(mp4MetaSchema))
  }

  // ---- WARC — the web-crawl container (ISO 28500; what Common Crawl
  // ships), the ingestion-side sibling of the WAV/MP4 chunk walks ----

  val warcMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_records", LongType),
    StructField("n_requests", LongType),
    StructField("response_bytes", LongType),
    StructField("has_warcinfo", LongType),
    StructField("total_bytes", LongType)))

  /** Walk a WARC file: records are `WARC/1.x` + named headers + CRLF +
    * Content-Length body bytes + CRLFCRLF. Header names are
    * case-insensitive. Hostile-input guards (each rejects the whole
    * payload rather than trusting it): missing/non-numeric/negative
    * Content-Length, declared length past the buffer or past
    * Int.MaxValue, a header line without ':', a record not terminated
    * by CRLFCRLF, or trailing garbage after the last record.
    *
    * Returns (n_records, n_requests, sum of response Content-Lengths,
    * has_warcinfo 0/1).
    */
  def parseWarc(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    def lineEnd(from: Int): Int = { // index of '\r' of the next CRLF, or -1
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    def str(a: Int, b: Int) = new String(bytes, a, b - a, "US-ASCII")
    var i = 0
    var nRec = 0L; var nReq = 0L; var respBytes = 0L; var hasInfo = 0L
    while (i < bytes.length) {
      val ve = lineEnd(i)
      if (ve < 0 || !str(i, ve).startsWith("WARC/")) return None
      i = ve + 2
      var cl = -1L
      var wtype = ""
      var done = false
      while (!done) {
        val he = lineEnd(i)
        if (he < 0) return None
        if (he == i) { done = true; i += 2 } // blank line: headers end
        else {
          val line = str(i, he)
          val c = line.indexOf(':')
          if (c < 0) return None
          val name = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          if (name == "content-length") {
            if (!value.forall(_.isDigit) || value.isEmpty) return None
            val v = BigInt(value)
            if (v > Int.MaxValue) return None // cannot fit a JVM buffer
            cl = v.toLong
          } else if (name == "warc-type") wtype = value
          i = he + 2
        }
      }
      if (cl < 0) return None
      if (i + cl + 4 > bytes.length) return None // body past the buffer
      val bodyEnd = i + cl.toInt
      if (!(bytes(bodyEnd) == '\r' && bytes(bodyEnd + 1) == '\n' &&
          bytes(bodyEnd + 2) == '\r' && bytes(bodyEnd + 3) == '\n')) return None
      i = bodyEnd + 4
      nRec += 1
      wtype match {
        case "request" => nReq += 1
        case "response" => respBytes += cl
        case "warcinfo" => hasInfo = 1L
        case _ => ()
      }
    }
    if (nRec == 0) None else Some((nRec, nReq, respBytes, hasInfo))
  }

  /** Deterministic REAL WARC payload (plant/parse round-trip, the
    * mm1/mm5/mm6 design): a warcinfo record, a request record when
    * n = |text| is odd (so the walk must skip a variable record set),
    * and a response record whose body is the text bytes and whose
    * Target-URI embeds the doc id — so total payload length is pure
    * arithmetic over n and the DIGIT COUNTS of n and id, which the
    * oracle recomputes; an encoder and parser bug cannot cancel.
    */
  def plantWarcPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val body = r.getString(txtIdx).getBytes("UTF-8")
        val n = body.length
        val sb = new StringBuilder
        sb.append("WARC/1.1\r\n")
          .append("WARC-Type: warcinfo\r\n")
          .append("Content-Length: 16\r\n\r\n")
          .append("software: graft\n")
          .append("\r\n\r\n")
        if (n % 2 == 1)
          sb.append("WARC/1.1\r\n")
            .append("WARC-Type: request\r\n")
            .append("Content-Length: 14\r\n\r\n")
            .append("GET / HTTP/1.1")
            .append("\r\n\r\n")
        sb.append("WARC/1.1\r\n")
          .append("WARC-Type: response\r\n")
          .append(s"WARC-Target-URI: http://x/$id\r\n")
          .append(s"Content-Length: $n\r\n\r\n")
        val head = sb.toString.getBytes("US-ASCII")
        val payload = new Array[Byte](head.length + n + 4)
        System.arraycopy(head, 0, payload, 0, head.length)
        System.arraycopy(body, 0, payload, head.length, n)
        payload(head.length + n) = '\r'; payload(head.length + n + 1) = '\n'
        payload(head.length + n + 2) = '\r'; payload(head.length + n + 3) = '\n'
        Row(id, payload)
      }
    }(Encoders.row(out))
  }

  // ---- tar (POSIX ustar) — the ML-dataset shard container
  // (WebDataset ships training shards as plain tar files) ----

  val tarMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_members", LongType),
    StructField("payload_bytes", LongType),
    StructField("txt_bytes", LongType),
    StructField("total_bytes", LongType)))

  /** Walk a ustar archive: 512-byte headers (name, 12-char octal size,
    * 8-char octal checksum, `ustar` magic), size-rounded data blocks,
    * two zero blocks at the end. The checksum is RECOMPUTED (header
    * bytes with the checksum field as spaces) and must match — a
    * corrupted shard fails loudly, the property a training-data loader
    * needs. Hostile guards (each rejects the payload): non-octal size
    * or checksum, size past Int.MaxValue or past the buffer, missing
    * terminator, non-zero bytes after it, or a header without the
    * magic.
    *
    * Returns (n_members, Σ member sizes, size of the first `.txt`
    * member or 0).
    */
  def parseTar(bytes: Array[Byte]): Option[(Long, Long, Long)] =
    parseTarMembers(bytes).map { ms =>
      (ms.size.toLong, ms.map(_._2).sum,
        ms.find(_._1.endsWith(".txt")).map(_._2).getOrElse(0L))
    }

  /** The member walk behind [[parseTar]]: every (name, size) in archive
    * order, with the same checksum verification and hostile guards.
    * Member-grain is what the WebDataset pairing rule needs — samples
    * are members grouped by basename key.
    */
  def parseTarMembers(bytes: Array[Byte]): Option[Seq[(String, Long)]] = {
    def isZeroBlock(off: Int): Boolean = {
      var i = off
      while (i < off + 512) { if (bytes(i) != 0) return false; i += 1 }
      true
    }
    def octal(off: Int, len: Int): Option[Long] = {
      var s = 0; var e = len
      while (s < e && (bytes(off + s) == ' ' || bytes(off + s) == 0)) s += 1
      while (e > s && (bytes(off + e - 1) == ' ' || bytes(off + e - 1) == 0)) e -= 1
      if (s == e) return None
      var v = 0L
      var i = s
      while (i < e) {
        val c = bytes(off + i)
        if (c < '0' || c > '7') return None
        v = v * 8 + (c - '0')
        if (v > Int.MaxValue) return None
        i += 1
      }
      Some(v)
    }
    if (bytes.length % 512 != 0) return None
    var off = 0
    val members = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    while (off + 512 <= bytes.length && !isZeroBlock(off)) {
      // magic "ustar" at 257
      if (off + 512 > bytes.length) return None
      if (!(bytes(off + 257) == 'u' && bytes(off + 258) == 's' &&
          bytes(off + 259) == 't' && bytes(off + 260) == 'a' &&
          bytes(off + 261) == 'r')) return None
      val size = octal(off + 124, 12).getOrElse(return None)
      val stored = octal(off + 148, 8).getOrElse(return None)
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) ' '.toLong
                else bytes(off + i).toLong & 0xff)
        i += 1
      }
      if (sum != stored) return None
      val nameEnd = {
        var j = off
        while (j < off + 100 && bytes(j) != 0) j += 1
        j
      }
      val name = new String(bytes, off, nameEnd - off, "US-ASCII")
      val blocks = ((size + 511) / 512).toInt
      if (off + 512 + blocks.toLong * 512 > bytes.length) return None
      members += ((name, size))
      off += 512 + blocks * 512
    }
    // require the two-zero-block terminator and nothing but zeros after
    if (off + 1024 > bytes.length) return None
    var i = off
    while (i < bytes.length) { if (bytes(i) != 0) return None; i += 1 }
    if (members.isEmpty) None else Some(members.toSeq)
  }

  val tarMemberSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("member_idx", LongType),
    StructField("name", StringType),
    StructField("key", StringType),
    StructField("role", StringType),
    StructField("size", LongType)))

  /** Member-grain tar decode with the WebDataset pairing columns: key =
    * basename before the last extension, role = the extension — samples
    * are all members sharing a key ((img, txt) pairs and friends).
    * Malformed archives yield one NULL-member row, same posture as the
    * other decoders.
    */
  def decodeTarMembers(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        parseTarMembers(r.getAs[Array[Byte]](binIdx)) match {
          case Some(ms) => ms.zipWithIndex.map { case ((name, size), i) =>
            val dot = name.lastIndexOf('.')
            val (key, role) =
              if (dot > 0) (name.substring(0, dot), name.substring(dot + 1))
              else (name, "")
            Row(id, (i + 1).toLong, name, key, role, size)
          }
          case None => Seq(Row(id, null, null, null, null, null))
        }
      }
    }(Encoders.row(tarMemberSchema))
  }

  /** Deterministic REAL ustar payload (plant/parse round-trip): a
    * `d<id>.txt` member whose body is the text, plus — on odd n — a
    * 20-byte `d<id>.bin` member so the member count varies; headers
    * carry true octal sizes and VALID recomputed checksums, so the
    * parser's checksum verification path is exercised on every row.
    * Total size is pure 512-block arithmetic over n the oracle
    * recomputes.
    */
  def plantTarPayload(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val body = r.getString(txtIdx).getBytes("UTF-8")
        val n = body.length
        def header(name: String, size: Int): Array[Byte] = {
          val h = new Array[Byte](512)
          val nm = name.getBytes("US-ASCII")
          System.arraycopy(nm, 0, h, 0, nm.length)
          def put(off: Int, s: String): Unit = {
            val b = s.getBytes("US-ASCII")
            System.arraycopy(b, 0, h, off, b.length)
          }
          put(100, "0000644 ") // mode
          put(108, "0000000 ") // uid
          put(116, "0000000 ") // gid
          put(124, f"$size%011o" + " ") // size, 11 octal digits + NUL
          put(136, "00000000000 ") // mtime
          h(156) = '0' // typeflag: regular file
          put(257, "ustar ") // magic
          put(263, "00") // version
          java.util.Arrays.fill(h, 148, 156, ' '.toByte)
          var sum = 0L
          for (i <- 0 until 512) sum += h(i).toLong & 0xff
          put(148, f"$sum%06o" + "  ")
          h
        }
        def blocks(size: Int) = (size + 511) / 512 * 512
        val members = Seq(("d" + id + ".txt", body)) ++
          (if (n % 2 == 1) Seq(("d" + id + ".bin", Array.fill[Byte](20)(0x42)))
           else Seq.empty)
        val total = members.map { case (_, b) => 512 + blocks(b.length) }.sum + 1024
        val payload = new Array[Byte](total)
        var off = 0
        for ((name, b) <- members) {
          System.arraycopy(header(name, b.length), 0, payload, off, 512)
          System.arraycopy(b, 0, payload, off + 512, b.length)
          off += 512 + blocks(b.length)
        }
        Row(id, payload)
      }
    }(Encoders.row(out))
  }

  /** Parsed tar metadata: member count, payload bytes, text-member
    * bytes, container size — what a shard-oriented loader inventories
    * before reading any member.
    */
  def decodeTarMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        parseTar(bytes) match {
          case Some((n, payload, txt)) =>
            Row(id, n, payload, txt, bytes.length.toLong)
          case None => Row(id, null, null, null, null)
        }
      }
    }(Encoders.row(tarMetaSchema))
  }

  /** Parsed WARC metadata: record/request counts, response payload
    * bytes, warcinfo presence, and the container size — the columns a
    * crawl-ingestion pipeline partitions and filters on before any
    * HTML parsing.
    */
  def decodeWarcMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        parseWarc(bytes) match {
          case Some((nRec, nReq, respBytes, hasInfo)) =>
            Row(id, nRec, nReq, respBytes, hasInfo, bytes.length.toLong)
          case None => Row(id, null, null, null, null, null)
        }
      }
    }(Encoders.row(warcMetaSchema))
  }
}
