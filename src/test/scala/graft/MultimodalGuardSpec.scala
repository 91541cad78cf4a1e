package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Hostile-payload guards for the WAV chunk walk: a malformed u32 chunk
  * size must reject the payload, never spin the executor task or
  * divide by zero downstream (the round-trip itself is mm5's oracle row).
  */
class MultimodalGuardSpec extends AnyFunSuite {

  private def wavWithChunk(fourcc: String, size: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put(fourcc.getBytes("US-ASCII")).putInt((size & 0xffffffffL).toInt)
    bb.array()
  }

  test("u32 chunk size >= 2^31 is rejected, not looped on") {
    // size 0xFFFFFFF8: as a signed int the walk's advance is 8 + (-8) = 0
    // — pre-guard this spun forever; now the payload is rejected
    assert(Multimodal.parseWavHeader(wavWithChunk("LIST", 0xFFFFFFF8L)).isEmpty)
    assert(Multimodal.parseWavHeader(wavWithChunk("LIST", 0x80000000L)).isEmpty)
    // sanity: a truncated but well-formed size just ends the walk
    assert(Multimodal.parseWavHeader(wavWithChunk("LIST", 10L)).isEmpty)
  }

  test("zero-channel / zero-bit fmt chunks are rejected before division") {
    def wav(channels: Int, bits: Int, rate: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + 24 + 8 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(40)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1).putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * bits / 8).putShort((channels * bits / 8).toShort)
        .putShort(bits.toShort)
      bb.put("data".getBytes("US-ASCII")).putInt(4)
      bb.putInt(0)
      bb.array()
    }
    assert(Multimodal.parseWavHeader(wav(0, 16, 8000)).isEmpty)
    assert(Multimodal.parseWavHeader(wav(1, 0, 8000)).isEmpty)
    assert(Multimodal.parseWavHeader(wav(1, 16, 0)).isEmpty)
    // 1 channel x 4 bits: blockAlign would be 0 — rejected too
    assert(Multimodal.parseWavHeader(wav(1, 4, 8000)).isEmpty)
    // the well-formed control still parses
    assert(Multimodal.parseWavHeader(wav(2, 16, 8000))
      .contains((2L, 8000L, 16L, 4L)))
  }

  private def mp4(body: java.nio.ByteBuffer => Unit, cap: Int = 256): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(cap) // big-endian default
    bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    body(bb)
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  private def moovMvhd(bb: java.nio.ByteBuffer, ts: Int, dur: Int): Unit = {
    bb.putInt(116).put("moov".getBytes("US-ASCII"))
    bb.putInt(108).put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0).putInt(0).putInt(0).putInt(ts).putInt(dur)
    bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
    bb.putInt(0).putInt(0)
    for (_ <- 0 until 9) bb.putInt(0)
    for (_ <- 0 until 6) bb.putInt(0)
    bb.putInt(2)
  }

  test("mp4 box walk: hostile sizes are rejected, never looped on") {
    // box size smaller than its own header (2..7) — advance would stall
    assert(Multimodal.parseMp4Meta(mp4(bb =>
      bb.putInt(4).put("mdat".getBytes("US-ASCII")))).isEmpty)
    // largesize smaller than its 16-byte header
    assert(Multimodal.parseMp4Meta(mp4(bb =>
      bb.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(8L))).isEmpty)
    // box overrunning the buffer
    assert(Multimodal.parseMp4Meta(mp4(bb =>
      bb.putInt(4096).put("mdat".getBytes("US-ASCII")))).isEmpty)
    // largesize past Int.MaxValue cannot fit a JVM array
    assert(Multimodal.parseMp4Meta(mp4(bb =>
      bb.putInt(1).put("mdat".getBytes("US-ASCII"))
        .putLong(0x100000000L))).isEmpty)
    // not-MP4: first box must be ftyp
    assert(Multimodal.parseMp4Meta("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }

  test("mp4 box walk: well-formed controls parse, incl. largesize and to-EOF") {
    // plain mdat
    val plain = mp4 { bb =>
      moovMvhd(bb, 600, 1200)
      bb.putInt(8 + 4).put("mdat".getBytes("US-ASCII")).putInt(0x55aa55aa)
    }
    assert(Multimodal.parseMp4Meta(plain).contains((600L, 1200L, 4L, 3L)))
    // u64 largesize mdat
    val large = mp4 { bb =>
      moovMvhd(bb, 700, 2100)
      bb.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(16L + 4)
        .putInt(0x55aa55aa)
    }
    assert(Multimodal.parseMp4Meta(large).contains((700L, 2100L, 4L, 3L)))
    // size==0: mdat runs to end of file
    val toEof = mp4 { bb =>
      moovMvhd(bb, 800, 800)
      bb.putInt(0).put("mdat".getBytes("US-ASCII")).putInt(0x55aa55aa)
    }
    assert(Multimodal.parseMp4Meta(toEof).contains((800L, 800L, 4L, 3L)))
  }

  private def warc(s: String) = s.getBytes("US-ASCII")

  test("warc record walk: hostile inputs are rejected, never looped on") {
    // Content-Length past the buffer
    assert(Multimodal.parseWarc(warc(
      "WARC/1.1\r\nWARC-Type: response\r\nContent-Length: 4096\r\n\r\nhi\r\n\r\n")).isEmpty)
    // missing Content-Length entirely
    assert(Multimodal.parseWarc(warc(
      "WARC/1.1\r\nWARC-Type: response\r\n\r\nhi\r\n\r\n")).isEmpty)
    // non-numeric / negative lengths
    assert(Multimodal.parseWarc(warc(
      "WARC/1.1\r\nContent-Length: -2\r\n\r\nhi\r\n\r\n")).isEmpty)
    assert(Multimodal.parseWarc(warc(
      "WARC/1.1\r\nContent-Length: 0x10\r\n\r\nhi\r\n\r\n")).isEmpty)
    // length past Int.MaxValue cannot fit a JVM buffer
    assert(Multimodal.parseWarc(warc(
      "WARC/1.1\r\nContent-Length: 4294967290\r\n\r\nhi\r\n\r\n")).isEmpty)
    // record body not terminated by CRLFCRLF
    assert(Multimodal.parseWarc(warc(
      "WARC/1.1\r\nContent-Length: 2\r\n\r\nhiXXXX")).isEmpty)
    // header line without a colon; not-WARC magic; empty payload
    assert(Multimodal.parseWarc(warc(
      "WARC/1.1\r\nContent-Length 2\r\n\r\nhi\r\n\r\n")).isEmpty)
    assert(Multimodal.parseWarc(warc("HTTP/1.1 200 OK\r\n\r\n")).isEmpty)
    assert(Multimodal.parseWarc(Array.emptyByteArray).isEmpty)
    // trailing garbage after the last record rejects the payload
    assert(Multimodal.parseWarc(warc(
      "WARC/1.1\r\nContent-Length: 2\r\n\r\nhi\r\n\r\nJUNK")).isEmpty)
  }

  test("warc record walk: well-formed multi-record payloads parse") {
    val two = "WARC/1.1\r\nWARC-Type: warcinfo\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n" +
      "WARC/1.1\r\nWARC-Type: response\r\ncontent-length: 5\r\n\r\nhello\r\n\r\n"
    assert(Multimodal.parseWarc(warc(two)).contains((2L, 0L, 5L, 1L)))
    // header-name case-insensitivity + a request record + unknown type
    val three = "WARC/1.1\r\nwarc-type: request\r\nCONTENT-LENGTH: 0\r\n\r\n\r\n\r\n" +
      "WARC/1.1\r\nWARC-Type: metadata\r\nContent-Length: 1\r\n\r\nz\r\n\r\n" +
      "WARC/1.1\r\nWARC-Type: response\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    assert(Multimodal.parseWarc(warc(three)).contains((3L, 1L, 2L, 0L)))
  }
}
