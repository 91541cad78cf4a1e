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
}
