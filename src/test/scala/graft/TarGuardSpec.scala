package graft

import graft.operators.Multimodal

/** Hostile-payload guards for the ustar walk (mm8): checksum and
  * structure violations must reject the archive, never mis-walk it.
  * Fixtures come from the planter itself and are then corrupted, so the
  * guards run against byte-exact real archives.
  */
class TarGuardSpec extends SparkSpec {
  import spark.implicits._

  private def plant(id: Long, text: String): Array[Byte] =
    Multimodal.plantTarPayload(
      Seq((id, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head.getAs[Array[Byte]](1)

  test("tar walk: checksum and structure violations are rejected") {
    val planted = plant(1L, "hello tar world!") // 16 bytes, even: 1 member
    assert(Multimodal.parseTar(planted).contains((1L, 16L, 16L)))
    // flip a header byte -> recomputed checksum mismatch
    val bad = planted.clone(); bad(0) = 'X'
    assert(Multimodal.parseTar(bad).isEmpty)
    // non-octal size field
    val badSize = planted.clone(); badSize(124) = '9'
    assert(Multimodal.parseTar(badSize).isEmpty)
    // truncated: drop the final zero block
    assert(Multimodal.parseTar(planted.dropRight(512)).isEmpty)
    // trailing garbage after the terminator
    val garbage = planted ++ Array.fill[Byte](512)(0x51)
    assert(Multimodal.parseTar(garbage).isEmpty)
    // wrong magic
    val noMagic = planted.clone(); noMagic(257) = 'X'
    assert(Multimodal.parseTar(noMagic).isEmpty)
    // not block-aligned at all
    assert(Multimodal.parseTar("short".getBytes("US-ASCII")).isEmpty)
    // all-zero archive: zero members is not a tar
    assert(Multimodal.parseTar(new Array[Byte](1024)).isEmpty)
  }

  test("tar walk: multi-member archive counts members and finds the txt") {
    // odd length -> the planter adds the 20-byte .bin member
    val planted = plant(7L, "odd-length-body") // 15 bytes
    assert(Multimodal.parseTar(planted).contains((2L, 35L, 15L)))
  }
}
