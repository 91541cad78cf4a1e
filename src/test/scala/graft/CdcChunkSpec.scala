package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** contentDefinedChunks: reconstruction, hand-computed boundaries, the
  * degenerate constant-symbol stream, and the edit-locality property
  * that is the POINT of content-defined (vs fixed-size) chunking.
  */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(docs: Seq[(Long, String)]): Map[Long, Seq[(Long, String)]] =
    Dedup.contentDefinedChunks(docs.toDF("id", "txt"), "id", "txt")
      .select("id", "chunk_idx", "chunk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).map(c => (c._2, c._3)).toSeq).toMap

  /** reference single-threaded chunker — same hash, same rule */
  private def refCuts(s: String, w: Int = 4, b: Int = 31, m: Int = 16): Seq[Int] = {
    val inner = (w to s.length).filter { j =>
      val h = (0 until w).map(i => s.charAt(j - 1 - i).toLong *
        math.pow(b.toDouble, i.toDouble).toLong).sum
      h % m == 0
    }
    if (s.isEmpty) Seq.empty else (inner :+ s.length).distinct
  }

  test("chunks concatenate back to the text and match the reference walk") {
    val docs = Seq(
      1L -> "key agg row scan slow fast table value part hash",
      2L -> "abcdefghijklmnopqrstuvwxyz0123456789",
      3L -> "abc", // shorter than the window: one chunk
      4L -> "")    // empty: zero chunks
    val got = chunksOf(docs)
    for ((id, txt) <- docs) {
      val cs = got.getOrElse(id, Seq.empty)
      assert(cs.map(_._2).mkString == txt, s"doc $id reconstruction")
      assert(cs.map(_._1) == (1 to cs.size).map(_.toLong), s"doc $id idx")
      val cuts = refCuts(txt)
      assert(cs.size == cuts.size, s"doc $id chunk count")
      val ref = cuts.zip(0 +: cuts.dropRight(1)).map { case (e, s0) => txt.substring(s0, e) }
      assert(cs.map(_._2) == ref, s"doc $id chunk bytes")
    }
    assert(!got.contains(4L))
  }

  test("constant-symbol stream: every position past the window is a boundary") {
    // 'aaaa' hashes to 97 * (1+31+961+29791) = 97*32784, and 32784 % 16 == 0
    val got = chunksOf(Seq(1L -> ("a" * 10)))(1L).map(_._2)
    assert(got == Seq("aaaa") ++ Seq.fill(6)("a"))
  }

  test("edit locality: a prefix edit leaves chunks after the window identical") {
    val tail = "key agg row scan slow fast table value part hash merge batch"
    val a = "XXXX" + tail
    val b = "YYYYYYY" + tail // different length prefix too (shifts positions)
    val got = chunksOf(Seq(1L -> a, 2L -> b))
    val ca = got(1L).map(_._2)
    val cb = got(2L).map(_._2)
    // fixed-size blocks would share nothing after a length-changing edit;
    // content-defined chunks re-align: all but the first few chunks agree
    val sharedSuffix = ca.reverse.zip(cb.reverse).takeWhile { case (x, y) => x == y }
    assert(sharedSuffix.size >= ca.size - 3,
      s"expected re-alignment, got ${ca.mkString("|")} vs ${cb.mkString("|")}")
  }

  test("chunk-dedup apply: unique corpus unchanged, exact dup fully cut") {
    val docs = Seq(
      (1L, "key agg row scan slow fast table value part hash merge batch"),
      (2L, "key agg row scan slow fast table value part hash merge batch"),
      (3L, "zz completely different content qq")).toDF("doc_id", "text")
    val ch = Dedup.contentDefinedChunks(docs, "doc_id", "text")
      .select(col("doc_id"), col("chunk_idx"), col("chunk"),
        md5(col("chunk")).as("fp"),
        (col("doc_id") * 1000000L + col("chunk_idx")).as("grank"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val kept = ch.withColumn("keep",
        col("grank") === min(col("grank")).over(w))
      .filter(col("keep"))
      .groupBy("doc_id")
      .agg(concat_ws("", sort_array(collect_list(struct(col("chunk_idx"),
        col("chunk")))).getField("chunk").cast("array<string>")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 (first occurrence everywhere) survives byte-identical;
    // doc 2 is an exact duplicate -> every chunk cut; doc 3 untouched
    assert(kept(1L) ==
      "key agg row scan slow fast table value part hash merge batch")
    assert(!kept.contains(2L) || kept(2L).isEmpty)
    assert(kept(3L) == "zz completely different content qq")
  }

  test("extra input columns pass through") {
    val df = Seq((1L, "src1", "key agg row scan slow fast table value"))
      .toDF("id", "source", "txt")
    val out = Dedup.contentDefinedChunks(df, "id", "txt")
    assert(out.columns.toSeq ==
      Seq("id", "source", "txt", "chunk_idx", "chunk"))
    assert(out.select("source").distinct().collect().map(_.getString(0)).toSeq
      == Seq("src1"))
  }
}
