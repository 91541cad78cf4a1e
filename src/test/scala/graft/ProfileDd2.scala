package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch profiler for the dd2 pipeline stages (Test/runMain). */
object ProfileDd2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents").cache()
    println("docs: " + docs.count())

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val bands = time("minHashBands") {
      val b = Dedup.minHashBands(docs, "doc_id", "text")
      b.count(); b
    }
    val cands = time("lshCandidates") {
      val c = Dedup.lshCandidates(bands).cache()
      println("  candidates: " + c.count()); c
    }
    time("verifyJaccard") {
      Dedup.verifyJaccard(cands, docs, "doc_id", "text").count()
    }
    time("full dd2 (default 64/16)") {
      Dedup.minHashDedup(docs, "doc_id", "text").count()
    }
    time("full dd2 (128 hashes / 32 bands)") {
      Dedup.minHashDedup(docs, "doc_id", "text", numHashes = 128, bands = 32).count()
    }
    val a = Dedup.minHashDedup(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.minHashDedup(docs, "doc_id", "text", numHashes = 128, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"64/16 pairs=${a.size}, 128/32 pairs=${b.size}, equal=${a == b}")
    spark.stop()
  }
}
