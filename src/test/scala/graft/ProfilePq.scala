package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Scratch profiler for the PQ pipeline stages (Test/runMain). */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.load(spark, dir, "embeddings").cache()
    println("vecs: " + emb.count())
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val query = emb.filter(col("vec_id") === 3)
      .select("embedding").head().getSeq[Float](0).toArray
    val base = emb.filter(col("vec_id") =!= 3)
    val books = time("trainPqCodebooks") {
      Similarity.trainPqCodebooks(base, "embedding", "vec_id")
    }
    time("pqEncode count") {
      Similarity.pqEncode(base, "embedding", "vec_id", books).count()
    }
    time("pqTopK exhaustive") {
      Similarity.pqTopK(base, "embedding", "vec_id", query, 10, books,
        rerank = base.count().toInt).count()
    }
    time("pqTopK rerank=50") {
      Similarity.pqTopK(base, "embedding", "vec_id", query, 10, books).count()
    }
    spark.stop()
  }
}
