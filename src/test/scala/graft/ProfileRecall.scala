package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Scratch: recall@10 curves for LSH/IVF ANN over the real embeddings
  * (Test/runMain graft.ProfileRecall [sfDir]).
  */
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, dir, "embeddings").cache()
    emb.count()
    val queryIds = Seq(0L, 7L, 42L, 99L, 123L)
    val queries = queryIds.map { id =>
      id -> emb.filter(col("vec_id") === id).select("embedding")
        .head().getSeq[Float](0).toArray
    }

    def exact(id: Long, q: Array[Float]) =
      Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= id), "embedding", "vec_id", q, 10)
        .collect().map(_.getLong(0)).toSet

    val exacts = queries.map { case (id, q) => id -> exact(id, q) }.toMap

    for (nbits <- Seq(4, 6, 8); seed <- Seq(42L, 1L, 2L)) {
      val recalls = queries.map { case (id, q) =>
        val got = Similarity.lshTopK(emb.filter(col("vec_id") =!= id),
          "embedding", "vec_id", q, 10, nbits = nbits, seed = seed)
          .collect().map(_.getLong(0)).toSet
        got.intersect(exacts(id)).size / 10.0
      }
      println(f"LSH nbits=$nbits seed=$seed recall@10 mean=${recalls.sum / recalls.size}%.2f min=${recalls.min}%.2f")
    }

    for (k <- Seq(8, 16); nprobe <- Seq(2, 3, 4, 6)) {
      val centroids = Similarity.trainIvfCentroids(emb, "embedding", "vec_id", k = k, iters = 3)
      val recalls = queries.map { case (id, q) =>
        val got = Similarity.ivfTopK(emb.filter(col("vec_id") =!= id),
          "embedding", "vec_id", q, 10, centroids, nprobe = nprobe)
          .collect().map(_.getLong(0)).toSet
        got.intersect(exacts(id)).size / 10.0
      }
      println(f"IVF k=$k nprobe=$nprobe recall@10 mean=${recalls.sum / recalls.size}%.2f min=${recalls.min}%.2f")
    }
    spark.stop()
  }
}
