package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Scratch: ANN query cost vs corpus size (Test/runMain, arg = sf dir).
  * Reports brute-force / LSH / IVF top-10 latency and recall on the
  * same corpus.
  */
object ProfileAnnScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx10")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, dir, "embeddings").cache()
    println("corpus: " + emb.count())
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val rest = emb.filter(col("vec_id") =!= 0)

    def time(name: String)(f: => Set[Long]): Set[Long] = {
      f // warm
      var last: Set[Long] = Set.empty
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        last = f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${times.min}%.3f s")
      last
    }

    val exact = time("brute-force top-10") {
      Similarity.bruteForceTopK(rest, "embedding", "vec_id", query, 10)
        .collect().map(_.getLong(0)).toSet
    }
    val lsh = time("LSH top-10 (nbits=4)") {
      Similarity.lshTopK(rest, "embedding", "vec_id", query, 10)
        .collect().map(_.getLong(0)).toSet
    }
    val t0 = System.nanoTime()
    val centroids = Similarity.trainIvfCentroids(emb, "embedding", "vec_id", k = 8, iters = 3)
    println(f"IVF train (k=8, 3 iters): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val ivf = time("IVF top-10 (nprobe=6)") {
      Similarity.ivfTopK(rest, "embedding", "vec_id", query, 10, centroids, nprobe = 6)
        .collect().map(_.getLong(0)).toSet
    }
    println(s"recall@10: lsh=${lsh.intersect(exact).size / 10.0} ivf=${ivf.intersect(exact).size / 10.0}")

    // the amortized shape: bucket column MATERIALIZED once as the
    // partition key — a query prunes to nbits+1 of 2^nbits partitions
    // at the file index, never touching the rest of the corpus
    val planes = Similarity.hyperplanes(64, 4)
    val idxPath = "/tmp/ann_idx"
    emb.withColumn("bucket", Similarity.lshBucket(col("embedding"), planes))
      .write.mode("overwrite").partitionBy("bucket").parquet(idxPath)
    val idx = spark.read.parquet(idxPath)
    val qBits = planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(query).map { case (a, b) => a * b.toDouble }.sum >= 0.0) 1L << i else 0L
    }.sum
    val probes = qBits +: (0 until 4).map(i => qBits ^ (1L << i))
    val pre = time("pre-bucketed probe top-10 (partition-pruned)") {
      Similarity.bruteForceTopK(
        idx.filter(col("bucket").isin(probes: _*) && col("vec_id") =!= 0),
        "embedding", "vec_id", query, 10)
        .collect().map(_.getLong(0)).toSet
    }
    println(s"recall@10: prebucketed=${pre.intersect(exact).size / 10.0}")
    spark.stop()
  }
}
