package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.sources.Tables

/** Measure composed-HOF vs native-expression cosine (Test/runMain). */
object ProfileCosine {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings").cache()
    emb.count()
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ida") < col("idb"))
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("HOF cosine   ") {
      pairs.filter(VectorOps.cosine(col("va"), col("vb")) >= 0.4).count()
    }
    time("native cosine") {
      pairs.filter(VectorOps.cosineNative(col("va"), col("vb")) >= 0.4).count()
    }
    spark.stop()
  }
}
