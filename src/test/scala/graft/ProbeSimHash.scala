package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** One-off probe (Test/runMain): simhash hamming distribution of the TRUE
  * near-dup pairs (word-3-shingle jaccard ≥ 0.8, via the oracle-equal
  * minHashDedup) — sets the guaranteed-recall maxHamming/nChunks operating
  * point for the dd3 simHashDedup gate.
  */
object ProbeSimHash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = Tables.load(spark, dir, "documents").cache()
      val pairs = Dedup.minHashDedup(docs, "doc_id", "text")
      val sigs = Dedup.simHash(docs, "doc_id", "text")
      val h = pairs
        .join(sigs.select(col("id").as("ida"), col("simhash").as("sa")), "ida")
        .join(sigs.select(col("id").as("idb"), col("simhash").as("sb")), "idb")
        .select(bit_count(col("sa").bitwiseXOR(col("sb"))).as("h"))
      val st = h.agg(count(lit(1)).as("n"), max("h"), avg("h")).head()
      println(s"$sf: pairs=${st.getLong(0)} maxHamming=${st.get(1)} avg=${st.get(2)}")
      // distribution tail
      h.groupBy("h").count().orderBy(desc("h")).show(10, truncate = false)
      docs.unpersist()
    }
    spark.stop()
  }
}
