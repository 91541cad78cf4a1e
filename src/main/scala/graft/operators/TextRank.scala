package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TextRank keyword scoring (Mihalcea & Tarau 2004, "TextRank: Bringing
  * Order into Text" — public algorithm): PageRank power iteration over
  * the word co-occurrence graph (adjacent-word edges, symmetric,
  * weighted by corpus frequency). All-integer fixed-point arithmetic —
  * rank in micro-units, per-edge contribution `r·w div W` then
  * `0.15·SCALE + 0.85·Σ div` — so every iteration is exactly
  * SQL-replayable and independent of summation order.
  *
  * Scale shape: one explode + hash aggregate builds the edge list
  * (vocabulary² bounded, co-occurrence sparse); each iteration is one
  * equi-join of the rank table (vocabulary-sized) against the edges plus
  * a hash aggregate — partial sums combine map-side; the rank table is
  * persisted per iteration so lineage stays linear in k, not
  * exponential. Nothing visits the driver.
  */
object TextRank {

  val Scale = 1000000L

  /** symmetric weighted co-occurrence edges from adjacent words */
  def wordEdges(docs: DataFrame, textCol: String): DataFrame = {
    val pairs = docs
      .select(explode(Dedup.wordShingles(col(textCol), 2)).as("bg"))
      .select(split(col("bg"), " ").getItem(0).as("a"),
        split(col("bg"), " ").getItem(1).as("b"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
    pairs.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst"), col("w")))
      .groupBy("src", "dst").agg(sum("w").as("w"))
  }

  /** `iters` power iterations; returns (word, rank) in micro-units */
  def textRank(docs: DataFrame, textCol: String, iters: Int): DataFrame = {
    val edges = wordEdges(docs, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wsum = edges.groupBy("src").agg(sum("w").as("wtot"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = wsum.select(col("src").as("word"), lit(Scale).as("r"))
    for (_ <- 1 to iters) {
      val next = edges
        .join(ranks.withColumnRenamed("word", "src"), "src")
        .join(wsum, "src")
        .select(col("dst"), expr("r * w div wtot").as("c"))
        .groupBy("dst")
        .agg(expr(s"${15L * Scale / 100L} + 85 * sum(c) div 100").as("r"))
        .select(col("dst").as("word"), col("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before unpersisting the previous table
      ranks.unpersist()
      ranks = next
    }
    ranks
  }

  /** top-k keywords by rank (ties by word) */
  def keywords(docs: DataFrame, textCol: String, iters: Int, k: Int): DataFrame =
    textRank(docs, textCol, iters)
      .orderBy(desc("r"), asc("word")).limit(k)
}
