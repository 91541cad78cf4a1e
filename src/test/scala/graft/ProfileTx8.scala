package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** tx8 (doc_id, tok) pre-aggregation A/B (VERDICT r17 item 5, guide
  * §2.3 "aggregate before you shuffle"): the shipped form joins every
  * TOKEN row against the count table; the candidate form first
  * collapses tokens to (doc_id, tok, c) so the join and the doc-grain
  * aggregate see one row per distinct (doc, token) — fewer rows through
  * two exchanges, one more exchange total. Asserts identical output,
  * then times both at the given dir.
  *
  *   Test/runMain graft.ProfileTx8 [dir]
  */
object ProfileTx8 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(dir)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")

    def toks = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")

    def shipped(): DataFrame = {
      val counts = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      toks.join(counts, "tok")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(expr("1000000 div n")).as("rarity_sum"))
        .select(col("doc_id"), col("n_tokens"),
          expr("CAST(rarity_sum div n_tokens AS BIGINT)").as("rarity_ppm"))
    }

    def preagg(): DataFrame = {
      val tokc = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val counts = tokc.groupBy("tok").agg(sum(col("c")).as("n"))
      tokc.join(counts, "tok")
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          sum(expr("c * (1000000 div n)")).as("rarity_sum"))
        .select(col("doc_id"), col("n_tokens"),
          expr("CAST(rarity_sum div n_tokens AS BIGINT)").as("rarity_ppm"))
    }

    val a = shipped().orderBy("doc_id").collect().toSeq
    val b = preagg().orderBy("doc_id").collect().toSeq
    require(a == b, s"output mismatch: ${a.size} vs ${b.size}")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(n: Int)(f: => Unit): Double = Seq.fill(n)(timed(f)).min
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    noop(shipped()); noop(preagg()) // warm
    val w1 = minOf(5)(noop(shipped()))
    val w2 = minOf(5)(noop(preagg()))
    val w1b = minOf(5)(noop(shipped()))
    val w2b = minOf(5)(noop(preagg()))
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(f"""{"metric":"tx8_ab","dir":"$dir","rows":${a.size},""" +
      f""""shipped_sec":$w1%.4f,"preagg_sec":$w2%.4f,""" +
      f""""shipped_again_sec":$w1b%.4f,"preagg_again_sec":$w2b%.4f}""")
    spark.stop()
    sys.exit(0)
  }
}
