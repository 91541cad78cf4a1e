package graft

import org.apache.spark.sql.functions._
import graft.operators.Tokenize
import graft.sources.Tables

/** Scratch: BPE training wall-time vs merge count on a replica corpus
  * (Test/runMain, arg = sf dir, default /tmp/sfx10).
  *
  * The thing being measured: each merge stacks a projection onto the
  * symbol frame's lineage, so WITHOUT checkpointing, step k re-derives
  * all k-1 prior merges and per-step cost grows with k. bpeTrain
  * localCheckpoints every 20 merges; this probe measures the marginal
  * per-step cost across 25-step blocks up to 100 merges, checkpointed vs
  * not, and prints one JSON line (committed as BPE_MEASURE.json). Flat
  * checkpointed blocks = the lineage bound works.
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfx10")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val words = Tables.load(spark, dir, "documents")
      .select(explode(split(trim(regexp_replace(col("text"), "\\s+", " ")),
        " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .cache()
    val vocab = words.count()

    def cumulative(steps: Int, checkpointEvery: Int): Double = {
      val t0 = System.nanoTime()
      val merges = Tokenize.bpeTrain(words, "word", "n", steps, checkpointEvery)
      require(merges.size == steps, s"only ${merges.size} merges at $steps")
      (System.nanoTime() - t0) / 1e9
    }

    // the 31-word synthetic vocabulary exhausts at ~87 merges; 80 keeps
    // every block full while still spanning 4 checkpoint intervals
    val marks = Seq(20, 40, 60, 80)
    def blocks(checkpointEvery: Int): Seq[Double] = {
      cumulative(5, checkpointEvery) // warm JIT/codegen on the small prefix
      val cums = marks.map(cumulative(_, checkpointEvery))
      // marginal per-step cost of each 20-step block
      (cums.head +: cums.sliding(2).map(w => w(1) - w(0)).toSeq)
        .map(b => math.round(b / 20 * 1000).toDouble / 1000)
    }

    val ck = blocks(20)
    val un = blocks(0)
    val json =
      s"""{"metric":"bpe_train_per_step_sec","dir":"$dir","vocab":$vocab,""" +
        s""""blocks":[20,40,60,80],"checkpointed_every20":[${ck.mkString(",")}],""" +
        s""""uncheckpointed":[${un.mkString(",")}]}"""
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
    spark.stop()
  }
}
