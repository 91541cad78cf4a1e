package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Is fp1's md5 chain actually executing per row, and what does it cost?
  * Times k-round chains over spark.range at the session core count vs 1
  * partition (guide §1).
  *
  *   Test/runMain graft.ProfileFp1
  */
object ProfileFp1 {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("/root/testdata/sf0.1")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(n: Int)(f: => Unit): Double = Seq.fill(n)(timed(f)).min

    def chain(k: Int, parts: Int): Double = {
      val df = spark.range(0, 600000, 1, parts)
      val seed = concat(col("id").cast(StringType), lit("|x"))
      val h = (1 to k).foldLeft(md5(seed))((c, _) => md5(c))
      val q = df.select(h.as("h"))
        .agg(sum(conv(substring(col("h"), 1, 8), 16, 10).cast(LongType)))
      q.collect() // warm
      minOf(5)(df.select(h.as("h"))
        .agg(sum(conv(substring(col("h"), 1, 8), 16, 10).cast(LongType)))
        .collect())
    }

    val c0p32 = chain(0, 32)
    val c12p32 = chain(12, 32)
    val c48p32 = chain(48, 32)
    val c48p1 = chain(48, 1)
    val c48p8 = chain(48, 8)
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(f"""{"metric":"fp1_probe","k0_p32":$c0p32%.4f,"k12_p32":$c12p32%.4f,"k48_p32":$c48p32%.4f,"k48_p1":$c48p1%.4f,"k48_p8":$c48p8%.4f}""")
    spark.stop()
    sys.exit(0)
  }
}
