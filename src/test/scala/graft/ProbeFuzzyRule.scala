package graft

import org.apache.spark.sql.functions._

/** Measure FuzzyJoinRewrite: the same declarative levenshtein<=1 join,
  * rewritten (blocked equi-join) vs the nested-loop shape Spark plans
  * without the rule (approximated by lev<=2 minus the unmatched rows —
  * we just time the <=2 nested loop as the quadratic reference).
  */
object ProbeFuzzyRule {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val l = graft.sources.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("lid"),
        md5(concat(lit("L"), col("o_orderkey").cast("string")))
          .substr(lit(1), lit(5) + pmod(col("o_orderkey"), lit(2))).as("ls"))
    val r = graft.sources.Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("rid"),
        md5(concat(lit("R"), col("c_custkey").cast("string")))
          .substr(lit(1), lit(5) + pmod(col("c_custkey"), lit(2))).as("rs"))
    println(s"sides: ${l.count()} x ${r.count()}")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    time("warmup blocked")(l.join(r, levenshtein(col("ls"), col("rs")) <= 1).count())
    time("blocked (rule)")(l.join(r, levenshtein(col("ls"), col("rs")) <= 1).count())
    time("nested loop (<=2 ref)")(l.join(r, levenshtein(col("ls"), col("rs")) <= 2).count())
    spark.stop()
  }
}
