package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** q5/q3 runtime-Bloom shootout at a bench replica: a Bloom of the
  * gated side's orderkeys pre-filtering the fact scan of a BROADCAST
  * join, against the bare hash-relation probe, interleaved in ONE
  * session so page cache and JIT are shared. Round-14 verdict at
  * /tmp/bsx1000 (600M rows, 48g heap): the bare plan WINS at every fpp
  * (q5 5.08s bare vs 6.31/6.54/8.34s at fpp .25/.1/.5; q3 6.84s bare
  * vs 6.95/7.26/7.96s) — the sketch probe (2 Murmur runs + k scattered
  * reads) costs more than the single codegen'd relation lookup it
  * shields, which is why production q3/q5 run BARE on the broadcast
  * path and RuntimeFilters.shuffleGuard arms only past the gate.
  *
  *   Test/runMain graft.ProfileQ5Bloom [sfDir]   (default /tmp/bsx1000)
  */
object ProfileQ5Bloom {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    sources.Tables.load(s, dir, name)
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast(LongType)

  /** The q5 plan with the Bloom push toggled; `gate` forces the
    * broadcast decision (0 = refuse → the production shuffle-join
    * fallback, measured bare vs guarded — the round-15 directive).
    */
  def q5(s: SparkSession, dir: String, bloom: Option[Double],
      gate: Long = graft.operators.Broadcasts.UseSessionDefault): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val asiaKeys = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("_asia_nk"))
    val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(asiaKeys),
        col("c_nationkey") === col("_asia_nk"), "left_semi")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val ocG = graft.operators.Broadcasts.gatedStats(
      o.join(broadcast(c), c("c_custkey") === o("o_custkey"))
        .select("o_orderkey", "c_nationkey"), maxBytes = gate)
    val oc = ocG.df
    val ocRows = ocG.rows
    val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val l0 = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val l = bloom.map(fpp => graft.operators.RuntimeFilters.keyFilter(
      l0, "l_orderkey", oc, "o_orderkey", ocRows, fpp)).getOrElse(l0)
    l.join(oc, oc("o_orderkey") === l("l_orderkey"))
      .join(broadcast(su),
        su("s_suppkey") === l("l_suppkey") && su("s_nationkey") === col("c_nationkey"))
      .join(broadcast(n), n("n_nationkey") === su("s_nationkey"))
      .join(broadcast(r), r("r_regionkey") === n("n_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
      .orderBy(desc_nulls_last("revenue_c"), asc_nulls_first("n_name"))
  }

  /** The q3 plan with the Bloom push toggled (same gate knob). */
  def q3(s: SparkSession, dir: String, bloom: Option[Double],
      gate: Long = graft.operators.Broadcasts.UseSessionDefault): DataFrame = {
    val c = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1996-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val ocG = graft.operators.Broadcasts.gatedStats(
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "o_orderdate"), maxBytes = gate)
    val oc = ocG.df
    val ocRows = ocG.rows
    val l0 = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-03-15"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val l = bloom.map(fpp => graft.operators.RuntimeFilters.keyFilter(
      l0, "l_orderkey", oc, "o_orderkey", ocRows, fpp)).getOrElse(l0)
    l.join(oc, l("l_orderkey") === oc("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
      .orderBy(desc_nulls_last("revenue_c"), asc_nulls_first("o_orderkey"))
      .limit(10)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/bsx1000"
    val spark = Bench.session(dir)
    spark.sparkContext.setLogLevel("ERROR")
    val fpps = Seq(0.5, 0.25, 0.1)
    val variants: Seq[(String, () => DataFrame)] =
      (fpps.map(f => s"q5_bloom@$f" -> (() => q5(spark, dir, Some(f)))) :+
        ("q5_bare" -> (() => q5(spark, dir, None)))) ++
      (fpps.map(f => s"q3_bloom@$f" -> (() => q3(spark, dir, Some(f)))) :+
        ("q3_bare" -> (() => q3(spark, dir, None)))) ++
      // the SHUFFLE path (gate forced shut = the past-pin-budget
      // fallback): where the guard's arithmetic says it should pay —
      // the sketch saves serialize+write+read per dropped fact row
      Seq[(String, () => DataFrame)](
        "q5_shuffle_bare" -> (() => q5(spark, dir, None, gate = 0L)),
        "q5_shuffle_guard@0.05" ->
          (() => q5(spark, dir, Some(0.05), gate = 0L)),
        "q3_shuffle_bare" -> (() => q3(spark, dir, None, gate = 0L)),
        "q3_shuffle_guard@0.05" ->
          (() => q3(spark, dir, Some(0.05), gate = 0L)))
    // one warmup each (page cache + gated materialization + sketch)
    variants.foreach { case (name, fn) =>
      val n = fn().count(); println(s"[bloomprobe] $name warmup rows=$n")
    }
    val rows = variants.map { case (name, fn) =>
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        fn().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bloomprobe] $name%-9s min=${times.min}%.2fs runs=${times.map(x => f"$x%.2f").mkString(",")}")
      val runs = times.map(x => f"$x%.3f").mkString("[", ",", "]")
      f""""$name":{"min_sec":${times.min}%.3f,"runs":$runs}"""
    }
    val json =
      s"""{"metric":"q5q3_bloom_shootout","replica":"$dir",""" +
      s""""verdict":"bare broadcast probe wins at every fpp - the sketch """ +
      s"""guards only the shuffle path (RuntimeFilters.shuffleGuard); """ +
      s"""shuffle rows measure that path with the gate forced shut",""" +
      s""""variants":{${rows.mkString(",")}}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/BLOOMGUARD_MEASURE.json"),
      json + "\n")
    spark.stop()
  }
}
