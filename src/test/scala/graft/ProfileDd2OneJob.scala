package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Can dd2 run as ONE action? The shipped shape eagerly checkpoints the
  * candidate pairs (3 consumers) and the shingle sets (2 consumers) —
  * three driver-blocking jobs per execution. AQE dedups query stages by
  * canonical plan, so a single action whose plan references the same
  * subtree N times materializes its exchange once (ReusedQueryStage /
  * ReusedExchange) IF the references canonicalize equal. This probe
  * builds the one-action form, verifies the pair set matches the
  * shipped output, counts how many times the signature kernel's scan
  * stage actually ran (via an accumulator in the kernel path), and
  * times both.
  *
  *   Test/runMain graft.ProfileDd2OneJob [sfDir]
  */
object ProfileDd2OneJob {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")

    def oneJob(): DataFrame = {
      val cands = Dedup.lshCandidates(Dedup.minHashBands(docs, "doc_id", "text"))
      val ids = cands.select(col("ida").as("id"))
        .union(cands.select(col("idb").as("id")))
      val sets = docs.select(col("doc_id").as("id"), col("text"))
        .join(ids, Seq("id"), "left_semi")
        .select(col("id"), Dedup.wordShingles(col("text"), 3).as("grams"))
      val a = cands.join(sets, cands("ida") === sets("id"))
        .withColumnRenamed("grams", "ga").drop("id")
      val b = a.join(sets, a("idb") === sets("id"))
        .withColumnRenamed("grams", "gb").drop("id")
      b.withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
        .withColumn("na", size(col("ga")))
        .withColumn("nb", size(col("gb")))
        .filter(col("inter") * 5 >= (col("na") + col("nb") - col("inter")) * 4)
        .select("ida", "idb")
    }

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shipped = pairSet(Dedup.minHashDedup(docs, "doc_id", "text"))
    val one = pairSet(oneJob())
    require(shipped == one, s"mismatch: shipped=${shipped.size} one=${one.size}")

    // how many stage materializations share vs recompute: inspect the
    // executed plan for Reused* nodes and count kernel scans
    val q = oneJob().groupBy().count()
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val reused = "Reused".r.findAllIn(plan).length
    val kernels = "SerializeFromObject".r.findAllIn(plan).length

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(n: Int)(f: => Unit): Double = Seq.fill(n)(timed(f)).min
    Seq.fill(2)(Dedup.minHashDedup(docs, "doc_id", "text").count())
    val w0 = minOf(5)(Dedup.minHashDedup(docs, "doc_id", "text").count())
    Seq.fill(2)(oneJob().count())
    val w1 = minOf(5)(oneJob().count())

    val json =
      f"""{"metric":"dd2_onejob","sf":"$sfDir","pairs":${one.size},""" +
        f""""reused_nodes":$reused,"kernel_nodes":$kernels,""" +
        f""""v0_shipped_sec":$w0%.4f,"one_action_sec":$w1%.4f}"""
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
    spark.stop()
    sys.exit(0)
  }
}
