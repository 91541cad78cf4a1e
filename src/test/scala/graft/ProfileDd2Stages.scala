package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables
import scala.collection.mutable.ArrayBuffer

/** Stage-level timeline of one warm dd2 execution (fan-out form): for
  * each stage, submission→completion wall ms and task count — names the
  * scheduling/idle gaps the per-stage sums cannot see (guide §1/§7).
  *
  *   Test/runMain graft.ProfileDd2Stages [sfDir]
  */
object ProfileDd2Stages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val cores = spark.sparkContext.defaultParallelism

    def fanOut(df: DataFrame): DataFrame = df.repartition(cores)
    def run(): Long = Dedup.minHashDedup(docs, "doc_id", "text").count()

    // warm
    (1 to 3).foreach(_ => run())

    case class St(id: Int, name: String, sub: Long, done: Long, tasks: Int)
    val stages = ArrayBuffer[St]()
    val jobs = ArrayBuffer[(Int, Long, Long)]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stSub = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stSub.put(s.stageInfo.stageId, System.nanoTime())
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val sub = Option(stSub.get(s.stageInfo.stageId)).getOrElse(0L)
        stages.synchronized {
          stages += St(s.stageInfo.stageId, s.stageInfo.name.takeWhile(_ != '\n').take(40),
            sub, System.nanoTime(), s.stageInfo.numTasks)
        }
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = Option(jobStart.get(j.jobId)).getOrElse(0L)
        jobs.synchronized { jobs += ((j.jobId, st, System.nanoTime())) }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    run()
    val t1 = System.nanoTime()
    Thread.sleep(300) // let listener drain
    spark.sparkContext.removeSparkListener(listener)

    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(f"whole_ms=${(t1 - t0) / 1e6}%.1f")
    jobs.sortBy(_._2).foreach { case (id, s, e) =>
      raw.println(f"job $id%3d start=${(s - t0) / 1e6}%8.1f end=${(e - t0) / 1e6}%8.1f dur=${(e - s) / 1e6}%7.1f ms")
    }
    stages.sortBy(_.sub).foreach { s =>
      raw.println(f"stage ${s.id}%3d sub=${(s.sub - t0) / 1e6}%8.1f done=${(s.done - t0) / 1e6}%8.1f dur=${(s.done - s.sub) / 1e6}%7.1f ms tasks=${s.tasks}%3d  ${s.name}")
    }
    spark.stop()
    sys.exit(0)
  }
}
