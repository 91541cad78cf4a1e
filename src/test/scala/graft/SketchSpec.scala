package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.sources.Tables

/** Sketch guarantees (operators/Sketches.scala).
  *
  * The MG properties are exercised on MULTI-PARTITION inputs with a
  * sketch size far below the key cardinality — the regime where eviction
  * and partial-merge actually fire (a single-partition or k≥cardinality
  * run degenerates to exact counting and proves nothing).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skewed key stream: key i drawn ∝ 1/(i+1). */
  private def zipfKeys(n: Int, keys: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    val weights = Array.tabulate(keys)(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    Seq.fill(n) {
      val x = rnd.nextDouble() * total
      val i = cum.indexWhere(x <= _)
      s"key_${if (i < 0) keys - 1 else i}"
    }
  }

  test("MG sketch: under-count bounded by n/k, never over-counts, " +
    "heavy keys survive (multi-partition, k << cardinality)") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val n = 20000
      val data = zipfKeys(n, keys = 500, seed)
      val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val k = 50 // 500 distinct keys -> eviction fires constantly
      val summary = spark.createDataset(data).repartition(7)
        .select(new Sketches.MisraGries(k).toColumn).head()
      assert(summary.n === n.toLong)
      assert(summary.counts.size <= k)
      val slack = n.toLong / k
      summary.counts.foreach { case (key, est) =>
        val t = truth(key)
        assert(est <= t, s"seed=$seed $key over-counted: est=$est true=$t")
        assert(t - est <= slack,
          s"seed=$seed $key under-count ${t - est} > n/k=$slack")
      }
      truth.filter(_._2 > slack).keys.foreach { key =>
        assert(summary.counts.contains(key),
          s"seed=$seed heavy key $key (freq=${truth(key)} > n/k=$slack) evicted")
      }
    }
  }

  test("MG sketch: partition layout never changes the guarantee set") {
    val data = zipfKeys(8000, keys = 300, seed = 7L)
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val k = 40
    val slack = data.size.toLong / k
    val heavy = truth.filter(_._2 > slack).keySet
    for (parts <- Seq(1, 3, 13)) {
      val s = spark.createDataset(data).repartition(parts)
        .select(new Sketches.MisraGries(k).toColumn).head()
      assert(heavy.subsetOf(s.counts.keySet),
        s"parts=$parts lost heavy keys ${heavy -- s.counts.keySet}")
      s.counts.foreach { case (key, est) =>
        assert(est <= truth(key) && truth(key) - est <= slack,
          s"parts=$parts $key est=$est true=${truth(key)}")
      }
    }
  }

  test("heavyHitters: exact result equals brute-force GROUP BY/HAVING " +
    "on skewed multi-partition data") {
    val data = zipfKeys(30000, keys = 800, seed = 11L)
    val df = spark.createDataset(data).toDF("k").repartition(9)
    val ppm = 2000L // threshold = ceil(0.002 * 30000) = 60
    val got = Sketches.heavyHitters(df, "k", ppm)
      .orderBy("k").as[(String, Long)].collect().toSeq
    val minFreq = (ppm * data.size + 999999L) / 1000000L
    val want = data.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .filter(_._2 >= minFreq).toSeq.sortBy(_._1)
    assert(got === want)
    assert(got.nonEmpty, "degenerate test: no heavy hitters at this support")
    assert(got.size < 800, "degenerate test: every key is a heavy hitter")
  }

  test("heavyHitters: NULL keys excluded from candidates and support base") {
    val df = spark.createDataset(
        Seq.fill(40)(Option("a")) ++ Seq.fill(5)(Option("b")) ++
          Seq.fill(55)(Option.empty[String]))
      .toDF("k").repartition(3)
    // n = 45 non-null; ppm=500000 -> minFreq = ceil(22.5) = 23: only "a"
    val got = Sketches.heavyHitters(df, "k", 500000L)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 40L)))
  }

  test("approxDistinct (HLL++) within 3*rsd of the exact twin per group") {
    val li = Tables.load(spark, sf, "lineitem")
    val exact = li.groupBy("l_suppkey")
      .agg(countDistinct(col("l_partkey")).as("exact_d"))
    val est = li.groupBy("l_suppkey")
      .agg(Sketches.approxDistinct(col("l_partkey"), rsd = 0.05).as("est_d"))
    val joined = exact.join(est, "l_suppkey")
      .select(col("exact_d").cast("double"), col("est_d").cast("double"))
      .as[(Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (ex, es) =>
      assert(math.abs(es - ex) <= math.max(0.15 * ex, 2.0),
        s"HLL estimate $es vs exact $ex outside 3*rsd envelope")
    }
  }

  test("approxQuantiles: rank error within the accuracy contract") {
    val li = Tables.load(spark, sf, "lineitem")
    val vals = li.select(round(col("l_quantity")).cast("long"))
      .as[Long].collect().sorted
    val n = vals.length
    val probs = Seq(0.25, 0.5, 0.9, 0.99)
    val accuracy = 1000
    val got = li.select(Sketches.approxQuantiles(
        round(col("l_quantity")).cast("long"), probs, accuracy))
      .as[Seq[Long]].head()
    probs.zip(got).foreach { case (p, q) =>
      // observed rank of the returned value must be within eps*n of p*n
      val lo = vals.indexWhere(_ >= q) // first index with value >= q
      val hi = vals.lastIndexWhere(_ <= q) + 1
      val eps = 1.0 / accuracy
      val target = p * n
      assert(target >= lo - eps * n - 1 && target <= hi + eps * n + 1,
        s"p=$p got=$q rank-window [$lo,$hi] target=$target eps*n=${eps * n}")
    }
  }
}
