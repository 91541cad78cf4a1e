package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorOps

/** Similarity search over an embedding column (`ArrayType(FloatType)`).
  *
  * Two paths, matching the north-star contract:
  *  - [[bruteForceTopK]] — exact cosine top-k: one scan, codegen'd vector
  *    math, `TakeOrderedAndProject` (never a global sort). The right
  *    baseline and the verifier for the ANN path.
  *  - [[lshTopK]] — random-hyperplane LSH: each vector gets a sign-bit
  *    bucket; the query probes its own bucket plus all buckets at hamming
  *    distance 1 (multi-probe), then scores exactly within the probed
  *    buckets. At 100 TB the bucket column becomes the partition key, so a
  *    query touches `nbits+1` partitions instead of the whole corpus. An
  *    IVF variant is the same shape with learned centroids instead of
  *    random planes.
  */
object Similarity {

  /** deterministic random hyperplanes (seeded), dim × nbits */
  def hyperplanes(dim: Int, nbits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nbits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** sign-bit bucket id of a vector column against fixed hyperplanes */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val pc = array(p.map(lit): _*)
      when(VectorOps.dot(vec, pc) >= 0.0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Exact cosine top-k against a single query vector (broadcast as a
    * literal array — no shuffle at all, just scan + local top-k merge).
    */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val q = array(query.map(x => lit(x)): _*) // float literals: CosineSim input type
    df.select(col(idCol), VectorOps.cosineNative(col(vecCol), q).as("cos"))
      .orderBy(desc_nulls_last("cos"), asc_nulls_first(idCol))
      .limit(k)
  }

  /** ANN top-k: prefilter to the query's LSH bucket ∪ hamming-1 buckets,
    * exact-score inside. Recall measured against [[bruteForceTopK]] in the
    * spec suite.
    */
  def lshTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int, nbits: Int = 4, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    // nbits sizes the bucket fan-out: candidates ≈ corpus × (nbits+1)/2^nbits.
    // 4 bits (≈31% probed) suits 10²–10⁴ rows; at 10⁹+ rows use 16–20 bits
    // so a query probes a few thousandths of the corpus.
    val planes = hyperplanes(dim, nbits, seed)
    // query bucket computed driver-side (tiny, deterministic)
    val qBits = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b.toDouble }.sum
      if (d >= 0.0) 1L << i else 0L
    }.sum
    val probes = qBits +: (0 until nbits).map(i => qBits ^ (1L << i))
    val q = array(query.map(x => lit(x)): _*) // float literals: CosineSim input type
    df.withColumn("bucket", lshBucket(col(vecCol), planes))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), VectorOps.cosineNative(col(vecCol), q).as("cos"))
      .orderBy(desc_nulls_last("cos"), asc_nulls_first(idCol))
      .limit(k)
  }

  /** All pairs with cosine ≥ threshold — embedding near-dup detection.
    * Exact O(n²) form for oracle checking; the scale path buckets by LSH
    * first (same as [[lshTopK]]) so the join key is the bucket, not a
    * cross product.
    */
  def cosinePairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("ida"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("idb"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("ida") < col("idb"))
      .withColumn("cos", VectorOps.cosineNative(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("ida", "idb")
  }

  /** Scale path for [[cosinePairs]]: candidates restricted to equal LSH
    * buckets (optionally with hamming-1 multiprobe), then exact-scored.
    */
  def cosinePairsLsh(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, nbits: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, nbits, seed)
    val withB = df.withColumn("bucket", lshBucket(col(vecCol), planes))
    val a = withB.select(col("bucket"), col(idCol).as("ida"), col(vecCol).as("va"))
    val b = withB.select(col("bucket"), col(idCol).as("idb"), col(vecCol).as("vb"))
    a.join(b, Seq("bucket")).filter(col("ida") < col("idb"))
      .withColumn("cos", VectorOps.cosineNative(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("ida", "idb").distinct()
  }
}
