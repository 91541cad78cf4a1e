package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for large-scale training-data pipelines
  * (BASELINE.json north star; not present in the reference, which only has
  * `drop_duplicates`, slide/utils.py:818-826).
  *
  * Everything is expressed as shuffles over derived keys — the shapes that
  * survive 100 TB:
  *
  *  - exact dedup = one hash shuffle on the content key, map-side partial;
  *  - MinHash-LSH = explode shingles → one groupBy(doc) for signatures →
  *    explode bands → one self-join on (band, bandHash) whose input is
  *    tiny (docs × bands rows, not shingles) → exact verify on candidates
  *    only. No all-pairs stage ever materializes;
  *  - SimHash = same shape with 64 bit-sums and chunk-equality banding.
  *
  * Skew guard: near-dup clusters of size m produce m² candidate pairs in a
  * bucket; `maxBucket` drops degenerate buckets (e.g. boilerplate shingles)
  * the way production dedup pipelines do.
  */
object Dedup {

  /** Exact dedup on a set of columns: representative id + multiplicity per
    * distinct key — one hash aggregate, no sort.
    */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** distinct character n-grams of a text column as an array (codegen'd
    * higher-order functions; guarded for texts shorter than n)
    */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) < n, array().cast(ArrayType(StringType)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))

  private val P: Long = 2147483647L // 2^31 - 1, Mersenne prime

  /** deterministic MinHash coefficient streams (seeded) */
  private def coeffs(numHashes: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)((1L + rnd.nextInt((P - 1).toInt).toLong,
      rnd.nextInt(P.toInt).toLong))
  }

  /** MinHash signatures: (id, h0..h{H-1}) — explode shingles once, then a
    * single partial-aggregating groupBy(id) with H `min` columns.
    */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, seed: Long = 42L): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
      explode(charNgrams(col(textCol), n)).as("gram"))
      .select(col("id"), pmod(xxhash64(col("gram")), lit(P)).as("gh"))
    val cs = coeffs(numHashes, seed)
    val mins = cs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("gh") * a + b, lit(P))).as(s"h$i")
    }
    grams.groupBy("id").agg(mins.head, mins.tail.toIndexedSeq: _*)
  }

  /** LSH banding: (id, band, bhash) — `bands` rows per doc. */
  def lshBands(sigs: DataFrame, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val rows = numHashes / bands
    val bandStructs = (0 until bands).map { k =>
      struct(lit(k).as("band"),
        xxhash64((0 until rows).map(r => col(s"h${k * rows + r}")): _*).as("bhash"))
    }
    sigs.select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bhash").as("bhash"))
  }

  /** Candidate pairs from LSH buckets (ida < idb, distinct). The self-join
    * runs on docs×bands rows only; `maxBucket` drops degenerate buckets.
    */
  def lshCandidates(bandsDf: DataFrame, maxBucket: Int = 1000): DataFrame = {
    val sized = bandsDf
      .withColumn("bsz", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bhash")))
      .filter(col("bsz") <= maxBucket)
    val l = sized.select(col("band"), col("bhash"), col("id").as("ida"))
    val r = sized.select(col("band"), col("bhash"), col("id").as("idb"))
    l.join(r, Seq("band", "bhash"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
  }

  /** Exact-verify candidate pairs against true n-gram Jaccard with integer
    * arithmetic (`threshNum/threshDen`, e.g. 4/5 = 0.8) — no float
    * boundary issues against the oracle.
    */
  def verifyJaccard(candidates: DataFrame, df: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshNum: Int = 4, threshDen: Int = 5): DataFrame = {
    val sets = df.select(col(idCol).as("id"), charNgrams(col(textCol), n).as("grams"))
    val withSets = candidates
      .join(sets.withColumnRenamed("id", "ida").withColumnRenamed("grams", "ga"), "ida")
      .join(sets.withColumnRenamed("id", "idb").withColumnRenamed("grams", "gb"), "idb")
    withSets
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("na", size(col("ga")))
      .withColumn("nb", size(col("gb")))
      .filter(col("inter") * threshDen >= (col("na") + col("nb") - col("inter")) * threshNum)
      .select("ida", "idb")
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → bucket
    * join → exact verify. Output: verified near-dup pairs.
    */
  def minHashDedup(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshNum: Int = 4, threshDen: Int = 5): DataFrame = {
    val sigs = minHashSignatures(df, idCol, textCol, n, numHashes)
    val cands = lshCandidates(lshBands(sigs, numHashes, bands))
    verifyJaccard(cands, df, idCol, textCol, n, threshNum, threshDen)
  }

  /** 64-bit SimHash over whitespace tokens: explode tokens → 64 signed
    * bit-sums per doc → reassemble the sign bits into one long.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(array_distinct(split(trim(col(textCol)), "\\s+"))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1).otherwise(-1)).as(s"b$i")
    }
    val sums = toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_ + _)
    sums.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup candidates by 16-bit-chunk equality (pigeonhole: any
    * pair within hamming distance 3 shares ≥1 of 4 chunks), then exact
    * hamming filter ≤ maxHamming.
    */
  def simHashPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunked = sigs.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("chunk"),
          shiftright(col("simhash"), k * 16).bitwiseAND(0xffffL).as("cv"))): _*)).as("cc"))
      .select(col("id"), col("simhash"), col("cc.chunk").as("chunk"), col("cc.cv").as("cv"))
    val l = chunked.select(col("chunk"), col("cv"), col("id").as("ida"), col("simhash").as("sa"))
    val r = chunked.select(col("chunk"), col("cv"), col("id").as("idb"), col("simhash").as("sb"))
    l.join(r, Seq("chunk", "cv")).filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
