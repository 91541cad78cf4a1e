package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure `Column`
  * expressions over built-ins (replace/length/regexp/md5) — codegen'd,
  * pushdown-transparent, and expressible 1:1 in the DuckDB oracle.
  *
  * Integer-arithmetic convention: ratios are reported in permille via
  * integer division, so differential comparison is exact.
  */
object TextAnalysis {

  /** occurrences of `marker` in `text` via the portable replace-count
    * identity: (len(t) - len(replace(t, m, ''))) / len(m)
    */
  private def litCount(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) / marker.length)
      .cast(LongType)

  /** language marker words (stopword heuristic); scored over the
    * space-padded text so markers match whole words only
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " and ", " is "),
    "fr" -> Seq(" le ", " la ", " et ", " les "),
    "es" -> Seq(" el ", " que ", " los ", " una "),
    "de" -> Seq(" der ", " und ", " die ", " das "))

  /** n-gram-heuristic language ID: marker-word scores per language,
    * argmax with a deterministic preference order, 'und' when all zero.
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scores = langMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => litCount(padded, m)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** language scores as columns (for inspection / oracle parity) */
  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langMarkers.map { case (lang, ms) =>
      s"score_$lang" -> ms.map(m => litCount(padded, m)).reduce(_ + _)
    }
  }

  /** whitespace token count: collapse runs, then count separators */
  def tokenCount(text: Column): Column = {
    val norm = trim(regexp_replace(text, "\\s+", " "))
    when(norm === "", 0L)
      .otherwise(length(norm) - length(replace(norm, lit(" "), lit(""))) + 1)
      .cast(LongType)
  }

  /** BPE-ish subword token count: alnum runs + single punctuation marks */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
      .cast(LongType)

  /** quality features, all integerized (permille ratios) */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val chars = length(text).cast(LongType)
    val toks = tokenCount(text)
    val padded = concat(lit(" "), lower(text), lit(" "))
    val stop = Seq(" the ", " a ", " and ", " is ", " of ", " to ")
      .map(m => litCount(padded, m)).reduce(_ + _)
    val punct = Seq(".", ",", "!", "?", ";").map(m => litCount(text, m)).reduce(_ + _)
    Seq(
      "n_chars" -> chars,
      "n_tokens" -> toks,
      "stop_pm" -> when(toks === 0, 0L).otherwise(stop * 1000L / toks).cast(LongType),
      "punct_pm" -> when(chars === 0, 0L).otherwise(punct * 1000L / chars).cast(LongType),
      "avg_tok_len_pm" -> when(toks === 0, 0L)
        .otherwise(length(replace(trim(regexp_replace(text, "\\s+", " ")), lit(" "), lit(""))) * 1000L / toks)
        .cast(LongType))
  }

  /** composite quality score in [0, 100]: length and stopword signals.
    * Each term is floored to an integer before summing (portable: Spark
    * `cast(long)` truncation ≡ DuckDB `//` floor for non-negatives).
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenScore = (least(f("n_chars"), lit(400L)) * 40L / 400L).cast(LongType)
    val stopScore = (least(f("stop_pm"), lit(150L)) * 40L / 150L).cast(LongType)
    val tokScore = (least(f("n_tokens"), lit(80L)) * 20L / 80L).cast(LongType)
    lenScore + stopScore + tokScore
  }

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", arXiv:2112.11446 §A1.1 — public
    * filter-rule inventory). Each rule is an independent boolean flag so
    * downstream curation can attribute removals; `pass` is their
    * conjunction. All thresholds are integerized (permille) so the
    * differential oracle is exact. Pure `Column` expressions — the whole
    * rule set rides one projection over the scan, no shuffle.
    *
    * Rules (document kept when all true):
    *  - word_count_ok:    50 <= n_words <= 100000
    *  - mean_word_len_ok: mean word length in [3, 10] chars
    *  - symbol_ratio_ok:  '#' or '...' per word <= 0.1
    *  - alpha_word_ok:    >= 80% of words contain an alphabetic char
    *  - stopword_ok:      >= 2 distinct common-stopword hits
    */
  def gopherFlags(text: Column): Seq[(String, Column)] = {
    val norm = trim(regexp_replace(text, "\\s+", " "))
    val toks = tokenCount(text)
    val alphaChars = length(replace(norm, lit(" "), lit("")))
    val meanLenPm = when(toks === 0, 0L)
      .otherwise(alphaChars * 1000L / toks).cast(LongType)
    val hashes = litCount(text, "#")
    val ellipses = litCount(text, "...")
    val symbolPm = when(toks === 0, lit(1000L))
      .otherwise((hashes + ellipses) * 1000L / toks).cast(LongType)
    // words with at least one letter ([^ ]* can't span the separator, so
    // each match is one whole word; RE2-safe for the DuckDB oracle)
    val alphaWords = size(
      regexp_extract_all(norm, lit("[^ ]*[a-zA-Z][^ ]*"), lit(0)))
      .cast(LongType)
    val alphaPm = when(toks === 0, 0L)
      .otherwise(alphaWords * 1000L / toks).cast(LongType)
    val padded = concat(lit(" "), lower(text), lit(" "))
    val stopHits = Seq(" the ", " be ", " to ", " of ", " and ",
        " that ", " have ", " with ", " is ", " a ")
      .map(m => when(litCount(padded, m) > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    Seq(
      "n_words" -> toks,
      "mean_word_len_pm" -> meanLenPm,
      "symbol_pm" -> symbolPm,
      "alpha_word_pm" -> alphaPm,
      "stop_hits" -> stopHits,
      "word_count_ok" -> (toks >= 50L && toks <= 100000L),
      "mean_word_len_ok" -> (meanLenPm >= 3000L && meanLenPm <= 10000L),
      "symbol_ratio_ok" -> (symbolPm <= 100L),
      "alpha_word_ok" -> (alphaPm >= 800L),
      "stopword_ok" -> (stopHits >= 2L))
  }

  /** conjunction of all gopherFlags rule columns */
  def gopherPass(text: Column): Column = {
    val flags = gopherFlags(text).toMap
    Seq("word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
      "alpha_word_ok", "stopword_ok").map(flags(_)).reduce(_ && _)
  }

  /** document fingerprint: md5 of whitespace-normalized lowercase text */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Hashed 1-2-gram buckets for the linear quality classifier — the
    * fastText-style scorer CCNet/Dolma-class pipelines run over every
    * crawled document (public knowledge; the reference has no
    * counterpart — this is the LLM-pipeline breadth surface):
    * lowercase whitespace words, unigrams plus space-joined bigrams,
    * each hashed to `[0, buckets)` by the first 8 hex chars of a
    * salted md5. md5 because both engines compute it bit-identically —
    * the DuckDB oracle replays the EXACT hashes, so the score compare
    * is integer-exact, not statistical. One array expression per doc:
    * codegen'd, no explode until the caller asks for it.
    */
  def hashedGramBuckets(text: Column, buckets: Int): Column = {
    // explicit whitespace class, NOT \s: Java \s includes vertical tab
    // \x0B while DuckDB's RE2 \s does not — the tx14 oracle replays
    // these exact hashes, so both engines spell the same five-char+VT
    // class out (the oracle SQL mirrors this literally)
    val ws = filter(
      split(lower(trim(regexp_replace(text, "[ \\t\\n\\x0B\\f\\r]+", " "))), " "),
      w => w =!= "")
    val n1 = greatest(size(ws) - 1, lit(0))
    val bis = zip_with(slice(ws, lit(1), n1), slice(ws, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    transform(concat(ws, bis), g =>
      pmod(conv(substring(md5(concat(lit("q:"), g)), 1, 8), 16, 10)
        .cast(LongType), lit(buckets.toLong)))
  }

  /** The classifier's weight table as a DataFrame — `buckets` rows of
    * (bucket, w_milli), fixed-point integer milli-weights in
    * [−1000, 1000] derived deterministically from the bucket id (the
    * stand-in for a trained fastText weight vector; a real pipeline
    * loads its own table — the ENGINE mechanics under test are
    * hash → broadcast-join → integer dot product). Deterministic in
    * both engines: w = ((b·2654435761) mod 2³¹) mod 2001 − 1000.
    */
  def qualityWeightTable(s: org.apache.spark.sql.SparkSession,
      buckets: Int): org.apache.spark.sql.DataFrame =
    s.range(buckets).select(col("id").as("bucket"),
      (pmod(col("id") * 2654435761L, lit(2147483648L)) % 2001L - 1000L)
        .as("w_milli"))

  /** The same weights as a driver-side array (index = bucket id) — the
    * form a scan-side `element_at` dot product consumes, so the scorer
    * needs NO explode, NO join and NO regroup: w is attached per gram
    * inside one array-aggregate expression (guide §3.3 — "explode
    * before a join multiplies the shuffle"; here it multiplied the
    * joined ROWS ~60× per doc). Kept in lockstep with
    * [[qualityWeightTable]] (spec-gated equality): a trained model
    * swaps this array (or the table) — the plan shape stays.
    */
  def qualityWeights(buckets: Int): Array[Long] =
    Array.tabulate(buckets)(i =>
      (i * 2654435761L % 2147483648L) % 2001L - 1000L)

  /** 64-bit rolling (polynomial) content hash — the streaming-friendly
    * fingerprint variant; not oracle-portable (custom hash), checked by
    * spec instead. h = Σ c_i·31^(n-i) mod 2^64 via aggregate.
    */
  def rollingHash(text: Column): Column = {
    val codes = transform(split(text, ""), ch => ascii(ch).cast(LongType))
    aggregate(codes, lit(0L), (acc, c) => acc * 31L + c)
  }

  /** Canonical URL host: lowercased authority with `www.` and any port
    * stripped. Pure regexp — identically expressible in the oracle.
    */
  def urlHost(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[a-zA-Z]+://([^/:?#]+)", 1)),
      "^www\\.", "")

  /** Canonical URL form — the web-pipeline dedup key (every crawl
    * pipeline's URL-normalization stage): scheme folded to https, host
    * lowercased with www./port stripped, trailing slashes trimmed from
    * the path, fragment dropped, and utm_* tracking parameters removed
    * from the query string. All regexp/array kernels, no UDF.
    */
  def normalizeUrl(url: Column): Column = {
    val host = urlHost(url)
    val path = regexp_replace(
      regexp_extract(url, "^[a-zA-Z]+://[^/?#]*([^?#]*)", 1), "/+$", "")
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val q2 = array_join(
      filter(split(q, "&"), x => !x.startsWith("utm_") && x =!= ""), "&")
    concat(lit("https://"), host, path,
      when(q2 === "", lit("")).otherwise(concat(lit("?"), q2)))
  }
}
