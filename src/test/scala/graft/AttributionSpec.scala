package graft

import graft.operators.Attribution

/** Markov removal-effect attribution: derived channels, planted-channel
  * flow-through, and the driver-side cardinality seatbelt.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  // A hand-checkable chain: conversions reach CONV only through `promo`
  // (via view) or directly from `click`.
  private def transitions(extra: Seq[(String, String, Long)] = Nil) =
    (Seq(
      ("START", "view", 10L), ("view", "promo", 5L), ("view", "NULL", 5L),
      ("promo", "CONV", 5L),
      ("START", "click", 10L), ("click", "CONV", 2L), ("click", "NULL", 8L)
    ) ++ extra).toDF("src", "dst", "c")

  test("channels are derived from the data — a planted channel gets credit") {
    val out = Attribution.removalEffects(transitions())
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // derived channel set = {click, promo, view} + BASE row
    assert(out.keySet === Set("BASE", "click", "promo", "view"))
    val (base, _, _) = out("BASE")
    // P(conv) = 1/2 * 1/2 * 1 (view->promo->CONV) + 1/2 * 1/5 = 0.35
    assert(base === 350000L)
    // removing promo kills the view path entirely: conv drops to 0.1,
    // so promo's removal effect is 0.25 — attribution nonzero, and the
    // planted channel demonstrably changes the result
    assert(out("promo")._1 === 100000L)
    assert(out("promo")._2 === 250000L)
    assert(out("promo")._3 > 0L)
    // view is on the same path: removing it also forfeits 0.25
    assert(out("view")._2 === 250000L)
    // click's own path is worth 0.1
    assert(out("click")._2 === 100000L)
  }

  test("an unseen channel type changes removal effects (vs a frozen list)") {
    // the same journeys plus a new 'referral' hop that doubles START's
    // out-degree: with DERIVED channels the new state both appears and
    // re-normalizes every other channel's transition row
    val out = Attribution.removalEffects(transitions(
      Seq(("START", "referral", 20L), ("referral", "CONV", 10L))))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out.contains("referral"))
    assert(out("referral") > 0L, "planted channel must receive credit")
    // START now splits 10/10/20, so click's removal effect halves
    // relative to the 3-channel world (was 100000)
    assert(out("click") === 50000L)
  }

  test("cardinality seatbelt fails loudly, not quietly") {
    val ex = intercept[IllegalStateException] {
      Attribution.removalEffects(transitions(), maxChannels = 2)
    }
    assert(ex.getMessage.contains("channel set has 3"))
  }

  test("the seatbelt fires BEFORE the collect on an over-cardinal frame") {
    // a mis-grained input: event-vocabulary src/dst, 500 distinct states
    // — exactly the shape the guard exists for. The check must run
    // distributed (one aggregate) so the reject fires without ever
    // materializing the frame on the driver; a collect-first ordering
    // would have to pull all 499 pair rows before noticing.
    val wide = spark.range(1, 500)
      .selectExpr("concat('ev', id) AS src", "concat('ev', id + 1) AS dst",
        "CAST(1 AS LONG) AS c")
    val ex = intercept[IllegalStateException] {
      Attribution.removalEffects(wide, maxChannels = 64)
    }
    assert(ex.getMessage.contains("not channel-grain"))
  }

  test("an un-aggregated transition frame is rejected, not silently deduped") {
    // bounded vocabulary but raw (duplicate (src,dst)) rows: the map
    // fold after collect would silently keep ONE count per pair; the
    // duplicate arm of the guard rejects the contract violation loudly
    val raw = spark.range(0, 20000)
      .selectExpr("'START' AS src", "concat('ch', id % 3) AS dst",
        "CAST(1 AS LONG) AS c")
    val ex = intercept[IllegalStateException] {
      Attribution.removalEffects(raw, maxChannels = 64)
    }
    assert(ex.getMessage.contains("not a transition-COUNT frame"))
  }

  test("even a SMALL duplicated frame is rejected — duplicates exactly") {
    // 7 base rows + one duplicated pair = 8 rows, far under the
    // (maxChannels+3)^2 OOM bound: the row-count-vs-distinct-pair check
    // still fires, so no duplicated frame slips through to the .toMap
    // (which would silently keep one count per pair)
    val dup = transitions(Seq(("START", "view", 3L)))
    val ex = intercept[IllegalStateException] {
      Attribution.removalEffects(dup)
    }
    assert(ex.getMessage.contains("not a transition-COUNT frame"))
    assert(ex.getMessage.contains("8 rows"))
    assert(ex.getMessage.contains("7 distinct"))
  }

  test("extra columns past (src, dst, count) are tolerated") {
    val extra = transitions().withColumn("note", org.apache.spark.sql
      .functions.lit("x"))
    val out = Attribution.removalEffects(extra)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("promo") === 250000L)
  }
}
