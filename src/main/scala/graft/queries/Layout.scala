package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Physical-layout and incremental-maintenance operators: z-order
  * multi-dimensional clustering ([[graft.operators.ZOrder]]) and CDC
  * changelog apply ([[graft.operators.Cdc]]). Both are 100 TB write-path
  * ops whose READ-side semantics must be invariant — which is exactly
  * what their oracles check (the same query against the original
  * layout / a windowed recompute of the merge rule).
  */
object LayoutOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  def all: Seq[Q] = Seq(

    // Box query over the z-ordered events copy: same rows as the
    // original layout (the oracle reads the original), but every file /
    // row group is a small (user_id, value) rectangle, so BOTH range
    // predicates prune via parquet min/max stats — ZOrderSpec measures
    // the scan reading a fraction of the rows a linear layout reads.
    Q("zo1_zorder_box",
      (s, dir) => Tables.eventsZOrdered(s, dir)
        .filter(col("user_id").between(3, 7) && col("value").between(50, 200))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
        .orderBy(asc_nulls_first("event_type")),
      Some("""SELECT event_type, COUNT(*) AS n,
             | CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_c
             |FROM events
             |WHERE user_id BETWEEN 3 AND 7 AND value BETWEEN 50 AND 200
             |GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin)),

    // CDC merge: a changelog derived from orders (latest order per
    // customer; every 10th customer a delete) applied to the customer
    // base — upsert + delete + untouched-keys-kept, recomputed by the
    // oracle as the same window + NOT EXISTS + union.
    Q("cd1_cdc_merge",
      (s, dir) => {
        val base = t(s, dir, "customer").select(col("c_custkey"),
          col("c_name"), cents(col("c_acctbal")).as("c_acct_c"))
        val changes = t(s, dir, "orders").select(
          col("o_custkey").as("c_custkey"),
          concat(lit("o"), col("o_orderkey").cast(StringType)).as("c_name"),
          cents(col("o_totalprice")).as("c_acct_c"),
          when(col("o_custkey") % 10 === 0, "D").otherwise("U").as("op"),
          col("o_orderdate").as("cts"),
          col("o_orderkey").as("seq"))
        graft.operators.Cdc.applyChangelog(base, changes, Seq("c_custkey"),
          Seq(desc_nulls_last("cts"), desc_nulls_last("seq")))
          .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("c_name"))
      },
      Some("""WITH latest AS (
             | SELECT c_custkey, c_name, c_acct_c, op FROM (
             |  SELECT o_custkey AS c_custkey,
             |   'o' || CAST(o_orderkey AS VARCHAR) AS c_name,
             |   CAST(ROUND(o_totalprice*100) AS BIGINT) AS c_acct_c,
             |   CASE WHEN o_custkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
             |   ROW_NUMBER() OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC NULLS LAST) AS rn
             |  FROM orders) WHERE rn = 1)
             |SELECT c_custkey, c_name, c_acct_c FROM (
             | SELECT c.c_custkey, c.c_name,
             |  CAST(ROUND(c.c_acctbal*100) AS BIGINT) AS c_acct_c
             | FROM customer c
             | WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.c_custkey = c.c_custkey)
             | UNION ALL
             | SELECT c_custkey, c_name, c_acct_c FROM latest WHERE op <> 'D')
             |ORDER BY c_custkey NULLS FIRST, c_name NULLS FIRST""".stripMargin)),

    // Incremental aggregate refresh: the stored per-part aggregate of the
    // pre-cutoff facts folds the post-cutoff delta in WITHOUT rescanning
    // the base facts (IncrementalAggSpec proves the no-rescan property on
    // real files); the oracle recomputes the whole aggregate from scratch
    // — refresh(aggregate(base), delta) must equal aggregate(base+delta).
    Q("inc1_agg_refresh",
      (s, dir) => {
        import graft.operators.IncrementalAgg
        import graft.operators.IncrementalAgg.AggSpec
        val li = t(s, dir, "lineitem").select(col("l_partkey"),
          cents(col("l_extendedprice")).as("price_c"), col("l_shipdate"))
        val cutoff = lit("1996-01-01").cast(DateType)
        val keys = Seq("l_partkey")
        val aggs = Seq(AggSpec("price_c", "sum", "rev_c"),
          AggSpec("price_c", "count", "cnt"),
          AggSpec("l_shipdate", "min", "first_ship"),
          AggSpec("l_shipdate", "max", "last_ship"))
        val stored = IncrementalAgg.aggregate(
          li.filter(col("l_shipdate") < cutoff), keys, aggs)
        val delta = li.filter(col("l_shipdate") >= cutoff ||
          col("l_shipdate").isNull)
        IncrementalAgg.refresh(stored, delta, keys, aggs)
          .orderBy(asc_nulls_first("l_partkey"))
      },
      Some("""SELECT l_partkey,
             | CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_c,
             | COUNT(l_extendedprice) AS cnt,
             | MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
             |FROM lineitem GROUP BY l_partkey
             |ORDER BY l_partkey NULLS FIRST""".stripMargin)),

    // INC2 — incremental JOIN-view maintenance (classic IVM delta
    // algebra): for a star-schema view agg(F ⋈ D) with a STATIC
    // dimension, the view delta is agg(dF ⋈ D) — only the fact DELTA is
    // joined and aggregated, never the stored base facts (the changing-
    // dim F ⋈ dD and dF ⋈ dD terms are inc3's refreshJoinView; the
    // static-dim refresh is the common warehouse fast path). Composes inc1's
    // mergeable-aggregate refresh with the delta join; the oracle is
    // the FULL recompute over all facts, so any error in the delta
    // algebra (double-counted rows, missed join partners) shows as a
    // group-total mismatch.
    Q("inc2_join_refresh",
      (s, dir) => {
        import graft.operators.IncrementalAgg
        import graft.operators.IncrementalAgg.AggSpec
        val ev = t(s, dir, "events").filter(col("user_id").isNotNull)
          .select(col("user_id"), col("event_id"),
            cents(col("value")).as("v_c"))
        val dim = t(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        def view(e: DataFrame) = e.join(dim, "user_id")
        val keys = Seq("c_mktsegment")
        val aggs = Seq(AggSpec("v_c", "sum", "val_c"),
          AggSpec("v_c", "count", "n_events"))
        val stored = IncrementalAgg.aggregate(
          view(ev.filter(col("event_id") % 7 =!= 0)), keys, aggs)
        IncrementalAgg.refresh(stored,
            view(ev.filter(col("event_id") % 7 === 0)), keys, aggs)
          .orderBy(asc_nulls_first("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             | CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS val_c,
             | COUNT(value) AS n_events
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |WHERE e.user_id IS NOT NULL
             |GROUP BY 1 ORDER BY c_mktsegment NULLS FIRST""".stripMargin)),

    // RF36 — IVM refresh differential fuzz: 3 seeded instances of 2000
    // generated facts (key = i%50, value from md5 bits) split 4:1 into
    // base/delta, joined to a 55-key dimension and refreshed through
    // the mergeable-aggregate kernel; five extra delta rows carry keys
    // 50..54 that NO base row has, so groups BORN in the delta exercise
    // the outer-merge path (a naive inner merge would drop them). The
    // oracle is the full recompute over the identical generated data.
    Q("rf36_ivm_fuzz",
      (s, dir) => {
        import graft.operators.IncrementalAgg
        import graft.operators.IncrementalAgg.AggSpec
        val insts = Seq(0L, 100L, 200L).map { off =>
          val facts = s.range(1, 2001).select(
            pmod(col("id"), lit(50)).as("k"),
            conv(substring(md5(concat(lit(s"V$off:"),
              col("id").cast(StringType))), 1, 6), 16, 10)
              .cast(LongType).as("v"),
            col("id"))
          val extra = s.range(0, 5).select((col("id") + 50L).as("k"),
            (col("id") * 11L + off).as("v"), (col("id") + 10000L).as("id"))
          val dim = s.range(0, 55).select(col("id").as("k"),
            pmod(col("id"), lit(7)).as("grp"))
          def joined(f: DataFrame) = f.join(dim, "k")
          val keys = Seq("grp")
          val aggs = Seq(AggSpec("v", "sum", "sum_v"),
            AggSpec("v", "count", "n"), AggSpec("v", "max", "max_v"))
          val stored = IncrementalAgg.aggregate(
            joined(facts.filter(col("id") % 5 =!= 0)), keys, aggs)
          val delta = joined(facts.filter(col("id") % 5 === 0)
            .unionByName(extra))
          IncrementalAgg.refresh(stored, delta, keys, aggs)
            .withColumn("seedoff", lit(off))
        }
        insts.reduce(_.unionByName(_))
          .select("seedoff", "grp", "sum_v", "n", "max_v")
          .orderBy("seedoff", "grp")
      },
      Some {
        val per = Seq(0L, 100L, 200L).map { off =>
          s"""SELECT CAST($off AS BIGINT) AS seedoff, grp,
             |  CAST(SUM(v) AS BIGINT) AS sum_v, COUNT(v) AS n,
             |  CAST(MAX(v) AS BIGINT) AS max_v
             |FROM (
             |  SELECT i % 50 AS k,
             |    CAST(('0x' || substr(md5('V$off:' || CAST(i AS VARCHAR)), 1, 6))
             |      AS BIGINT) AS v
             |  FROM generate_series(1, 2000) _g(i)
             |  UNION ALL
             |  SELECT j + 50, j * 11 + $off FROM generate_series(0, 4) _e(j)) f
             |JOIN (SELECT k, k % 7 AS grp
             |      FROM generate_series(0, 54) _d(k)) d USING (k)
             |GROUP BY 1, 2""".stripMargin
        }
        per.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY seedoff, grp")
      }),

    // INC3 — CHANGING-dimension join-view maintenance, the full IVM
    // delta algebra (F ⋈ dD and dF ⋈ dD terms inc2 omits): the stored
    // view of events ⋈ customer by segment absorbs a fact delta AND a
    // dimension changelog — every 13th customer moves to a synthetic
    // segment, every (13k+5)th is deleted — via
    // IncrementalAgg.refreshJoinView: key-grain sub-aggregate fold +
    // affected-group recompute, never rescanning stored facts (the SCD
    // churn cd2 models, now maintained instead of merely historized).
    // min/max ride along to prove the non-invertible-aggregate path: a
    // segment that loses its max customer re-derives from key-grain
    // partials. Oracle = the FULL recompute over all facts against the
    // post-churn dimension, so any error in the delta algebra (stale
    // group rows, dropped retractions, missed moves) shows directly.
    Q("inc3_dim_churn",
      (s, dir) => {
        import graft.operators.IncrementalAgg
        import graft.operators.IncrementalAgg.AggSpec
        val ev = t(s, dir, "events").filter(col("user_id").isNotNull)
          .select(col("user_id"), col("event_id"),
            cents(col("value")).as("v_c"))
        val dimOld = t(s, dir, "customer")
          .select(col("c_custkey").as("user_id"),
            col("c_mktsegment").as("seg"))
        val keys = Seq("user_id")
        val groups = Seq("seg")
        val aggs = Seq(AggSpec("v_c", "sum", "val_c"),
          AggSpec("v_c", "count", "n_events"),
          AggSpec("v_c", "min", "min_v"), AggSpec("v_c", "max", "max_v"))
        val jv = IncrementalAgg.buildJoinView(
          ev.filter(col("event_id") % 7 =!= 0).select("user_id", "v_c"),
          dimOld, keys, groups, aggs)
        val dimChanges = dimOld
          .filter(col("user_id") % 13 === 0 || col("user_id") % 13 === 5)
          .select(col("user_id"),
            when(col("user_id") % 13 === 0,
              concat(lit("MOVED-"), (col("user_id") % 3).cast(StringType)))
              .otherwise(col("seg")).as("seg"),
            when(col("user_id") % 13 === 5, lit("D")).otherwise(lit("U"))
              .as("op"))
        IncrementalAgg.refreshJoinView(jv,
            ev.filter(col("event_id") % 7 === 0).select("user_id", "v_c"),
            dimChanges, keys, groups, aggs)
          .view.orderBy(asc_nulls_first("seg"))
      },
      Some("""WITH dimn AS (
             |  SELECT c_custkey AS user_id,
             |    CASE WHEN c_custkey % 13 = 0
             |      THEN 'MOVED-' || CAST(c_custkey % 3 AS VARCHAR)
             |      ELSE c_mktsegment END AS seg
             |  FROM customer WHERE c_custkey % 13 <> 5)
             |SELECT seg,
             |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS val_c,
             |  COUNT(value) AS n_events,
             |  CAST(MIN(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS min_v,
             |  CAST(MAX(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS max_v
             |FROM events e JOIN dimn d ON e.user_id = d.user_id
             |WHERE e.user_id IS NOT NULL
             |GROUP BY 1 ORDER BY seg NULLS FIRST""".stripMargin)),

    // RF37 — dimension-churn IVM fuzz (rf36's sibling for
    // refreshJoinView): 3 seeded instances of 2000 generated facts over
    // a 55-key dimension, refreshed through the changing-dim kernel
    // with all three churn arms at once — keys MOVED to a group born in
    // the delta (k%11=0 → grp+100), keys DELETED while still receiving
    // delta facts (k%11=3 — their facts must vanish from the view), and
    // dim keys BORN with the changelog (55..57) whose only facts arrive
    // in the delta. min/max ride along so a group losing its max key
    // exercises the key-grain re-derivation. Oracle = full recompute of
    // the identical generated data against the post-churn dimension.
    Q("rf37_ivm_dim_fuzz",
      (s, dir) => {
        import graft.operators.IncrementalAgg
        import graft.operators.IncrementalAgg.AggSpec
        val insts = Seq(0L, 100L, 200L).map { off =>
          val facts = s.range(1, 2001).select(
            pmod(col("id"), lit(50)).as("k"),
            conv(substring(md5(concat(lit(s"W$off:"),
              col("id").cast(StringType))), 1, 6), 16, 10)
              .cast(LongType).as("v"),
            col("id"))
          val extra = s.range(0, 3).select((col("id") + 55L).as("k"),
            (col("id") * 13L + off).as("v"), (col("id") + 10000L).as("id"))
          val dimOld = s.range(0, 55).select(col("id").as("k"),
            pmod(col("id"), lit(7)).as("grp"))
          val moved = s.range(0, 55).filter(col("id") % 11 === 0)
            .select(col("id").as("k"),
              (pmod(col("id"), lit(7)) + 100L).as("grp"), lit("U").as("op"))
          val deleted = s.range(0, 55).filter(col("id") % 11 === 3)
            .select(col("id").as("k"), pmod(col("id"), lit(7)).as("grp"),
              lit("D").as("op"))
          val born = s.range(55, 58).select(col("id").as("k"),
            when(col("id") % 11 === 0, pmod(col("id"), lit(7)) + 100L)
              .otherwise(pmod(col("id"), lit(7))).as("grp"),
            lit("U").as("op"))
          val keys = Seq("k")
          val groups = Seq("grp")
          val aggs = Seq(AggSpec("v", "sum", "sum_v"),
            AggSpec("v", "count", "n"), AggSpec("v", "min", "min_v"),
            AggSpec("v", "max", "max_v"))
          val jv = IncrementalAgg.buildJoinView(
            facts.filter(col("id") % 5 =!= 0).select("k", "v"),
            dimOld, keys, groups, aggs)
          val delta = facts.filter(col("id") % 5 === 0).select("k", "v")
            .unionByName(extra.select("k", "v"))
          IncrementalAgg.refreshJoinView(jv, delta,
              moved.unionByName(deleted).unionByName(born),
              keys, groups, aggs)
            .view.withColumn("seedoff", lit(off))
        }
        insts.reduce(_.unionByName(_))
          .select("seedoff", "grp", "sum_v", "n", "min_v", "max_v")
          .orderBy("seedoff", "grp")
      },
      Some {
        val per = Seq(0L, 100L, 200L).map { off =>
          s"""SELECT CAST($off AS BIGINT) AS seedoff, grp,
             |  CAST(SUM(v) AS BIGINT) AS sum_v, COUNT(v) AS n,
             |  CAST(MIN(v) AS BIGINT) AS min_v,
             |  CAST(MAX(v) AS BIGINT) AS max_v
             |FROM (
             |  SELECT i % 50 AS k,
             |    CAST(('0x' || substr(md5('W$off:' || CAST(i AS VARCHAR)), 1, 6))
             |      AS BIGINT) AS v
             |  FROM generate_series(1, 2000) _g(i)
             |  UNION ALL
             |  SELECT j + 55, j * 13 + $off FROM generate_series(0, 2) _e(j)) f
             |JOIN (SELECT k,
             |        CASE WHEN k % 11 = 0 THEN k % 7 + 100 ELSE k % 7 END AS grp
             |      FROM generate_series(0, 57) _d(k)
             |      WHERE k % 11 <> 3) d USING (k)
             |GROUP BY 1, 2""".stripMargin
        }
        per.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY seedoff, grp")
      }),

    // INC4 — fact-RETRACTION view maintenance (counting-algebra / bag
    // IVM): the piece neither inc1's append-only fold nor inc3's dim
    // churn covers — fact rows being DELETED and UPDATED. Signed deltas
    // (−old/+new) fold through IncrementalAgg.refreshCounting, whose
    // hidden witnesses make the two classic divergences impossible: a
    // _rows multiplicity drops groups retracted to zero rows, and a
    // per-sum non-null count restores SUM = NULL when the last non-null
    // measure is retracted (a plain signed fold would leave 0). Every
    // 11th event is deleted, every 13th survivor's value is updated,
    // every 17th re-inserted edited; oracle = full recompute over the
    // edited fact set. Invertible aggregates only (sum/count) — min/max
    // deletion is inc3's affected-group recompute path, by design.
    Q("inc4_fact_retraction",
      (s, dir) => {
        import graft.operators.IncrementalAgg
        import graft.operators.IncrementalAgg.AggSpec
        val f = t(s, dir, "events").select(col("event_type"),
          cents(col("value")).as("v_c"), col("event_id"))
        val keys = Seq("event_type")
        val aggs = Seq(AggSpec("v_c", "sum", "val_c"),
          AggSpec("v_c", "count", "n"))
        val stored = IncrementalAgg.aggregateCounting(
          f.select("event_type", "v_c"), keys, aggs)
        val dels = f.filter(col("event_id") % 11 === 0)
          .select(col("event_type"), col("v_c"), lit(-1L).as("_sign"))
        val updBase = f.filter(col("event_id") % 11 =!= 0 &&
          col("event_id") % 13 === 0)
        val upd = updBase
          .select(col("event_type"), col("v_c"), lit(-1L).as("_sign"))
          .unionByName(updBase.select(col("event_type"),
            (col("v_c") + 1000L).as("v_c"), lit(1L).as("_sign")))
        val ins = f.filter(col("event_id") % 17 === 0)
          .select(col("event_type"), (col("v_c") + 7L).as("v_c"),
            lit(1L).as("_sign"))
        val refreshed = IncrementalAgg.refreshCounting(stored,
          dels.unionByName(upd).unionByName(ins), keys, aggs)
        IncrementalAgg.publishCounting(refreshed, keys, aggs)
          .orderBy(asc_nulls_first("event_type"))
      },
      Some("""WITH f AS (SELECT event_type,
             |    CAST(ROUND(value*100) AS BIGINT) AS v_c, event_id
             |  FROM events),
             |edited AS (
             |  SELECT event_type,
             |    CASE WHEN event_id % 13 = 0 THEN v_c + 1000 ELSE v_c END AS v_c
             |  FROM f WHERE event_id % 11 <> 0
             |  UNION ALL
             |  SELECT event_type, v_c + 7 FROM f WHERE event_id % 17 = 0)
             |SELECT event_type, CAST(SUM(v_c) AS BIGINT) AS val_c,
             |  COUNT(v_c) AS n
             |FROM edited GROUP BY 1
             |ORDER BY event_type NULLS FIRST""".stripMargin)),

    // RF38 — retraction fuzz for the counting algebra: 3 seeded
    // instances of 2000 generated facts (nullable measures: every 7th
    // is NULL) driven through TWO chained signed refreshes hitting the
    // witness edge cases by construction — group 19 is retracted to
    // ZERO rows (must vanish) then REBORN by null-measure inserts
    // (must reappear with SUM NULL / n 0), group 16 loses every
    // non-null measure (SUM must restore to NULL, not 0), other groups
    // take deletes, −old/+new updates, and null inserts. Oracle = full
    // recompute over the edited generated set.
    Q("rf38_retraction_fuzz",
      (s, dir) => {
        import graft.operators.IncrementalAgg
        import graft.operators.IncrementalAgg.AggSpec
        val insts = Seq(0L, 100L, 200L).map { off =>
          val f = s.range(1, 2001).select(
            pmod(col("id"), lit(20)).as("k"),
            when(col("id") % 7 === 0, lit(null).cast(LongType))
              .otherwise(conv(substring(md5(concat(lit(s"R$off:"),
                col("id").cast(StringType))), 1, 6), 16, 10)
                .cast(LongType)).as("v"),
            col("id"))
          val keys = Seq("k")
          val aggs = Seq(AggSpec("v", "sum", "sum_v"),
            AggSpec("v", "count", "n"))
          val stored = IncrementalAgg.aggregateCounting(
            f.select("k", "v"), keys, aggs)
          val del = f.filter(col("k") === 19 ||
              (col("k") === 16 && col("v").isNotNull) ||
              (col("id") % 3 === 0 && col("k") =!= 16 && col("k") =!= 19))
            .select(col("k"), col("v"), lit(-1L).as("_sign"))
          val st1 = IncrementalAgg.refreshCounting(stored, del, keys, aggs)
          val updBase = f.filter(col("id") % 5 === 0 &&
            col("id") % 3 =!= 0 && col("k") =!= 16 && col("k") =!= 19)
          val upd = updBase.select(col("k"), col("v"), lit(-1L).as("_sign"))
            .unionByName(updBase.select(col("k"), (col("v") + 55L).as("v"),
              lit(1L).as("_sign")))
          val ins = s.range(1, 41).select(pmod(col("id"), lit(20)).as("k"),
            lit(null).cast(LongType).as("v"), lit(1L).as("_sign"))
          val st2 = IncrementalAgg.refreshCounting(st1,
            upd.unionByName(ins), keys, aggs)
          IncrementalAgg.publishCounting(st2, keys, aggs)
            .withColumn("seedoff", lit(off))
        }
        insts.reduce(_.unionByName(_))
          .select("seedoff", "k", "sum_v", "n")
          .orderBy("seedoff", "k")
      },
      Some {
        val per = Seq(0L, 100L, 200L).map { off =>
          s"""SELECT CAST($off AS BIGINT) AS seedoff, k,
             |  CAST(SUM(v) AS BIGINT) AS sum_v, COUNT(v) AS n
             |FROM (
             |  SELECT k, CASE WHEN i % 5 = 0 THEN v + 55 ELSE v END AS v
             |  FROM (
             |    SELECT i % 20 AS k,
             |      CASE WHEN i % 7 = 0 THEN NULL
             |           ELSE CAST(('0x' || substr(md5('R$off:' || CAST(i AS VARCHAR)), 1, 6))
             |                AS BIGINT) END AS v,
             |      i
             |    FROM generate_series(1, 2000) _g(i)) b
             |  WHERE k <> 19 AND NOT (k = 16 AND v IS NOT NULL)
             |    AND NOT (i % 3 = 0 AND k NOT IN (16, 19))
             |  UNION ALL
             |  SELECT i % 20, CAST(NULL AS BIGINT)
             |  FROM generate_series(1, 40) _h(i)) e
             |GROUP BY 1, 2""".stripMargin
        }
        per.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY seedoff, k")
      }),

    // INC5 — RETRACTION-capable join-view maintenance: inc3's dim-churn
    // delta algebra composed with inc4's counting algebra. The key-grain
    // sub-aggregate is a counting state (signed `_rows` multiplicity +
    // per-sum non-null witnesses), so ONE stored view absorbs fact
    // deletes (every 11th event), updates (−old/+new on every 13th
    // survivor), re-inserts (every 17th, edited) AND a dimension
    // changelog (every 13th customer moved to a synthetic segment,
    // every (13k+5)th deleted) — the churn neither inc3 (append-only
    // facts) nor inc4 (no dimension) handles alone. Stored facts are
    // never rescanned: signed fold at key grain + affected-group
    // recompute from the folded state. Oracle = full recompute of the
    // edited fact set against the post-churn dimension.
    Q("inc5_retractable_join_view",
      (s, dir) => {
        import graft.operators.IncrementalAgg
        import graft.operators.IncrementalAgg.AggSpec
        val ev = t(s, dir, "events").filter(col("user_id").isNotNull)
          .select(col("user_id"), col("event_id"),
            cents(col("value")).as("v_c"))
        val dimOld = t(s, dir, "customer")
          .select(col("c_custkey").as("user_id"),
            col("c_mktsegment").as("seg"))
        val keys = Seq("user_id")
        val groups = Seq("seg")
        val aggs = Seq(AggSpec("v_c", "sum", "val_c"),
          AggSpec("v_c", "count", "n_events"))
        val jv = IncrementalAgg.buildRetractableJoinView(
          ev.select("user_id", "v_c"), dimOld, keys, groups, aggs)
        val dels = ev.filter(col("event_id") % 11 === 0)
          .select(col("user_id"), col("v_c"), lit(-1L).as("_sign"))
        val updBase = ev.filter(col("event_id") % 11 =!= 0 &&
          col("event_id") % 13 === 0)
        val upd = updBase
          .select(col("user_id"), col("v_c"), lit(-1L).as("_sign"))
          .unionByName(updBase.select(col("user_id"),
            (col("v_c") + 1000L).as("v_c"), lit(1L).as("_sign")))
        val ins = ev.filter(col("event_id") % 17 === 0)
          .select(col("user_id"), (col("v_c") + 7L).as("v_c"),
            lit(1L).as("_sign"))
        val dimChanges = dimOld
          .filter(col("user_id") % 13 === 0 || col("user_id") % 13 === 5)
          .select(col("user_id"),
            when(col("user_id") % 13 === 0,
              concat(lit("MOVED-"), (col("user_id") % 3).cast(StringType)))
              .otherwise(col("seg")).as("seg"),
            when(col("user_id") % 13 === 5, lit("D")).otherwise(lit("U"))
              .as("op"))
        IncrementalAgg.refreshRetractableJoinView(jv,
            dels.unionByName(upd).unionByName(ins), dimChanges,
            keys, groups, aggs)
          .view.orderBy(asc_nulls_first("seg"))
      },
      Some("""WITH f AS (SELECT user_id,
             |    CAST(ROUND(value*100) AS BIGINT) AS v_c, event_id
             |  FROM events WHERE user_id IS NOT NULL),
             |edited AS (
             |  SELECT user_id,
             |    CASE WHEN event_id % 13 = 0 THEN v_c + 1000 ELSE v_c END AS v_c
             |  FROM f WHERE event_id % 11 <> 0
             |  UNION ALL
             |  SELECT user_id, v_c + 7 FROM f WHERE event_id % 17 = 0),
             |dimn AS (
             |  SELECT c_custkey AS user_id,
             |    CASE WHEN c_custkey % 13 = 0
             |      THEN 'MOVED-' || CAST(c_custkey % 3 AS VARCHAR)
             |      ELSE c_mktsegment END AS seg
             |  FROM customer WHERE c_custkey % 13 <> 5)
             |SELECT seg, CAST(SUM(v_c) AS BIGINT) AS val_c,
             |  COUNT(v_c) AS n_events
             |FROM edited e JOIN dimn d USING (user_id)
             |GROUP BY 1 ORDER BY seg NULLS FIRST""".stripMargin)),

    // RF39 — retractable-join-view fuzz (rf37 × rf38): 3 seeded
    // instances of 2000 generated facts (every 7th measure NULL) over a
    // 55-key dimension, one refresh mixing EVERY churn arm at once —
    // signed fact deletes (key 19 fully, key 16's non-null measures,
    // every 3rd row elsewhere), −old/+new updates, null-measure
    // inserts, dim keys MOVED to delta-born groups (k%11=0 → grp+100),
    // dim keys DELETED while still receiving signed deltas (k%11=3 —
    // their folded facts must vanish from the view), dim keys BORN with
    // the changelog (55..57) whose only facts arrive as +1 deltas, and
    // key 16 ISOLATED into its own group (999) with every non-null
    // measure retracted, so the witness algebra must publish that group
    // as SUM NULL / n 0 THROUGH the join view. Oracle = full recompute
    // of the edited generated facts against the post-churn dimension.
    Q("rf39_retractable_view_fuzz",
      (s, dir) => {
        import graft.operators.IncrementalAgg
        import graft.operators.IncrementalAgg.AggSpec
        val insts = Seq(0L, 100L, 200L).map { off =>
          val f = s.range(1, 2001).select(
            pmod(col("id"), lit(50)).as("k"),
            when(col("id") % 7 === 0, lit(null).cast(LongType))
              .otherwise(conv(substring(md5(concat(lit(s"V$off:"),
                col("id").cast(StringType))), 1, 6), 16, 10)
                .cast(LongType)).as("v"),
            col("id"))
          val dimOld = s.range(0, 55).select(col("id").as("k"),
            pmod(col("id"), lit(7)).as("grp"))
          val keys = Seq("k")
          val groups = Seq("grp")
          val aggs = Seq(AggSpec("v", "sum", "sum_v"),
            AggSpec("v", "count", "n"))
          val jv = IncrementalAgg.buildRetractableJoinView(
            f.select("k", "v"), dimOld, keys, groups, aggs)
          val del = f.filter(col("k") === 19 ||
              (col("k") === 16 && col("v").isNotNull) ||
              (col("id") % 3 === 0 && col("k") =!= 16 && col("k") =!= 19))
            .select(col("k"), col("v"), lit(-1L).as("_sign"))
          val updBase = f.filter(col("id") % 5 === 0 &&
            col("id") % 3 =!= 0 && col("k") =!= 16 && col("k") =!= 19)
          val upd = updBase.select(col("k"), col("v"), lit(-1L).as("_sign"))
            .unionByName(updBase.select(col("k"), (col("v") + 55L).as("v"),
              lit(1L).as("_sign")))
          val nullIns = s.range(1, 41).select(pmod(col("id"), lit(20)).as("k"),
            lit(null).cast(LongType).as("v"), lit(1L).as("_sign"))
          val bornIns = s.range(0, 3).select((col("id") + 55L).as("k"),
            (col("id") * 13L + off).as("v"), lit(1L).as("_sign"))
          val moved = s.range(0, 55).filter(col("id") % 11 === 0)
            .select(col("id").as("k"),
              (pmod(col("id"), lit(7)) + 100L).as("grp"), lit("U").as("op"))
          val deleted = s.range(0, 55).filter(col("id") % 11 === 3)
            .select(col("id").as("k"), pmod(col("id"), lit(7)).as("grp"),
              lit("D").as("op"))
          val born = s.range(55, 58).select(col("id").as("k"),
            when(col("id") % 11 === 0, pmod(col("id"), lit(7)) + 100L)
              .otherwise(pmod(col("id"), lit(7))).as("grp"),
            lit("U").as("op"))
          val isolate = s.range(16, 17).select(col("id").as("k"),
            lit(999L).as("grp"), lit("U").as("op"))
          IncrementalAgg.refreshRetractableJoinView(jv,
              del.unionByName(upd).unionByName(nullIns)
                .unionByName(bornIns),
              moved.unionByName(deleted).unionByName(born)
                .unionByName(isolate),
              keys, groups, aggs)
            .view.withColumn("seedoff", lit(off))
        }
        insts.reduce(_.unionByName(_))
          .select("seedoff", "grp", "sum_v", "n")
          .orderBy("seedoff", "grp")
      },
      Some {
        val per = Seq(0L, 100L, 200L).map { off =>
          s"""SELECT CAST($off AS BIGINT) AS seedoff, grp,
             |  CAST(SUM(v) AS BIGINT) AS sum_v, COUNT(v) AS n
             |FROM (
             |  SELECT k, CASE WHEN i % 5 = 0 THEN v + 55 ELSE v END AS v
             |  FROM (
             |    SELECT i % 50 AS k,
             |      CASE WHEN i % 7 = 0 THEN NULL
             |           ELSE CAST(('0x' || substr(md5('V$off:' || CAST(i AS VARCHAR)), 1, 6))
             |                AS BIGINT) END AS v,
             |      i
             |    FROM generate_series(1, 2000) _g(i)) b
             |  WHERE k <> 19 AND NOT (k = 16 AND v IS NOT NULL)
             |    AND NOT (i % 3 = 0 AND k NOT IN (16, 19))
             |  UNION ALL
             |  SELECT i % 20, CAST(NULL AS BIGINT)
             |  FROM generate_series(1, 40) _h(i)
             |  UNION ALL
             |  SELECT j + 55, j * 13 + $off FROM generate_series(0, 2) _e(j)) e
             |JOIN (SELECT k,
             |        CASE WHEN k = 16 THEN 999
             |             WHEN k % 11 = 0 THEN k % 7 + 100
             |             ELSE k % 7 END AS grp
             |      FROM generate_series(0, 57) _d(k)
             |      WHERE k % 11 <> 3) d USING (k)
             |GROUP BY 1, 2""".stripMargin
        }
        per.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY seedoff, grp")
      }),

    // SCD type-2 dimension history from a changelog: per-key validity
    // intervals, half-open [valid_from, valid_to), NULL while current —
    // the oracle recomputes the same LEAD window
    Q("cd2_scd2_history",
      (s, dir) => {
        val changes = t(s, dir, "orders")
          .filter(col("o_custkey") % 50 === 0)
          .select(col("o_custkey").as("k"),
            col("o_orderpriority").as("attr"),
            col("o_orderdate"), col("o_orderkey"))
        graft.operators.Cdc.scd2(changes, Seq("k"),
          Seq(asc_nulls_first("o_orderdate"), asc_nulls_first("o_orderkey")),
          "o_orderdate")
          .select(col("k"), col("attr"), col("valid_from"),
            col("valid_to"), col("is_current"))
          .orderBy(asc_nulls_first("k"), asc_nulls_first("valid_from"),
            asc_nulls_first("attr"))
      },
      Some("""SELECT o_custkey AS k, o_orderpriority AS attr,
             | o_orderdate AS valid_from,
             | LEAD(o_orderdate) OVER w AS valid_to,
             | (LEAD(o_orderdate) OVER w IS NULL) AS is_current
             |FROM orders WHERE o_custkey % 50 = 0
             |WINDOW w AS (PARTITION BY o_custkey
             | ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST)
             |ORDER BY k NULLS FIRST, valid_from NULLS FIRST, attr NULLS FIRST""".stripMargin)),

    // CD3 — dataset version diff: two corpus snapshots compared by
    // content fingerprint — the release audit every dataset publication
    // runs ("what changed since v1?"). v2 is derived deterministically:
    // every 7th doc dropped, every 10th (surviving) doc edited, 50 new
    // docs appended. One full-outer join on the key comparing md5; the
    // per-source × change-type matrix is the audit artifact.
    Q("cd3_dataset_diff",
      (s, dir) => {
        val v1 = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), md5(col("text")).as("fp"))
        val v2base = t(s, dir, "documents")
          .filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("source"),
            md5(when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("fp"))
        val v2new = t(s, dir, "documents")
          .filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
            md5(concat(lit("new:"), col("text"))).as("fp"))
        val v2 = v2base.unionByName(v2new)
        v1.select(col("doc_id"), col("source").as("src1"), col("fp").as("fp1"))
          .join(v2.select(col("doc_id"), col("source").as("src2"),
            col("fp").as("fp2")), Seq("doc_id"), "full_outer")
          .select(coalesce(col("src1"), col("src2")).as("source"),
            when(col("fp1").isNull, "added")
              .when(col("fp2").isNull, "removed")
              .when(col("fp1") === col("fp2"), "unchanged")
              .otherwise("modified").as("change"))
          .groupBy("source", "change")
          .agg(count(lit(1)).as("n"))
          .orderBy("source", "change")
      },
      Some("""WITH v1 AS (SELECT doc_id, source, md5(text) AS fp FROM documents),
             |v2 AS (
             |  SELECT doc_id, source,
             |    md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END) AS fp
             |  FROM documents WHERE doc_id % 7 <> 0
             |  UNION ALL
             |  SELECT doc_id + 1000000, source, md5('new:' || text)
             |  FROM documents WHERE doc_id % 9 = 0)
             |SELECT COALESCE(v1.source, v2.source) AS source,
             |  CASE WHEN v1.fp IS NULL THEN 'added'
             |       WHEN v2.fp IS NULL THEN 'removed'
             |       WHEN v1.fp = v2.fp THEN 'unchanged'
             |       ELSE 'modified' END AS change,
             |  COUNT(*) AS n
             |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
             |GROUP BY 1, 2 ORDER BY source, change""".stripMargin)))
}
