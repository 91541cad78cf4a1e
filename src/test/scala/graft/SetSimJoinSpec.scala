package graft

import org.apache.spark.sql.functions._
import graft.operators.SetSimJoin

/** SetSimJoin (prefix filtering) must be EXACT: identical pair set and
  * scores to brute-force all-pairs Jaccard, on directed cases and seeded
  * random set corpora, with no cartesian in the plan.
  */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = ta.toSet; sb = tb.toSet
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * tDen >= uni * tNum
    } yield (ia, ib, inter * 1000L / uni)).toSet

  private def run(docs: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) = {
    val df = docs.toDF("id", "toks")
    SetSimJoin.jaccardSelfJoin(df, "id", "toks", tNum, tDen)
      .as[(Long, Long, Long)].collect().toSet
  }

  test("directed cases: subsets, disjoint, identical, singletons") {
    val docs = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "d"),       // identical to 1
      3L -> Seq("a", "b", "c"),            // J=3/4 with 1
      4L -> Seq("x", "y", "z"),            // disjoint
      5L -> Seq("a"),                      // tiny
      6L -> Seq("a", "q", "r", "s", "t"))  // J with 1 = 1/8
    for ((tn, td) <- Seq((1, 2), (3, 4), (1, 1), (1, 10)))
      assert(run(docs, tn, td) == brute(docs, tn, td), s"t=$tn/$td")
  }

  test("seeded random corpus == brute force at several thresholds") {
    val rnd = new scala.util.Random(13)
    val universe = (1 to 40).map(i => s"t$i")
    val docs = (1L to 150L).map { i =>
      val sz = 2 + rnd.nextInt(10)
      i -> rnd.shuffle(universe).take(sz)
    }
    for ((tn, td) <- Seq((1, 2), (2, 3), (4, 5))) {
      val got = run(docs, tn, td)
      val want = brute(docs, tn, td)
      assert(got == want, s"t=$tn/$td: got ${got.size}, want ${want.size}")
    }
    assert(brute(docs, 1, 2).nonEmpty)
  }

  test("no cartesian/nested-loop in the physical plan") {
    val docs = (1L to 50L).map(i => i -> Seq(s"t${i % 7}", s"t${i % 11}", s"t${i % 13}"))
    val plan = SetSimJoin.jaccardSelfJoin(docs.toDF("id", "toks"), "id", "toks", 1, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }

  test("vocabulary ranking has no single-partition window stage") {
    // pre-round-9 the dense token index came from row_number() over an
    // unpartitioned Window.orderBy — the whole vocabulary through one
    // task. The two-pass rank (range sort + zipWithIndex offsets) must
    // leave NO window operator anywhere in the plan.
    val docs = (1L to 50L).map(i => i -> Seq(s"t${i % 7}", s"t${i % 11}", s"t${i % 13}"))
    val plan = SetSimJoin.jaccardSelfJoin(docs.toDF("id", "toks"), "id", "toks", 1, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("maxBucket guard drops a degenerate token instead of exploding") {
    // every doc shares prefix token "hot" (freq-asc order puts rare first,
    // so make EVERY token identical -> prefix = the hot token)
    val docs = (1L to 30L).map(i => i -> Seq("hot"))
    val got = SetSimJoin.jaccardSelfJoin(docs.toDF("id", "toks"), "id", "toks",
      1, 2, maxBucket = 10)
    assert(got.count() == 0L)
  }

  test("a hot MIN shared token must not lose a pair other tokens carry") {
    // Construction: pair (1,2) = {h, s}, J = 1. Token h is in 5 docs,
    // ALL posting it in their prefix (posting 5 > maxBucket 3 -> hot);
    // token s is in 10 docs (so freq-asc ranks h BEFORE s -> h is the
    // pair's minimal shared token) but only docs 1,2 post s in a prefix
    // (posting 2 -> survives). An emit-once anchor over the RAW prefix
    // intersection min (= h) passes no surviving join row and silently
    // loses the pair; the anchor must take its min over tokens that
    // survived the hot drop.
    val pair = Seq(1L -> Seq("h", "s"), 2L -> Seq("h", "s"))
    val hotFill = (3L to 5L).map(i => i -> Seq("h", s"x$i"))
    val sFill = (6L to 13L).map(i =>
      i -> Seq(s"r${i}a", s"r${i}b", s"r${i}c", "s"))
    val docs = pair ++ hotFill ++ sFill
    val got = SetSimJoin.jaccardSelfJoin(docs.toDF("id", "toks"),
        "id", "toks", 1, 2, maxBucket = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1000L)),
      "the pair's surviving shared token 's' must carry the emission")
    // same shape through the R-S probe kernel: index the corpus with the
    // same seatbelt, probe with doc 1 — it must still find doc 2
    val ix = SetSimJoin.buildJaccardIndex(docs.toDF("id", "toks"),
      "id", "toks", 1, 2, maxBucket = 3)
    val probed = SetSimJoin.probeJaccardIndex(ix,
        pair.take(1).toDF("id", "toks"), "id", "toks")
      .as[(Long, Long, Long)].collect().toSet
    assert(probed == Set((1L, 1L, 1000L), (1L, 2L, 1000L)))
  }

  test("hot-token loss audit: an all-hot-prefix pair is counted, not " +
      "silently gone") {
    // Construction: 10 corpus docs {h, u_i}. Prefix at t=1/2 is BOTH
    // tokens, so h's prefix posting is 10 > maxBucket 5 -> dropped.
    // Probe {h} qualifies against every corpus doc (J = 1/2) but its
    // ONLY shared token is hot: all 10 pairs are lost — the documented
    // residual. The audit must price exactly that: droppedTokens names
    // h with its refused bucket size, and lostPairBound's product
    // (10 corpus postings × 1 probe posting) covers the 10 lost pairs.
    val corpus = (1L to 10L).map(i => i -> Seq("h", s"u$i"))
    val probe = Seq(100L -> Seq("h"))
    val ix = SetSimJoin.buildJaccardIndex(corpus.toDF("id", "toks"),
      "id", "toks", 1, 2, maxBucket = 5)
    val lost = SetSimJoin.probeJaccardIndex(ix, probe.toDF("id", "toks"),
      "id", "toks").count()
    assert(lost === 0L, "the planted all-hot-prefix pairs must be lost")
    val dropped = SetSimJoin.droppedTokens(ix)
      .as[(String, Long, Long)].collect().toSeq
    assert(dropped.map(d => (d._1, d._3)) === Seq(("h", 10L)))
    val bound = SetSimJoin.lostPairBound(ix, probe.toDF("id", "toks"),
        "id", "toks")
      .select("token", "corpus_postings", "probe_postings",
        "lost_pair_bound")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(bound === Seq(("h", 10L, 1L, 10L)),
      "bound must cover the 10 genuinely lost pairs")

    // same planted shape through the containment kernel (hot = FULL
    // corpus posting > maxBucket): probe {h} is fully contained in
    // every corpus doc, all 10 pairs lost, audit prices them
    val cix = SetSimJoin.buildContainmentIndex(corpus.toDF("id", "toks"),
      "id", "toks", 1, 1, maxBucket = 5)
    assert(SetSimJoin.probeContainmentIndex(cix,
      probe.toDF("id", "toks"), "id", "toks").count() === 0L)
    assert(SetSimJoin.droppedTokens(cix)
      .as[(String, Long, Long)].collect().toSeq
      .map(d => (d._1, d._3)) === Seq(("h", 10L)))
    assert(SetSimJoin.lostPairBound(cix, probe.toDF("id", "toks"),
        "id", "toks")
      .select("token", "lost_pair_bound")
      .as[(String, Long)].collect().toSeq === Seq(("h", 10L)))

    // and the exact case advertises itself: no hot tokens -> empty
    // audit frames (the join ran lossless)
    val exact = SetSimJoin.buildJaccardIndex(corpus.toDF("id", "toks"),
      "id", "toks", 1, 2, maxBucket = 100)
    assert(SetSimJoin.droppedTokens(exact).count() === 0L)
    assert(SetSimJoin.lostPairBound(exact, probe.toDF("id", "toks"),
      "id", "toks").count() === 0L)
  }

  test("lost pairs never exceed the published bound (seeded, tight " +
      "maxBucket)") {
    // property: on ANY corpus, |brute-force pairs| − |kernel pairs| ≤
    // Σ lost_pair_bound. A 12-token universe with a tight maxBucket
    // forces real hot tokens and real losses across seeds.
    for (seed <- Seq(3, 17, 29)) {
      val rnd = new scala.util.Random(seed)
      val universe = (1 to 12).map(i => s"t$i")
      val corpus = (1L to 60L).map { i =>
        i -> rnd.shuffle(universe).take(2 + rnd.nextInt(5))
      }
      val probe = (101L to 130L).map { i =>
        i -> rnd.shuffle(universe).take(2 + rnd.nextInt(5))
      }
      val ix = SetSimJoin.buildJaccardIndex(corpus.toDF("id", "toks"),
        "id", "toks", 1, 2, maxBucket = 8)
      val got = SetSimJoin.probeJaccardIndex(ix,
        probe.toDF("id", "toks"), "id", "toks").count()
      val want = (for {
        (pid, pt) <- probe; (cid, ct) <- corpus
        a = pt.distinct.toSet; b = ct.distinct.toSet
        if (a & b).size * 2 >= (a | b).size
      } yield (pid, cid)).size.toLong
      val bound = SetSimJoin.lostPairBound(ix, probe.toDF("id", "toks"),
          "id", "toks")
        .agg(org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.sum("lost_pair_bound"),
          org.apache.spark.sql.functions.lit(0L)))
        .head().getLong(0)
      assert(got <= want, s"seed $seed: kernel can never exceed brute")
      assert(want - got <= bound,
        s"seed $seed: lost ${want - got} pairs but bound was $bound")
      assert(want - got > 0,
        s"seed $seed: fixture must force a real loss to exercise the bound")
    }
  }

  test("a saved+loaded index probes byte-identically to the fresh one") {
    val rnd = new scala.util.Random(73)
    val universe = (1 to 30).map(i => s"t$i")
    val corpus = (1L to 80L).map { i =>
      i -> rnd.shuffle(universe).take(3 + rnd.nextInt(7))
    }
    val probe = (1L to 20L).map { i =>
      (2000L + i) -> (rnd.shuffle(universe).take(2 + rnd.nextInt(6)) ++
        (if (i % 3 == 0) Seq(s"unseen$i") else Nil))
    }
    val fresh = SetSimJoin.buildJaccardIndex(corpus.toDF("id", "toks"),
      "id", "toks", 2, 5)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-jix").toString
    fresh.save(dir)
    val loaded = SetSimJoin.loadJaccardIndex(spark, dir)
    assert(loaded.vocabCeiling === fresh.vocabCeiling)
    assert((loaded.tNum, loaded.tDen) === ((fresh.tNum, fresh.tDen)))
    def probeAll(ix: SetSimJoin.JaccardIndex) =
      SetSimJoin.probeJaccardIndex(ix, probe.toDF("id", "toks"),
        "id", "toks").as[(Long, Long, Long)].collect().sorted.toSeq
    val fromFresh = probeAll(fresh)
    assert(probeAll(loaded) === fromFresh,
      "reloaded index must reproduce the fresh probe results exactly")
    assert(fromFresh.nonEmpty, "vacuous identity — calibrate the corpus")
  }

  test("containment index: multi-batch reuse and save/reload identity") {
    val rnd = new scala.util.Random(79)
    val universe = (1 to 30).map(i => s"t$i")
    val corpus = (1L to 80L).map { i =>
      i -> rnd.shuffle(universe).take(4 + rnd.nextInt(8))
    }
    val ix = SetSimJoin.buildContainmentIndex(corpus.toDF("id", "toks"),
      "id", "toks", 4, 5).materialized
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cix").toString
    ix.save(dir)
    val loaded = SetSimJoin.loadContainmentIndex(spark, dir)
    assert(loaded.vocabCeiling === ix.vocabCeiling)
    assert(loaded.hotTokens === ix.hotTokens)
    for (b <- 0 until 3) {
      val probe = (1L to 12L).map { i =>
        (1000L * b + i) -> (rnd.shuffle(universe).take(2 + rnd.nextInt(4)) ++
          (if (i % 2 == 0) Seq(s"only$b-$i") else Nil))
      }
      def sorted(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Long)].collect().sorted.toSeq
      val viaIndex = sorted(SetSimJoin.probeContainmentIndex(ix,
        probe.toDF("id", "toks"), "id", "toks"))
      val perCall = sorted(SetSimJoin.containmentProbeJoin(
        corpus.toDF("id", "toks"), probe.toDF("id", "toks"),
        "id", "toks", 4, 5))
      val viaReload = sorted(SetSimJoin.probeContainmentIndex(loaded,
        probe.toDF("id", "toks"), "id", "toks"))
      assert(viaIndex === perCall, s"batch $b diverged through the index")
      assert(viaReload === viaIndex, s"batch $b diverged after reload")
    }
  }

  private def bruteContain(docs: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia != ib
      sa = ta.toSet; sb = tb.toSet
      inter = (sa & sb).size.toLong
      if inter * tDen >= sa.size.toLong * tNum
    } yield (ia, ib, inter * 1000L / sa.size)).toSet

  private def runContain(docs: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) = {
    val df = docs.toDF("id", "toks")
    SetSimJoin.containmentSelfJoin(df, "id", "toks", tNum, tDen)
      .as[(Long, Long, Long)].collect().toSet
  }

  test("containment: directed cases — subset both ways, partial, disjoint") {
    val docs = Seq(
      1L -> Seq("a", "b"),                      // ⊂ 2, ⊂ 3
      2L -> Seq("a", "b", "c", "d"),            // contains 1; 3 ⊄ 2 at 0.9
      3L -> Seq("a", "b", "c", "d", "e", "f"),  // contains 1 and 2
      4L -> Seq("x", "y"),                      // disjoint
      5L -> Seq("a", "b", "c", "d", "q"))       // 4/5 of it in 2/3
    for ((tn, td) <- Seq((1, 1), (9, 10), (4, 5), (1, 2)))
      assert(runContain(docs, tn, td) == bruteContain(docs, tn, td),
        s"t=$tn/$td")
  }

  test("containment: seeded random corpus == brute force") {
    val rnd = new scala.util.Random(29)
    val universe = (1 to 30).map(i => s"t$i")
    val docs = (1L to 120L).map { i =>
      val sz = 2 + rnd.nextInt(8)
      i -> rnd.shuffle(universe).take(sz)
    }
    for ((tn, td) <- Seq((1, 1), (9, 10), (2, 3))) {
      val got = runContain(docs, tn, td)
      val want = bruteContain(docs, tn, td)
      assert(got == want, s"t=$tn/$td: got ${got.size}, want ${want.size}")
    }
    assert(bruteContain(docs, 2, 3).nonEmpty)
  }

  private def bruteProbe(corpus: Seq[(Long, Seq[String])],
      probe: Seq[(Long, Seq[String])], tNum: Int, tDen: Int) =
    (for {
      (ip, tp) <- probe; (ic, tc) <- corpus
      sp = tp.toSet; sc = tc.toSet
      inter = (sp & sc).size.toLong
      uni = (sp | sc).size.toLong
      if inter * tDen >= uni * tNum
    } yield (ip, ic, inter * 1000L / uni)).toSet

  test("probe join: exact vs brute force, incl. probe-only tokens") {
    val rnd = new scala.util.Random(47)
    val universe = (1 to 35).map(i => s"t$i")
    val corpus = (1L to 120L).map { i =>
      val sz = 2 + rnd.nextInt(9)
      i -> rnd.shuffle(universe).take(sz)
    }
    // probe overlaps the corpus and also carries tokens the corpus has
    // NEVER seen (they rank past the corpus ceiling in the shared order)
    val probe = (1000L to 1030L).map { i =>
      val sz = 2 + rnd.nextInt(9)
      i -> (rnd.shuffle(universe).take(sz) ++
        (if (i % 3 == 0) Seq(s"new$i") else Nil))
    } ++ Seq(2000L -> corpus.head._2) // an exact copy of a corpus doc
    for ((tn, td) <- Seq((1, 2), (7, 10), (1, 1))) {
      val got = SetSimJoin.jaccardProbeJoin(corpus.toDF("id", "toks"),
        probe.toDF("id", "toks"), "id", "toks", tn, td)
        .as[(Long, Long, Long)].collect().toSet
      val want = bruteProbe(corpus, probe, tn, td)
      assert(got == want, s"t=$tn/$td: got ${got.size}, want ${want.size}")
    }
    assert(bruteProbe(corpus, probe, 1, 2).nonEmpty)
    // the exact copy finds its original at J = 1000
    assert(bruteProbe(corpus, probe, 1, 1)
      .contains((2000L, corpus.head._1, 1000L)))
  }

  test("probe join posts only prefix tokens on the probe side") {
    val corpus = (1L to 60L).map(i =>
      i -> Seq(s"t${i % 7}", s"t${i % 11}", s"t${i % 13}", s"t${i % 17}"))
    val probe = (100L to 110L).map(i =>
      i -> (1 to 10).map(j => s"t${(i + j) % 19}").distinct.toSeq)
    val (tn, td) = (7, 10)
    val vocab = SetSimJoin.rsVocab(corpus.toDF("id", "toks"),
      probe.toDF("id", "toks"), "id", "toks")
    val posted = SetSimJoin.probePostings(probe.toDF("id", "toks"),
      "id", "toks", vocab, tn, td).count()
    // prefix length = sz - ceil(t*sz) + 1 per probe record — the
    // asymmetric kernel's whole point: NOT the full token set
    def plen(sz: Int) = sz - ((sz * tn + td - 1) / td) + 1
    val want = probe.map { case (_, ts) => plen(ts.distinct.size) }.sum
    val fullTokens = probe.map(_._2.distinct.size).sum
    assert(posted === want.toLong, "posting count must equal sum of prefix lengths")
    assert(posted < fullTokens.toLong, "prefix-bounded, not full-token")
  }

  test("materialized index probed by multiple batches == per-call joins") {
    val rnd = new scala.util.Random(71)
    val universe = (1 to 30).map(i => s"t$i")
    val corpus = (1L to 80L).map { i =>
      i -> rnd.shuffle(universe).take(3 + rnd.nextInt(7))
    }
    val ix = SetSimJoin.buildJaccardIndex(corpus.toDF("id", "toks"),
      "id", "toks", 1, 2).materialized
    for (b <- 0 until 3) {
      val probe = (1L to 15L).map { i =>
        (1000L * b + i) -> (rnd.shuffle(universe).take(2 + rnd.nextInt(6)) ++
          (if (i % 2 == 0) Seq(s"only$b-$i") else Nil))
      }
      val viaIndex = SetSimJoin.probeJaccardIndex(ix,
        probe.toDF("id", "toks"), "id", "toks")
        .as[(Long, Long, Long)].collect().toSet
      val perCall = SetSimJoin.jaccardProbeJoin(corpus.toDF("id", "toks"),
        probe.toDF("id", "toks"), "id", "toks", 1, 2)
        .as[(Long, Long, Long)].collect().toSet
      assert(viaIndex == perCall, s"batch $b diverged through the index")
    }
  }

  test("probe join: corpus order is probe-independent (index reusability)") {
    val corpus = (1L to 40L).map(i => i -> Seq(s"c${i % 5}", s"c${i % 9}"))
    val pA = Seq(500L -> Seq("c1", "c2"))
    val pB = Seq(600L -> Seq("zz1", "zz2", "c1", "c2"))
    // the corpus-token ranks must be identical whatever probe arrives:
    // probe-only tokens always rank past the corpus ceiling
    def corpusRanks(p: Seq[(Long, Seq[String])]) =
      SetSimJoin.rsVocab(corpus.toDF("id", "toks"), p.toDF("id", "toks"),
        "id", "toks")
        .filter(col("_tok").startsWith("c"))
        .as[(String, Long)].collect().toMap
    assert(corpusRanks(pA) === corpusRanks(pB))
  }

  test("containment probe join: exact vs brute force, incl. unseen tokens") {
    val rnd = new scala.util.Random(61)
    val universe = (1 to 30).map(i => s"t$i")
    val corpus = (1L to 100L).map { i =>
      val sz = 3 + rnd.nextInt(8)
      i -> rnd.shuffle(universe).take(sz)
    }
    val probe = (900L to 920L).map { i =>
      val sz = 2 + rnd.nextInt(5)
      i -> (rnd.shuffle(universe).take(sz) ++
        (if (i % 4 == 0) Seq(s"alien$i") else Nil))
    } ++ Seq(2000L -> corpus.head._2.take(2)) // a strict subset of doc 1
    def bruteP(tn: Int, td: Int) = (for {
      (ip, tp) <- probe; (ic, tc) <- corpus
      sp = tp.toSet; sc = tc.toSet
      inter = (sp & sc).size.toLong
      if inter * td >= sp.size.toLong * tn
    } yield (ip, ic, inter * 1000L / sp.size)).toSet
    for ((tn, td) <- Seq((1, 1), (4, 5), (1, 2))) {
      val got = SetSimJoin.containmentProbeJoin(corpus.toDF("id", "toks"),
        probe.toDF("id", "toks"), "id", "toks", tn, td)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == bruteP(tn, td),
        s"t=$tn/$td: got ${got.size}, want ${bruteP(tn, td).size}")
    }
    // the planted subset is fully contained in its superset doc
    assert(bruteP(1, 1).contains((2000L, corpus.head._1, 1000L)))
  }

  test("probe joins: no cartesian/nested-loop in either kernel's plan") {
    val corpus = (1L to 50L).map(i =>
      i -> Seq(s"t${i % 7}", s"t${i % 11}", s"t${i % 13}"))
    val probe = (100L to 110L).map(i => i -> Seq(s"t${i % 7}", s"t${i % 11}"))
    for (df <- Seq(
        SetSimJoin.jaccardProbeJoin(corpus.toDF("id", "toks"),
          probe.toDF("id", "toks"), "id", "toks", 1, 2),
        SetSimJoin.containmentProbeJoin(corpus.toDF("id", "toks"),
          probe.toDF("id", "toks"), "id", "toks", 1, 2))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("containment: no cartesian, asymmetric pairs both directions") {
    val docs = Seq(1L -> Seq("a", "b"), 2L -> Seq("a", "b"),
      3L -> Seq("a", "b", "c"))
    val plan = SetSimJoin.containmentSelfJoin(
        docs.toDF("id", "toks"), "id", "toks", 1, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // identical sets contain each other: both (1,2) and (2,1) emitted;
    // (1,3)/(2,3) only in the subset direction
    val got = runContain(docs, 1, 1).map { case (a, b, _) => (a, b) }
    assert(got == Set((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L)))
  }
}
