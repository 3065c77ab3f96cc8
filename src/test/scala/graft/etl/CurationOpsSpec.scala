package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computable fixtures for the round-3 curation operators (q110–q118
  * run the same code against the DuckDB oracle; these pin semantics on
  * inputs small enough to verify by eye, plus the sketch guarantees the
  * synthetic corpus can't isolate). */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- Misra–Gries

  test("misraGries: bounded candidates, heavy item always survives") {
    // 300× 'hot' among 700 distinct cold items; k=10 → at most 9 counters
    val stream = Iterator.fill(300)("hot") ++ (1 to 700).iterator.map("c" + _)
    val cands = Sketches.misraGries(stream, 10).toSeq
    assert(cands.size <= 9)
    assert(cands.contains("hot")) // freq 300 > 1000/10, must survive
  }

  test("heavyHitters: exact threshold, sketch false positives removed") {
    // 80 a, 15 b, 5 c over 4 partitions; k=5 → keep freq > 100/5 = 20
    val items = spark.createDataset(
      List.fill(80)("a") ++ List.fill(15)("b") ++ List.fill(5)("c"))
      .repartition(4)
    val got = Sketches.heavyHitters(items, 5)
      .as[(String, Long)].collect().toSeq.sorted
    assert(got == Seq(("a", 80L)))
  }

  test("heavyHitters: ties at the threshold are excluded (strict >)") {
    // 20 a, 20 b over k=2 → threshold 40/2 = 20, nothing strictly above
    val items = spark.createDataset(List.fill(20)("a") ++ List.fill(20)("b"))
    assert(Sketches.heavyHitters(items, 2).isEmpty)
  }

  // ---------------------------------------------------------- PageRank

  test("pageRankInt: 2-cycle conserves mass up to the div-100 floors") {
    val nodes = Seq(1L, 2L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    // r0=1000: base=150, contribution (1000*85) div 100 = 850 → steady 1000
    val got = Graph.pageRankInt(nodes, edges, "node", "src", "dst",
        iterations = 3, r0 = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1000L, 2L -> 1000L))
  }

  test("pageRankInt: star graph, source decay and sink accumulation") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((2L, 1L), (3L, 1L)).toDF("src", "dst")
    // r0=1000: iter1 r(1)=150+(2000*85)div100=1850, r(2)=r(3)=150 (no
    // in-edges); iter2+ r(1)=150+(300*85)div100=405 — steady by iter3
    val got = Graph.pageRankInt(nodes, edges, "node", "src", "dst",
        iterations = 3, r0 = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 405L, 2L -> 150L, 3L -> 150L))
  }

  test("personalizedPageRankInt: teleport mass returns to seeds only") {
    // 2-cycle, node 1 seeded, restart 20%, r0=1000.
    // start: r(1)=1000, r(2)=0
    // iter1: r(1) = 200 + (0*80) div 100 = 200
    //        r(2) = 0   + (1000*80) div 100 = 800
    // iter2: r(1) = 200 + (800*80) div 100 = 840
    //        r(2) = 0   + (200*80) div 100 = 160
    val nodes = Seq(1L, 2L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.personalizedPageRankInt(nodes, edges, "node", "src",
        "dst", seedCol = col("node") === 1L, iterations = 2,
        restartPct = 20, r0 = 1000L)
      .as[(Long, Long, Long)].collect()
      .map { case (n, _, r) => n -> r }.toMap
    assert(got == Map(1L -> 840L, 2L -> 160L))
  }

  test("personalizedPageRankInt: no seeds means all mass decays to 0") {
    val nodes = Seq(1L, 2L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.personalizedPageRankInt(nodes, edges, "node", "src",
        "dst", seedCol = lit(false), iterations = 2, restartPct = 20,
        r0 = 1000L)
      .as[(Long, Long, Long)].collect()
      .map { case (n, _, r) => n -> r }.toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  test("heldoutXent: Laplace unigram fit on train, OOV pays full bits") {
    // train "a a a b": T=4, V=2, k=bl(7)=3
    // test "a b z": terms 3−bl(4)=0, 3−bl(2)=1, OOV 3−bl(1)=2
    // xent_cb = (0+1+2)*100 div 3 = 100; oov_tokens = 1
    val toks = Seq(("g", true, "a"), ("g", true, "a"), ("g", true, "a"),
      ("g", true, "b"),
      ("g", false, "a"), ("g", false, "b"), ("g", false, "z"))
      .toDF("lang", "tr", "tok")
    val out = Vocab.heldoutXent(toks, "lang", "tok", col("tr"))
      .collect().head
    assert(out.getAs[Long]("train_tokens") == 4L &&
      out.getAs[Long]("train_vocab") == 2L)
    assert(out.getAs[Long]("n_test") == 3L &&
      out.getAs[Long]("oov_tokens") == 1L)
    assert(out.getAs[Long]("xent_cb") == 100L)
  }

  test("stationaryInt: weighted chain converges to the exact split") {
    // A -> B w3, A -> A w1; B -> A w1: P(A->B)=3/4, stationary ~ (2/5,3/5)
    val trans = Seq((1L, 2L, 3L), (1L, 1L, 1L), (2L, 1L, 1L))
      .toDF("src", "dst", "w")
    // r0=1000 each; iter1: from A: A gets 1000*1 div 4 = 250,
    //   B gets 1000*3 div 4 = 750; from B: A gets 1000 -> A=1250, B=750
    // iter2: A = 1250 div 4 + 750 = 1062, B = 1250*3 div 4 = 937
    // iter3: A = 1062 div 4 + 937 = 1202, B = 1062*3 div 4 = 796
    val got = Graph.stationaryInt(trans, "src", "dst", "w",
        iterations = 3, r0 = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1202L, 2L -> 796L))
  }

  test("stationaryInt: state with no outgoing weight drops its mass") {
    val trans = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val got = Graph.stationaryInt(trans, "src", "dst", "w",
        iterations = 2, r0 = 100L)
      .as[(Long, Long)].collect().toMap
    // iter1: node2 = 100 (from 1), node1 = 0; iter2: node2 = 0
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  // ---------------------------------------------------------------- HITS

  test("hitsInt: two hubs feeding one authority, hand-walked 2 iters") {
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    // r0 = 2^20. iter1: auth raw (1:r0, 3:2r0) → rescale (1:r0/2, 3:r0);
    // hubs from new auth (1:r0, 2:r0, 3:r0/2) → already max r0.
    // iter2: auth raw (1:r0/2, 3:2r0) → (1:r0/4, 3:r0); hubs
    // (1:r0, 2:r0, 3:r0/4).
    val got = Graph.hitsInt(nodes, edges, "node", "src", "dst",
        iterations = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap
    assert(got == Map(
      1L -> (1048576L, 262144L),
      2L -> (1048576L, 0L),
      3L -> (262144L, 1048576L)))
  }

  // -------------------------------------------------- label propagation

  test("labelPropagation: seeds clamp, modes spread, ties take min label") {
    val nodes = Seq((1L, Some(7L)), (2L, None), (3L, None), (4L, Some(9L)),
      (5L, None)).toDF("node", "lbl")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 3L), (4L, 5L)).toDF("src", "dst")
    // r1: 2<-{7}, 3<-{9} (2 unlabeled yet), 5<-{9}
    // r2: 3<-{7 from 2, 9 from 4} tie -> min 7
    val got = Graph.labelPropagation(nodes, edges, "node", "lbl",
        "src", "dst", rounds = 2)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == Map(1L -> Some(7L), 2L -> Some(7L), 3L -> Some(7L),
      4L -> Some(9L), 5L -> Some(9L)))
  }

  // ------------------------------------------------- temporal reach

  test("temporalReachability honors the nondecreasing-time constraint") {
    val seeds = Seq(1L).toDF("node")
    // 1->2 at t=10; 2->3 at t=5 is BEFORE arrival at 2 (unusable — a
    // static BFS would take it); 2->3 at t=20 works; 3->4 at t=15 is
    // before arrival at 3 -> 4 unreachable in 3 hops
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 5L), (2L, 3L, 20L),
      (3L, 4L, 15L)).toDF("src", "dst", "ts")
    val got = Graph.temporalReachability(seeds, edges, "node",
        "src", "dst", "ts", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> Long.MinValue, 2L -> 10L, 3L -> 20L))
  }

  test("temporalReachability: a later improvement re-expands the frontier") {
    val seeds = Seq(1L).toDF("node")
    // two routes to 3: direct at t=50, and via 2 arriving t=30; the round-2
    // improvement (50 -> 30) must re-relax 3's out-edge at t=40 (usable
    // from arrival 30, NOT from 50)
    val edges = Seq((1L, 3L, 50L), (1L, 2L, 10L), (2L, 3L, 30L),
      (3L, 4L, 40L)).toDF("src", "dst", "ts")
    val got = Graph.temporalReachability(seeds, edges, "node",
        "src", "dst", "ts", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> Long.MinValue, 2L -> 10L, 3L -> 30L, 4L -> 40L))
  }

  // -------------------------------------------------------------- EWMA

  test("ewmaDyadic: weights halve backwards, heads report partial wsum") {
    val df = Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 300L))
      .toDF("k", "t", "v")
    val got = Series.ewmaDyadic(df, "k", Seq("t"), "v", halfLives = 2)
      .orderBy($"t").select($"ewma_num", $"weight_sum")
      .as[(Long, Long)].collect().toSeq
    // weights: current 2, one back 1
    assert(got == Seq((200L, 2L), (500L, 3L), (800L, 3L)))
  }

  // ----------------------------------------------------------- anomaly

  test("rollingAnomaly: strict 3-sigma on the trailing window, warmup off") {
    val vals = Seq(10L, 20L, 25L, 31L)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("k", "t", "v")
    val got = Series.rollingAnomaly(df, "k", Seq("t"), "v", n = 2, sigmas = 3)
      .orderBy($"t").select($"baseline_n", $"anomaly")
      .as[(Long, Int)].collect().toSeq
    // rows 0,1: warmup (m<2). row 2: baseline {10,20}: (2·25−30)²=400 ≤
    // 9·(2·500−900)=900 → 0. row 3: baseline {20,25}: (2·31−45)²=289 >
    // 9·(2·1025−2025)=225 → 1.
    assert(got == Seq((0L, 0), (1L, 0), (2L, 0), (2L, 1)))
  }

  test("rollingAnomaly: zero-variance baseline flags any deviation") {
    val df = Seq(10L, 10L, 10L).zipWithIndex
      .map { case (v, i) => (1L, i.toLong, v) } :+ ((1L, 3L, 11L))
    val got = Series.rollingAnomaly(df.toDF("k", "t", "v"),
        "k", Seq("t"), "v", n = 2, sigmas = 3)
      .orderBy($"t").select($"anomaly").as[Int].collect().toSeq
    assert(got == Seq(0, 0, 0, 1))
  }

  // ------------------------------------------------------- boilerplate

  test("boilerplateNgrams: grams crossing the doc-frequency bar flag back") {
    val docs = Seq(
      (1L, "a b c a b c"), // trigrams: "a b c","b c a","c a b","a b c"
      (2L, "a b c x"),     // "a b c","b c x"
      (3L, "z z z"))       // "z z z"
      .toDF("doc_id", "text")
    // freqDiv=2 → boilerplate = gram in > 3/2 docs, i.e. ≥ 2 docs: "a b c"
    val got = Vocab.boilerplateNgrams(docs, "doc_id", "text", 3, 2)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 2L), (2L, 2L, 1L), (3L, 1L, 0L)))
  }

  // ------------------------------------------------------ feature hash

  test("featureHash: buckets in range, per-doc mass equals token count") {
    val docs = Seq((1L, "a b a c"), (2L, "a d")).toDF("doc_id", "text")
    val fh = Vocab.featureHash(docs, "doc_id", "text", buckets = 8)
    val perDoc = fh.groupBy($"doc_id").agg(sum($"n").as("m"))
      .as[(Long, Long)].collect().toMap
    assert(perDoc == Map(1L -> 4L, 2L -> 2L))
    assert(fh.filter($"bucket" < 0 || $"bucket" >= 8).isEmpty)
    // same token hashes to the same bucket in every doc
    val aBuckets = Vocab.featureHash(
      Seq((1L, "a"), (2L, "a")).toDF("doc_id", "text"), "doc_id", "text", 8)
      .select($"bucket").distinct().count()
    assert(aBuckets == 1L)
  }

  // ------------------------------------------------------ vocab encode

  test("vocabulary + encode: ids by (count desc, token), positions 1-based") {
    val docs = Seq((1L, "b b a"), (2L, "a c")).toDF("doc_id", "text")
    // counts: a=2, b=2, c=1 → a→1, b→2 (tie broken by token), c→3
    val got = Vocab.encode(docs, "doc_id", "text")
      .orderBy($"doc_id", $"pos")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq((1L, 1, 2), (1L, 2, 2), (1L, 3, 1),
      (2L, 1, 1), (2L, 2, 3)))
  }

  // ----------------------------------------------------- bitmap distinct

  test("bitmapDistinct: equals count(distinct), ids across word boundaries") {
    // ids straddle the 64-id word boundary and repeat
    val df = Seq((1L, 0L), (1L, 63L), (1L, 64L), (1L, 64L), (1L, 130L),
      (2L, 5L)).toDF("g", "id")
    val got = Sketches.bitmapDistinct(df, "g", "id")
      .orderBy($"g").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L), (2L, 1L)))
  }

  // --------------------------------------------------- winsorized stats

  test("winsorizedStats: values clamp to [p25, p75], n keeps the group size") {
    // sorted: 1,2,3,4,100 → n=5, p25 = rank ⌈5/4⌉=2 → 2, p75 = rank
    // ⌈15/4⌉... (3n+3)//4 = 4 → 4; clamped sum = 2+2+3+4+4 = 15
    val df = Seq(1L, 2L, 3L, 4L, 100L).map(("a", _)).toDF("g", "v")
    val got = Analytics.winsorizedStats(df, "g", "v")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 5L, 15L)))
  }

  // ----------------------------------------------------------- mode

  test("modePerGroup: most frequent value, ties break to the smallest") {
    val df = Seq(("a", 5L), ("a", 5L), ("a", 3L), ("a", 3L), ("a", 9L),
      ("b", 7L)).toDF("g", "v")
    val got = Analytics.modePerGroup(df, "g", "v")
      .orderBy($"g").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 2L), ("b", 7L, 1L))) // 3 and 5 tie at 2 → 3
  }

  // --------------------------------------------------- decontamination

  test("decontaminate: shared n-grams flag train docs, eval rows excluded") {
    val docs = Seq(
      (0L, "a b c d e"),   // eval: grams "a b c", "b c d", "c d e"
      (1L, "x b c d y"),   // shares "b c d" → contaminated
      (2L, "p q r s"),     // no shared gram
      (3L, "c d e c d e")) // shares "c d e" (distinct grams counted once each)
      .toDF("doc_id", "text")
    val got = Vocab.decontaminate(docs, "doc_id", "text",
        evalPred = col("doc_id") === 0, n = 3)
      .orderBy($"doc_id").as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 1L, 1), (2L, 0L, 0), (3L, 1L, 1)))
  }

  test("decontaminate: short docs survive with zero grams") {
    val docs = Seq((0L, "a b c"), (1L, "a b")).toDF("doc_id", "text")
    val got = Vocab.decontaminate(docs, "doc_id", "text",
        evalPred = col("doc_id") === 0, n = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0L, 0)))
  }

  // ------------------------------------------------------- PMI bigrams

  test("rfmSegments: segment-relative quintiles, id-tiebroken, code rollup") {
    // one segment, 5 entities with strictly increasing recency/freq/mon:
    // every entity lands in its own quintile on all three axes, so
    // rfm_code = 111·bin and each code holds exactly one entity
    val rows = for {
      e <- 1 to 5; _ <- 1 to e // entity e has e transactions
    } yield ("SEG", e.toLong, e * 10, e.toLong * 100)
    val df = rows.toDF("seg", "ent", "rec", "cents")
    val got = Analytics.rfmSegments(df, "seg", "ent", "rec", "cents")
      .orderBy($"rfm_code")
      .as[(String, Int, Long)].collect().toSeq
    assert(got == (1 to 5).map(b => ("SEG", b * 111, 1L)))
  }

  test("abcClasses: 80/95 boundaries are inclusive, tail classes C") {
    // values 80, 15, 5: cum shares 80 (A, boundary inclusive),
    // 95 (B, boundary inclusive), 100 (C)
    val df = Seq(("g", 1L, 80L), ("g", 2L, 15L), ("g", 3L, 5L))
      .toDF("grp", "item", "v")
    val got = Analytics.abcClasses(df, "grp", "item", "v")
      .orderBy($"abc_class")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("g", "A", 1L, 80L), ("g", "B", 1L, 15L),
      ("g", "C", 1L, 5L)))
  }

  test("pmiBigrams: scaled integer ratio, minCount prunes") {
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"))
      .toDF("doc_id", "text")
    // N=6 tokens; c_x=3, c_y=2, c_z=1
    val got = Vocab.pmiBigrams(docs, "doc_id", "text", minCount = 1, scale = 100)
      .orderBy($"xy").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("x y", 2L, 200L),  // (2·6·100) div (3·2)
      ("x z", 1L, 200L))) // (1·6·100) div (3·1)
    val pruned = Vocab.pmiBigrams(docs, "doc_id", "text", minCount = 2)
    assert(pruned.select($"xy").as[String].collect().toSeq == Seq("x y"))
  }

  // ---------------------------------------------------------- count-min

  test("countMinEstimates: estimate never undercounts; bar is relative") {
    import spark.implicits._
    // 60 a, 30 b, 10× one-off items; N=100, minFrac 5 → bar 20 keeps a,b
    val items = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++
      (1 to 10).map("c" + _)).toDF("item")
    val got = Sketches.countMinEstimates(items, "item", minFrac = 5)
      .orderBy($"item")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq("a", "b"))
    assert(got.map(_._2) == Seq(60L, 30L))
    got.foreach { case (i, cnt, est, over) =>
      assert(est >= cnt && over == est - cnt, s"$i undercounted: $est < $cnt")
    }
  }

  test("countMinEstimates: width 2 forces collisions, estimate bounded by N") {
    import spark.implicits._
    // two buckets per row: whatever the sha layout, cnt <= est <= N holds
    // and the heavy item's estimate is exact-or-inflated, never deflated
    val items = (Seq.fill(8)("x") ++ Seq.fill(5)("y") ++ Seq.fill(2)("z"))
      .toDF("item")
    val got = Sketches.countMinEstimates(items, "item", width = 2, minFrac = 4)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1).sorted == Seq("x", "y"))
    got.foreach { case (i, cnt, est, over) =>
      assert(est >= cnt && est <= 15 && over == est - cnt,
        s"$i estimate $est outside [cnt=$cnt, N=15]")
    }
  }

  // ---------------------------------------------------------------- hll

  test("hllCompare: exact side correct, estimate within HLL error bounds") {
    import spark.implicits._
    val keys = (0L until 5000L).toDF("k")
    val r = Sketches.hllCompare(keys, "k")
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 == 64L && r._2 == 5000L)
    // m=64 → relative std error ~13%; 2 sigma of deterministic headroom
    // (the build is pure arithmetic — this pins hash quality, not luck)
    assert(math.abs(r._4) < 2600, s"err_bp ${r._4} outside 26%")
    assert(r._4 == (r._3 - r._2) * 10000 / r._2,
      "err_bp must be consistent with the reported estimate")
  }

  // ----------------------------------------------------- phrase search

  test("phraseMatches: overlapping matches count, longer phrases chain") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),     // "a a" twice (overlap), "a a a" once
      (2L, "a b a"),       // no adjacent pair
      (3L, "x a a y a a")) // "a a" twice, disjoint
      .toDF("doc_id", "text")
    val two = Vocab.phraseMatches(docs, "doc_id", "text", Seq("a", "a"))
      .orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    assert(two == Seq((1L, 2L), (3L, 2L)))
    val three = Vocab.phraseMatches(docs, "doc_id", "text", Seq("a", "a", "a"))
      .as[(Long, Long)].collect().toSeq
    assert(three == Seq((1L, 1L)))
  }

  // ----------------------------------------------- largest remainder

  test("largestRemainderAlloc: exact total, remainders break the tie") {
    import spark.implicits._
    // weights 1,1,1 and 7 slots: floors 2,2,2 (sum 6), remainders equal
    // → the leftover slot goes to the smallest key
    val w = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("g", "n")
    val got = Analytics.largestRemainderAlloc(w, "g", "n", 7)
      .orderBy($"g").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 3L), ("b", 1L, 2L), ("c", 1L, 2L)))
    assert(got.map(_._3).sum == 7L)
  }

  test("largestRemainderAlloc: proportionality with mixed weights") {
    import spark.implicits._
    // W=10, slots=10 → alloc == weight exactly, no leftover
    val w = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("g", "n")
    val got = Analytics.largestRemainderAlloc(w, "g", "n", 10)
      .orderBy($"g").as[(String, Long, Long)].collect().toSeq
    assert(got.map(_._3) == Seq(5L, 3L, 2L))
  }

  // ---------------------------------------------------- weighted median

  test("weightedMedian: heavy weight drags the median to its value") {
    import spark.implicits._
    // values 1..5 weight 1, plus value 9 weight 10: tot 15, half at 7.5 →
    // crossing row is value 9 (cum 5 → 15); unweighted median would be 3
    val df = ((1L to 5L).map(v => ("g", v, 1L, v)) :+ ("g", 9L, 10L, 99L))
      .toDF("g", "v", "w", "id")
    val got = Analytics.weightedMedian(df, "g", "v", "w", Seq("id"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 15L, 9L)))
  }

  test("weightedMedian: uniform weights reduce to the lower median") {
    import spark.implicits._
    val df = (1L to 4L).map(v => ("g", v, 3L, v)).toDF("g", "v", "w", "id")
    // cum 3,6,9,12; tot 12 → first 2·cum >= 12 is v=2 (the lower median)
    val got = Analytics.weightedMedian(df, "g", "v", "w", Seq("id"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 12L, 2L)))
  }

  // ------------------------------------------------------- gini (Lorenz)

  test("giniCoefficientBp: uniform is 0, concentration approaches 10000") {
    import spark.implicits._
    val df = (Seq.fill(4)(10L).zipWithIndex.map { case (v, i) => ("u", v, i.toLong) } ++
      Seq(("c", 0L, 0L), ("c", 0L, 1L), ("c", 0L, 2L), ("c", 100L, 3L)))
      .toDF("g", "v", "id")
    val got = Analytics.giniCoefficientBp(df, "g", "v", "id")
      .orderBy($"g").as[(String, Long, Long)].collect().toSeq
    // concentrated: n=4, s=100, i_s=400 → (800-500)*10000/400 = 7500
    assert(got == Seq(("c", 4L, 7500L), ("u", 4L, 0L)))
  }

  // ------------------------------------------- histogram quantile audit

  test("histogramQuantiles: estimate is the bin floor at the target rank") {
    import spark.implicits._
    // 100 values 0..99, 10 bins → p50 k=50 → value 49 sits in bin 4
    // (floor 40); exact p50 = 49, so err = -9; p99 k=99 → bin 9 floor 90,
    // exact 98, err -8
    val df = (0L until 100L).map(v => ("g", v, v)).toDF("g", "v", "id")
    val got = Sketches.histogramQuantiles(df, "g", "v", "id", bins = 10,
        quantilesBp = Seq(5000, 9900))
      .orderBy($"q_bp")
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 5000, 40L, 49L, -9L), ("g", 9900, 90L, 98L, -8L)))
  }

  test("histogramQuantiles: degenerate one-value group estimates exactly") {
    import spark.implicits._
    val df = Seq.fill(5)(("g", 7L)).zipWithIndex
      .map { case ((g, v), i) => (g, v, i.toLong) }.toDF("g", "v", "id")
    val got = Sketches.histogramQuantiles(df, "g", "v", "id",
        quantilesBp = Seq(5000))
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 5000, 7L, 7L, 0L)))
  }

  // ------------------------------------------------------------ novelty

  test("ngramNovelty: copies score 0, partial overlap scores the fraction") {
    import spark.implicits._
    // d1 "a b c d" → shingles {abc, bcd}, all first-seen → 10000;
    // d2 identical text → both grams first seen at d1 → 0;
    // d3 "a b c x" → {abc (old), bcx (new)} → 5000
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c x"))
      .toDF("doc_id", "text")
    val got = Vocab.ngramNovelty(docs, "doc_id", "text", 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 10000L), (2L, 2L, 0L, 0L),
      (3L, 2L, 1L, 5000L)))
  }

  // ---------------------------------------------------------------- KMV

  test("kmvCompare: below-k groups report exactly, err 0") {
    import spark.implicits._
    val df = (1L to 40L).map(i => ("g", i % 10)).toDF("g", "k")
    val got = Sketches.kmvCompare(df, "g", "k", k = 64)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 10L, 10L, 0L)))
  }

  test("kmvCompare: bounded agg matches the window-sort derivation") {
    import spark.implicits._
    // two groups, 500 / 300 distinct keys, k = 16 — cross-check the
    // TopKAgg bottom-k fold against an independent window-rank h_k
    val df = ((1L to 500L).map(i => ("a", i)) ++
      (1L to 300L).map(i => ("b", i * 7 + 1))).toDF("g", "k")
    val got = Sketches.kmvCompare(df, "g", "k", k = 16)
      .orderBy($"g")
      .as[(String, Long, Long, Long)].collect().toSeq
    val hashed = df.selectExpr("g", "(k * 2654435761L) % 4294967296L AS h0")
      .selectExpr("g", "h0 ^ (h0 div 65536) AS h1")
      .selectExpr("g", "(h1 * 2146121005L) % 4294967296L AS h2")
      .selectExpr("g", "h2 ^ (h2 div 8192) AS h").distinct()
    import org.apache.spark.sql.expressions.Window
    val want = hashed
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"h")))
      .filter($"rn" === 16)
      .selectExpr("g", "CAST(15 * 4294967296L div h AS BIGINT) AS est")
      .orderBy($"g").as[(String, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._3)) == want)
    assert(got.map(_._2) == Seq(500L, 300L))
    // determinism under physical layout changes
    val got2 = Sketches.kmvCompare(df.repartition(7), "g", "k", k = 16)
      .orderBy($"g").as[(String, Long, Long, Long)].collect().toSeq
    assert(got2 == got)
  }

  test("kmvIntersect: exact below k, zero-overlap estimate path, ordering") {
    import spark.implicits._
    // a = b = {1..40}, c = {101..140} disjoint, d = half-a half-c
    val df = ((1L to 40L).map(("a", _)) ++ (1L to 40L).map(("b", _)) ++
      (101L to 140L).map(("c", _)) ++
      ((1L to 20L) ++ (101L to 120L)).map(("d", _))).toDF("g", "k")
    val out = Sketches.kmvIntersect(df, "g", "k", k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(out.size == 6 && out.keySet.forall { case (x, y) => x < y })
    // identical 40-key groups: merged sketch < k → everything exact
    assert(out(("a", "b")) == (40L, 40L, 10000L, 40L, 40L))
    // half-overlap, union 60 < k → exact jaccard 20/60, intersection 20
    assert(out(("a", "d")) == (60L, 20L, 3333L, 60L, 20L))
    assert(out(("c", "d")) == (60L, 20L, 3333L, 60L, 20L))
    // disjoint, union 80 > k → estimate path: no common, positive union
    val (nk, common, jacc, union, inter) = out(("a", "c"))
    assert(nk == 64L && common == 0L && jacc == 0L && inter == 0L)
    assert(union > 0L)
  }
  test("bpeTrain: weighted argmax, merge cascade, token curve, early stop") {
    import spark.implicits._
    // words: "aa" x2, "ab" x1 → round 1 merges (a,a) with weight 2;
    // round 2 merges the remaining (a,b); round 3 finds no pairs → stop
    val got = Vocab.bpeTrain(Seq("aa ab", "aa").toDF("text"), "text", 3)
      .orderBy("round")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "a", 2L, 4L), (2L, "a", "b", 1L, 3L)))
  }

  test("bpeTrain: overlap counting vs one-pass leftmost merge convention") {
    import spark.implicits._
    // " a a a a ": (a,a) counted 3 (overlaps), but one replace pass
    // merges only the leftmost pair of the run → " aa a a "; the rest
    // merges over later rounds (ties break to lexicographically least)
    val got = Vocab.bpeTrain(Seq("aaaa").toDF("text"), "text", 4)
      .orderBy("round")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "a", 3L, 3L), (2L, "a", "a", 1L, 2L),
      (3L, "aa", "aa", 1L, 1L)))
  }

  test("bpeApply: rank-ordered merges, per-type fold, occurrence weights") {
    import spark.implicits._
    // merges (a,b) then (ab,c): "abc" -> 1 token, "cab" -> 2 ("c","ab"),
    // "aab" -> 2 ("a","ab"), "dd" untouched -> 2 chars 2 tokens
    val docs = Seq((1L, "abc cab abc"), (2L, "aab dd")).toDF("id", "text")
    val out = Vocab.bpeApply(docs, "id", "text",
        Seq(("a", "b"), ("ab", "c")))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
         r.getAs[Long]("n_chars"))).toMap
    assert(out(1L) == (3L, 1L + 2L + 1L, 9L))
    assert(out(2L) == (2L, 2L + 2L, 5L))
  }

  test("bpeApply: train-apply round trip reproduces the trainer's count") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab aa")).toDF("id", "text")
    val merges = Vocab.bpeTrain(docs.select($"text"), "text", 2)
      .orderBy($"round").collect()
      .map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b"))).toSeq
    val applied = Vocab.bpeApply(docs, "id", "text", merges).collect().head
    // trainer reported corpus_tokens after its final merge — apply agrees
    assert(applied.getAs[Long]("n_tokens") == 3L) // "aa","ab","aa" → 1 each
  }

  test("zipfFit: exact OLS over floored-log rank/frequency pairs") {
    // one lang; freqs 8,4,2 at ranks 1,2,3 -> x=(0,1,1), y=(3,2,1)
    // n=3 sx=2 sy=6 sxy=3 sxx=2 -> num = 9-12 = -3, den = 6-4 = 2
    // decay_milli = 3000 div 2 = 1500
    val docs = Seq(("l", "a a a a a a a a"), ("l", "b b b b"), ("l", "c c"))
      .toDF("lang", "text")
    val out = Vocab.zipfFit(docs, "lang", "text").collect().head
    assert(out.getAs[Long]("n") == 3L && out.getAs[Long]("num") == -3L &&
      out.getAs[Long]("den") == 2L &&
      out.getAs[Long]("decay_milli") == 1500L)
    // minCount floors hapax tokens out of the fit
    val noisy = Seq(("l", "a a a a hapax"), ("l", "a a a a b b"))
      .toDF("lang", "text")
    assert(Vocab.zipfFit(noisy, "lang", "text").collect()
      .head.getAs[Long]("n") == 2L)
  }

  test("sketch rollup: weekly register max-merge equals the one-shot build") {
    import org.apache.spark.sql.functions.{expr, max, posexplode}
    val df = (0L until 500L).map(i => (i % 97, i % 4)).toDF("k", "wk")
    val weekly = df.groupBy($"wk").agg(expr("hll_regs(k, 6)").as("r"))
      .select(posexplode($"r")).groupBy($"pos").agg(max($"col").as("rho"))
    val once = df.agg(expr("hll_regs(k, 6)").as("r"))
      .select(posexplode($"r")).select($"pos", $"col".as("rho2"))
    val j = weekly.join(once, "pos")
    assert(j.count() == 64L)
    assert(j.filter($"rho" =!= $"rho2").count() == 0L)
  }

  test("unseenMass: hapax share forecasts OOV probability") {
    // lang l: a x8, b x1, c x1 -> N=10, V=3, hapax=2 -> unseen 200000 ppm
    val docs = Seq(("l", "a a a a a a a a b c")).toDF("lang", "text")
    val out = Vocab.unseenMass(docs, "lang", "text").collect().head
    assert(out.getAs[Long]("n_tokens") == 10L &&
      out.getAs[Long]("n_types") == 3L)
    assert(out.getAs[Long]("hapax") == 2L && out.getAs[Long]("dis") == 0L)
    assert(out.getAs[Long]("unseen_ppm") == 200000L &&
      out.getAs[Long]("ttr_ppm") == 300000L)
  }

  test("dsirWeights matches a from-scratch model of the dyadic gain formula") {
    // independent reimplementation: same sha256-prefix bucketing, add-one
    // dyadic floors via bit length — any drift in the operator's hashing,
    // smoothing, or aggregation breaks the exact comparison
    val docs = Seq(
      (1L, "alpha alpha beta", true),
      (2L, "alpha gamma", true),
      (3L, "delta delta delta", false),
      (4L, "beta delta epsilon", false)).toDF("doc_id", "text", "tgt")
    val buckets = 64
    def bucketOf(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("SHA-256")
        .digest(tok.getBytes("UTF-8")).take(2)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    def bitLen(x: Long): Long = if (x == 0L) 1L else 64L - java.lang.Long.numberOfLeadingZeros(x)
    val corpus = Seq(
      (1L, "alpha alpha beta", true), (2L, "alpha gamma", true),
      (3L, "delta delta delta", false), (4L, "beta delta epsilon", false))
    val perDoc = corpus.flatMap { case (id, text, tgt) =>
      text.split("\\s+").filter(_.nonEmpty).map(t => (id, bucketOf(t), tgt))
    }.groupBy(x => (x._1, x._2)).map { case ((id, b), xs) =>
      (id, b, xs.size.toLong, xs.head._3)
    }.toSeq
    val byBucket = perDoc.groupBy(_._2).map { case (b, xs) =>
      b -> (xs.map(_._3).sum, xs.filter(_._4).map(_._3).sum)
    }
    val rawTot = byBucket.values.map(_._1).sum
    val tgtTot = byBucket.values.map(_._2).sum
    val gain = byBucket.map { case (b, (raw, tg)) =>
      b -> ((bitLen(rawTot + buckets) - bitLen(raw + 1)) -
            (bitLen(tgtTot + buckets) - bitLen(tg + 1)))
    }
    val expected = corpus.map { case (id, _, tgt) =>
      val mine = perDoc.filter(_._1 == id)
      id -> (tgt, mine.map(_._3).sum, mine.map(x => x._3 * gain(x._2)).sum)
    }.toMap
    val got = Vocab.dsirWeights(docs, "doc_id", "text", $"tgt", buckets)
      .as[(Long, Boolean, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == expected)
    // direction sanity on this fixture: target-only vocabulary scores above
    // raw-only vocabulary per token
    assert(got(2L)._3 / got(2L)._2 >= got(3L)._3 / got(3L)._2)
  }

  // --------------------------------------- sample-quantile sketch

  test("sampleQuantiles: census case (n <= k) returns exact lower " +
      "quantiles; null rows dropped") {
    val df = ((1 to 10).map(i => (Some("a"), Some(i.toLong), i.toLong)) :+
      ((Option.empty[String], Some(99L), 98L)) :+
      ((Some("a"), Option.empty[Long], 99L)))
      .toDF("g", "v", "id")
    val got = Sketches.sampleQuantiles(df, "g", "v", "id", k = 256)
      .orderBy($"p_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // m = n = 10; idx = ceil(p*10): p50 -> 5th = 5, p90 -> 9, p99 -> 10
    assert(got == Seq(("a", 500000L, 10L, 10L, 5L),
      ("a", 900000L, 10L, 10L, 9L), ("a", 990000L, 10L, 10L, 10L)))
  }

  test("sampleQuantilesMerged == sampleQuantiles when sampling is real " +
      "(n > k) — merge-invariance of bottom-k") {
    val df = (1 to 100).map(i => ("g" + (i % 2), i.toLong * 10, i.toLong))
      .toDF("g", "v", "id")
    val one = Sketches.sampleQuantiles(df, "g", "v", "id", k = 8)
      .orderBy($"g", $"p_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val merged = Sketches.sampleQuantilesMerged(df, "g", pmod($"id", lit(3)),
        "v", "id", k = 8)
      .orderBy($"g", $"p_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(one == merged)
    assert(one.forall { case (_, _, n, m, _) => n == 50 && m == 8 })
  }

  test("sampleQuantileAudit: census estimates carry rank error < 1e6/n; " +
      "rank_le equals the estimate's exact rank") {
    val df = (1 to 20).map(i => ("a", i.toLong, i.toLong)).toDF("g", "v", "id")
    val got = Sketches.sampleQuantileAudit(df, "g", "v", "id", k = 256)
      .orderBy($"p_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    got.foreach { case (_, pPpm, n, m, est, rankLe, err) =>
      assert(n == 20 && m == 20)
      assert(est == ((pPpm * 20 + 999999) / 1000000)) // distinct 1..20
      assert(rankLe == est)                           // values are 1..n
      assert(err < 1000000 / 20, s"p=$pPpm err=$err")
    }
  }
}
