package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-computable fixtures for the round-4 mining operators (q124–q129
  * run the same code against the DuckDB oracle; these pin semantics on
  * inputs small enough to verify by eye, plus the Bloom exactness
  * guarantee the synthetic corpus can't isolate). */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------- bloom semi-join

  test("bloomSemiJoin: bit-identical to a plain semi-join") {
    val fact = (1L to 200L).map(i => (i % 50, i)).toDF("k", "payload")
    val dim = Seq(3L, 7L, 11L, 49L, 999L).toDF("dk")
    val got = Sketches.bloomSemiJoin(fact, dim, "k", "dk")
      .select($"k", $"payload").as[(Long, Long)].collect().toSet
    val want = fact.join(dim, $"k" === $"dk", "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got.map(_._1) == Set(3L, 7L, 11L, 49L))
  }

  test("bloomSemiJoin: exact even when the filter is saturated with FPs") {
    // 64 bits + 1 hash for 40 keys → filter nearly all-ones; the exact
    // verify join must still remove every false positive
    val fact = (1L to 300L).toDF("k")
    val dim = (1L to 80L).filter(_ % 2 == 0).toDF("dk")
    val got = Sketches.bloomSemiJoin(fact, dim, "k", "dk",
        mBits = 64, kHashes = 1)
      .as[Long].collect().toSet
    assert(got == (2L to 80L by 2).toSet)
  }

  // ------------------------------------------------------ grouped slope

  test("groupedSlope: exact scaled slopes, including negative truncation") {
    // g1: y = 2x -> 20000. g2: n=3, sx=4, sy=4, sxy=1, sxx=10 ->
    // (3*1-16)*10000 div (3*10-16) = -130000 div 14 = -9285 (toward zero,
    // matching DuckDB's `//`). g3: zero x-variance -> NULL.
    val df = Seq(
      ("g1", 0, 0), ("g1", 1, 2), ("g1", 2, 4),
      ("g2", 0, 3), ("g2", 1, 1), ("g2", 3, 0),
      ("g3", 5, 1), ("g3", 5, 9)).toDF("g", "x", "y")
    val got = Mining.groupedSlope(df, "g", "x", "y")
      .as[(String, Long, Option[Long])].collect()
      .map { case (g, n, s) => g -> ((n, s)) }.toMap
    assert(got == Map(
      "g1" -> ((3L, Some(20000L))),
      "g2" -> ((3L, Some(-9285L))),
      "g3" -> ((2L, None))))
  }

  // --------------------------------------------------------------- gini

  test("giniImpurity: pure group 0, 2-way even split 5000") {
    val df = Seq(("p", "a"), ("p", "a"), ("p", "a"),
      ("m", "a"), ("m", "a"), ("m", "b"), ("m", "b")).toDF("g", "c")
    val got = Mining.giniImpurity(df, "g", "c")
      .select($"g", $"gini_scaled").as[(String, Long)].collect().toMap
    assert(got("p") == 0L)
    // n=4, ss=8: (16-8)*10000 div 16 = 5000
    assert(got("m") == 5000L)
  }

  // ---------------------------------------------------------------- mrr

  test("firstRelevantRank: rank of first hit, scale div rank") {
    val df = Seq(("s", 30.0, 1L), ("s", 20.0, 13L), ("s", 10.0, 26L),
      ("t", 9.0, 2L), ("t", 8.0, 3L)).toDF("seg", "score", "id")
    val got = Mining.firstRelevantRank(df, "seg",
        Seq($"score".desc, $"id".asc), $"id" % 13 === 0)
      .as[(String, Option[Long], Long, Option[Long])].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    assert(got("s") == ((Some(2L), 2L, Some(500000L))))
    assert(got("t") == ((None, 0L, None)))
  }

  // -------------------------------------------------------- set jaccard

  test("groupSetJaccard: exact overlap in basis points, duplicates ignored") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 3),
      ("b", 2), ("b", 3), ("b", 4), ("c", 9)).toDF("g", "e")
    val got = Mining.groupSetJaccard(df, "g", "e").collect()
    assert(got.length == 1) // only (a,b) intersect; c pairs drop out
    val r = got.head
    assert(r.getAs[Long]("inter") == 2L)
    assert(r.getAs[Long]("union_size") == 4L)
    assert(r.getAs[Long]("jaccard_bp") == 5000L) // 2*10000 div 4
  }

  // ---------------------------------------------------------------- chi2

  test("chi2TokenLabel: hand-checked 2x2 tables") {
    // x: nt=2,a=2 -> chi2 = 4*16/(2*2*2*2) = 4 -> 40000
    // y: nt=3,a=1 -> ad-bc = -2, chi2 = 4*4/12 -> 13333 truncated
    val docs = Seq((1L, "x y", "en"), (2L, "x", "en"),
      (3L, "y", "de"), (4L, "y", "de")).toDF("doc_id", "text", "lang")
    val got = Mining.chi2TokenLabel(docs, "doc_id", "text",
        $"lang" === "en", minDocs = 1)
      .select($"token", $"chi2_scaled").as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 40000L, "y" -> 13333L))
  }

  // --------------------------------------------------------------- drift

  test("cohortDrift: mean gap and F-ratio on tiny cohorts") {
    // A = {0,2}, B = {1,3}: means 1 vs 2 -> gap 10000; vars 2 vs 2 -> 10000
    val df = Seq(("g", true, 0L), ("g", true, 2L),
      ("g", false, 1L), ("g", false, 3L),
      ("h", true, 5L), ("h", false, 1L), ("h", false, 2L)).toDF("g", "c", "v")
    val got = Mining.cohortDrift(df, "g", $"c", "v")
      .select($"g", $"mean_gap_scaled", $"var_ratio_scaled")
      .as[(String, Option[Long], Option[Long])].collect()
      .map { case (g, m, v) => g -> ((m, v)) }.toMap
    assert(got("g") == ((Some(10000L), Some(10000L))))
    // h: single-row cohort A -> n1-1 = 0 kills the F-ratio denominator
    assert(got("h")._2.isEmpty)
  }

  // ----------------------------------------------------------- dup spans

  test("duplicatedSpans: islands of corpus-duplicated positions") {
    // bigrams: "a b" x3, "b c" x3 duplicated; d1 dup positions {1,2,4,5}
    // -> two runs of 2; d2 {1,2} -> one run of 2; d3 has no dup grams
    val docs = Seq((1L, "a b c a b c x"), (2L, "a b c q"),
      (3L, "z z1 z2")).toDF("doc_id", "text")
    val got = Vocab.duplicatedSpans(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, np, nd, nr, mr) => id -> ((np, nd, nr, mr)) }.toMap
    assert(got(1L) == ((6L, 4L, 2L, 2L)))
    assert(got(2L) == ((3L, 2L, 1L, 2L)))
    assert(got(3L) == ((2L, 0L, 0L, 0L)))
  }

  // ------------------------------------------------------------ surprisal

  test("unigramSurprisal: floored self-information from binary lengths") {
    // corpus: a a a b -> N=4 (bin len 3); c(a)=3 (len 2), c(b)=1 (len 1)
    // bits(a) = 3-2 = 1, bits(b) = 3-1 = 2
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val got = Vocab.unigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Long, Option[Long])].collect()
      .map { case (id, n, s, m) => id -> ((n, s, m)) }.toMap
    assert(got(1L) == ((3L, 3L, Some(100L))))
    assert(got(2L) == ((1L, 2L, Some(200L))))
  }

  // ----------------------------------------------------- bigram surprisal

  test("bigramSurprisal: floored conditional bits, no-bigram doc NULL mean") {
    // unigrams a:2 b:3 c:1; bigrams "a b":2 "b a":1 "b c":1
    // d1: 0 + 1 + 0 = 1 over 3 -> mean 33; d2: bits(3)-bits(1) = 1 -> 100
    val docs = Seq((1L, "a b a b"), (2L, "b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = Vocab.bigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Long, Option[Long])].collect()
      .map { case (id, n, s, m) => id -> ((n, s, m)) }.toMap
    assert(got(1L) == ((3L, 1L, Some(33L))))
    assert(got(2L) == ((1L, 1L, Some(100L))))
    assert(got(3L) == ((0L, 0L, None)))
  }

  // --------------------------------------------------- incremental dedup

  test("incrementalDupFlags: exact hash, shared-shingle near, clean miss") {
    val docs = Seq(
      (1L, "a b c d e f g", false), (2L, "z1 z2 z3 z4 z5 z6 z7", false),
      (3L, "a b c d e f g", true),  // exact copy of old doc 1
      (4L, "a b c d e f x", true),  // shares 4 of 5 trigrams with doc 1
      (5L, "q w e r t y u", true)   // no overlap
    ).toDF("doc_id", "text", "nu")
    val got = Similarity.incrementalDupFlags(docs, "doc_id", "text",
        isNew = $"nu", n = 3, minShared = 4, maxShingleDocs = 50)
      .as[(Long, Int, Long, Int)].collect()
      .map { case (id, e, nn, d) => id -> ((e, nn, d)) }.toMap
    assert(got(3L) == ((1, 1L, 1)))
    assert(got(4L) == ((0, 1L, 1)))
    assert(got(5L) == ((0, 0L, 0)))
    assert(got.size == 3) // old docs never appear in the output
  }

  // ------------------------------------------------------ rolling median

  test("rollingMedian: lower median of the trailing frame") {
    // frames of 3 over [5,1,3,2]: [5]->5, [1,5]->1, [1,3,5]->3, [1,2,3]->2
    val df = Seq((1L, 1L, 5L), (1L, 2L, 1L), (1L, 3L, 3L), (1L, 4L, 2L))
      .toDF("u", "seq", "v")
    val got = Series.rollingMedian(df, "u", Seq("seq"), "v", n = 3)
      .select($"seq", $"roll_median").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 5L, 2L -> 1L, 3L -> 3L, 4L -> 2L))
  }

  // ---------------------------------------------------------------- auc

  test("groupAuc: tie-aware Mann-Whitney pair counting") {
    // g: pos {3,2}, neg {3,1,1} -> won 4, tied 1 -> (8+1)*10000 div 12
    // p: perfect separation -> 10000; z: no negatives -> NULL
    val df = Seq(
      ("g", 3L, true), ("g", 2L, true),
      ("g", 3L, false), ("g", 1L, false), ("g", 1L, false),
      ("p", 5L, true), ("p", 6L, true), ("p", 1L, false),
      ("z", 4L, true)).toDF("g", "s", "lbl")
    val got = Mining.groupAuc(df, "g", "s", $"lbl")
      .as[(String, Long, Long, Option[Long])].collect()
      .map { case (g, p, n, a) => g -> ((p, n, a)) }.toMap
    assert(got("g") == ((2L, 3L, Some(7500L))))
    assert(got("p") == ((2L, 1L, Some(10000L))))
    assert(got("z") == ((1L, 0L, None)))
  }

  // ---------------------------------------------------------------- corr

  test("groupedCorr: sign + scaled r-squared, zero variance NULL") {
    // g1: y = 2x -> (+1, 10000); g2: y = -x -> (-1, 10000);
    // g3: constant y -> sign 0, r2 NULL
    val df = Seq(
      ("g1", 0, 0), ("g1", 1, 2), ("g1", 2, 4),
      ("g2", 0, 0), ("g2", 1, -1), ("g2", 2, -2),
      ("g3", 0, 7), ("g3", 1, 7)).toDF("g", "x", "y")
    val got = Mining.groupedCorr(df, "g", "x", "y")
      .as[(String, Long, Long, Option[Long])].collect()
      .map { case (g, n, s, r) => g -> ((n, s, r)) }.toMap
    assert(got("g1") == ((3L, 1L, Some(10000L))))
    assert(got("g2") == ((3L, -1L, Some(10000L))))
    assert(got("g3") == ((2L, 0L, None)))
  }

  // ------------------------------------------------------------- entropy

  test("flooredEntropy: digit-count diversity, pure group 0") {
    // p: one category -> 0; m: 2+2 of 4 -> exactly 1.00 bits (100);
    // u: 3+1 of 4 -> 3*(3-2) + 1*(3-1) = 5 -> 5*100 div 4 = 125
    val df = Seq(("p", "a"), ("p", "a"), ("p", "a"), ("p", "a"),
      ("m", "a"), ("m", "a"), ("m", "b"), ("m", "b"),
      ("u", "a"), ("u", "a"), ("u", "a"), ("u", "b")).toDF("g", "c")
    val got = Mining.flooredEntropy(df, "g", "c")
      .select($"g", $"ent_bits_x100").as[(String, Long)].collect().toMap
    assert(got == Map("p" -> 0L, "m" -> 100L, "u" -> 125L))
  }

  // --------------------------------------------------------- basket lift

  test("basketPairLift: pair counts, lift, duplicate rows ignored") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (3L, "a")).toDF("bk", "it")
    val got = Mining.basketPairLift(df, "bk", "it")
      .select($"item_a", $"item_b", $"n_ab", $"lift_scaled")
      .as[(String, String, Long, Long)].collect()
      .map { case (a, b, n, l) => (a, b) -> ((n, l)) }.toMap
    // N=3; c_a=3 c_b=2 c_c=1; (a,b):2 -> 3*2e4 div 6 = 10000;
    // (b,c):1 -> 3*1e4 div 2 = 15000
    assert(got(("a", "b")) == ((2L, 10000L)))
    assert(got(("a", "c")) == ((1L, 10000L)))
    assert(got(("b", "c")) == ((1L, 15000L)))
  }

  test("basketPairLift: maxBasket drops oversized baskets before the join") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (3L, "a")).toDF("bk", "it")
    val got = Mining.basketPairLift(df, "bk", "it", maxBasket = 2)
      .select($"item_a", $"item_b", $"n_ab", $"n_baskets", $"lift_scaled")
      .as[(String, String, Long, Long, Long)].collect()
    // basket 1 (size 3) excluded -> N=2, only (a,b):1, lift 2e4 div 2
    assert(got.toSeq == Seq(("a", "b", 1L, 2L, 10000L)))
  }

  // --------------------------------------------------------------- kappa

  test("cohenKappa: chance-corrected agreement, degenerate group NULL") {
    // g: a = x,x,y,x / b = x,x,y,y -> N=4 agree=3, r=(3,1) c=(2,2),
    // rc=8 -> (12-8)*10000 div (16-8) = 5000
    // p: perfect 2-category agreement -> 10000
    // d: both raters constant same label -> p_e = 1 -> NULL
    val df = Seq(
      ("g", "x", "x"), ("g", "x", "x"), ("g", "y", "y"), ("g", "x", "y"),
      ("p", "u", "u"), ("p", "v", "v"),
      ("d", "w", "w"), ("d", "w", "w")).toDF("g", "a", "b")
    val got = Mining.cohenKappa(df, "g", "a", "b")
      .as[(String, Long, Long, Option[Long])].collect()
      .map { case (g, n, ag, k) => g -> ((n, ag, k)) }.toMap
    assert(got("g") == ((4L, 3L, Some(5000L))))
    assert(got("p") == ((2L, 2L, Some(10000L))))
    assert(got("d") == ((2L, 2L, None)))
  }

  // ------------------------------------------------------------- kmeans

  test("kmeansAssign: nearest centroid wins, id breaks distance ties") {
    // k=2 -> centroids are vecs 1 and 2; vec 3 sits at distance 8 from
    // c1 and 0 from c2; vec 4 is equidistant -> lower cid wins
    val emb = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.002f, 0.002f)),
      (3L, Array(0.002f, 0.002f)),
      (4L, Array(0.001f, 0.001f))).toDF("vec_id", "embedding")
    val got = Mining.kmeansAssign(emb, "vec_id", "embedding", k = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (k, c, d) => k -> ((c, d)) }.toMap
    assert(got(1L) == ((1L, 0L)))
    assert(got(2L) == ((2L, 0L)))
    assert(got(3L) == ((2L, 0L)))
    // quantized (1,1): dist 2 to both centroids -> cid 1
    assert(got(4L) == ((1L, 2L)))
  }

  test("semdedupReps: closest member represents, id breaks ties") {
    // same fixture: cluster 1 = {1 (d=0), 4 (d=2)} -> rep 1, n=2;
    // cluster 2 = {2 (d=0), 3 (d=0)} -> tie at 0, lower id 2 wins
    val emb = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.002f, 0.002f)),
      (3L, Array(0.002f, 0.002f)),
      (4L, Array(0.001f, 0.001f))).toDF("vec_id", "embedding")
    val got = Mining.semdedupReps(emb, "vec_id", "embedding", k = 2)
      .orderBy($"cluster")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 0L, 2L), (2L, 2L, 0L, 2L)))
  }

  test("negativeSample: hash candidates minus actual interactions") {
    // nItems = 10: user 1 candidates for i=0..2 are
    // (1*2654435761 + i*40503) % 10 + 1 = 2, 5, 8 — interaction (1,5)
    // removes the middle one; user 2's candidates 3, 6, 9 all survive
    val users = Seq(Tuple1(1L), Tuple1(2L)).toDF("u")
    val inter = Seq((1L, 5L), (1L, 5L), (7L, 2L)).toDF("u", "item")
    val got = Mining.negativeSample(users, inter, "u", "item",
        k = 3, nItems = 10L)
      .orderBy($"u", $"sample_idx")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 2L), (1L, 2L, 8L),
      (2L, 0L, 3L), (2L, 1L, 6L), (2L, 2L, 9L)))
  }

  // --------------------------------------------------------- acf / cusum

  test("acf: perfectly alternating series — lag 1 anti, lag 2 perfect") {
    // x = 1,3,1,3,1,3: lag-1 pairs correlate -1 (r2=10000, sign -1);
    // lag-2 pairs correlate +1; missing ticks contribute no pair
    val s = Seq((0, 1L), (1, 3L), (2, 1L), (3, 3L), (4, 1L), (5, 3L))
      .toDF("t", "x")
    val got = Series.acf(s, "t", "x", maxLag = 2)
      .orderBy($"lag")
      .as[(Int, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq((1, 5L, -1L, Some(10000L)), (2, 4L, 1L, Some(10000L))))
  }

  test("acf: constant series has zero variance -> NULL r2") {
    val s = Seq((0, 2L), (1, 2L), (2, 2L)).toDF("t", "x")
    val got = Series.acf(s, "t", "x", maxLag = 1)
      .as[(Int, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq((1, 2L, 0L, None)))
  }

  test("cusumChangepoint: level shift peaks at the last pre-shift tick") {
    // g: 2,2,2,8,8 (n=5, S=22): dev*n = 10x-22 -> -12,-12,-12,18,18;
    // cusum = -12,-24,-36,-18,0 -> |max| at t=2. h: flat -> cusum 0,
    // earliest tick wins
    val df = Seq(
      ("g", 0, 2L), ("g", 1, 2L), ("g", 2, 2L), ("g", 3, 8L), ("g", 4, 8L),
      ("h", 0, 4L), ("h", 1, 4L))
      .flatMap { case (g, t, x) => Seq.fill(x.toInt)((g, t, 1L)) }
      .toDF("g", "t", "one")
    val got = Series.cusumChangepoint(df, "g", "t", "one")
      .orderBy($"g")
      .as[(String, Long, Int, Long)].collect().toSeq
    assert(got == Seq(("g", 5L, 2, -36L), ("h", 2L, 0, 0L)))
  }

  test("theilSenSlopeBp: median slope shrugs off a single outlier") {
    // key a: perfect line x = 10t → every pairwise slope 100000 bp
    // key b: line x = t with one wild endpoint; 3 of 6 pair slopes are
    // 10000 and the sorted (n+1) div 2 = 3rd element stays 10000 —
    // where the OLS slope would be dragged to ~900000 bp
    val df = Seq(
      ("a", 0L, 0L), ("a", 1L, 10L), ("a", 2L, 20L),
      ("b", 0L, 0L), ("b", 1L, 1L), ("b", 2L, 2L), ("b", 3L, 300L))
      .toDF("k", "t", "x")
    val got = Series.theilSenSlopeBp(df, "k", "t", "x")
      .orderBy($"k").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 100000L), ("b", 6L, 10000L)))
  }

  test("theilSenSlopeBp: negative slopes truncate toward zero like DuckDB") {
    // slope (0-1)·10000 / 3 = -3333.33 → trunc -3333, not floor -3334
    val df = Seq(("k", 0L, 1L), ("k", 3L, 0L)).toDF("k", "t", "x")
    val got = Series.theilSenSlopeBp(df, "k", "t", "x")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("k", 1L, -3333L)))
  }

  test("ohlcBars: open/close by (ts,id) order, ts ties broken by id") {
    val df = Seq(
      // key k, bucket 0 (ts 0-9): open = ts2/id1 value 30 (ts tie with
      // id2 broken by id), close = ts 9, high/low across all
      ("k", 2L, 1L, 30L), ("k", 2L, 2L, 99L), ("k", 9L, 3L, 5L),
      // bucket 1: single row → open=high=low=close
      ("k", 11L, 4L, 7L))
      .toDF("key", "ts", "id", "v")
    val got = Series.ohlcBars(df, "key", "ts", "id", "v", bucketUs = 10L)
      .orderBy($"bucket")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("k", 0L, 3L, 30L, 99L, 5L, 5L),
      ("k", 1L, 1L, 7L, 7L, 7L, 7L)))
  }

  test("rollingSlopeBp: exact slope in window, short prefix, single row NULL") {
    // y = 2t exactly → slope 20000 once ≥2 points; first row NULL
    val df = Seq(("k", 0L, 0L), ("k", 1L, 2L), ("k", 2L, 4L), ("k", 3L, 6L))
      .toDF("g", "t", "x")
    val got = Series.rollingSlopeBp(df, "g", "t", "x", n = 3)
      .orderBy($"t")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(("k", 0L, 0L, None), ("k", 1L, 2L, Some(20000L)),
      ("k", 2L, 4L, Some(20000L)), ("k", 3L, 6L, Some(20000L))))
  }

  test("kendallTauBp: perfect ascent 10000, descent -10000, ties counted") {
    val df = Seq(
      ("up", 0L, 1L), ("up", 1L, 2L), ("up", 2L, 3L),
      ("dn", 0L, 3L), ("dn", 1L, 2L), ("dn", 2L, 1L),
      ("tie", 0L, 5L), ("tie", 1L, 5L), ("tie", 2L, 9L))
      .toDF("k", "t", "x")
    val got = Series.kendallTauBp(df, "k", "t", "x")
      .orderBy($"k")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("dn", 3L, 0L, 3L, 0L, -10000L),
      ("tie", 3L, 2L, 0L, 1L, 6666L), // (2-0)*10000 div 3
      ("up", 3L, 3L, 0L, 0L, 10000L)))
  }

  test("interpolateDaily: interior gaps take the floored line, edges observed") {
    // key k: observed (0,0), (4,10) → days 1..3 get 2,5,7 (floor of 2.5i)
    val df = Seq(("k", 0L, 0L), ("k", 4L, 10L)).toDF("g", "d", "x")
    val got = Series.interpolateDaily(df, "g", "d", "x")
      .orderBy($"day").as[(String, Long, Long, Int)].collect().toSeq
    assert(got == Seq(("k", 0L, 0L, 1), ("k", 1L, 2L, 0), ("k", 2L, 5L, 0),
      ("k", 3L, 7L, 0), ("k", 4L, 10L, 1)))
  }

  test("interpolateDaily: descending segments truncate toward zero") {
    // (0,10) → (3,0): day 1 = 10 + (-10*1) div 3 = 10 - 3 = 7 (trunc -3.33)
    val df = Seq(("k", 0L, 10L), ("k", 3L, 0L)).toDF("g", "d", "x")
    val got = Series.interpolateDaily(df, "g", "d", "x")
      .orderBy($"day").as[(String, Long, Long, Int)].collect().toSeq
    assert(got.map(_._3) == Seq(10L, 7L, 4L, 0L))
  }

  test("dowSeasonal: slot means floored, worst deviation per slot") {
    // days 0..13 → each dow slot twice; slot 0 sees 10 and 15 →
    // mean (10+15) div 2 = 12, resid max = |15-12| = 3
    val df = (0L until 14L).map(d => (d, if (d == 0) 10L else if (d == 7) 15L else d))
      .toDF("d", "x")
    val got = Series.dowSeasonal(df, "d", "x")
      .orderBy($"dow")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.head == (0L, 2L, 12L, 3L))
    // slot 3 sees x=3 and x=10 → mean 6, max resid 4
    assert(got(3) == (3L, 2L, 6L, 4L))
  }

  // --------------------------------------------------------------- NDCG

  test("ndcgAtK: hand-computed DCG/IDCG, perfect ranking = 10000") {
    // g: score order 1,2,3 (id 4 past k=3): DCG = 7·100 + 0·63 + 1·50
    // = 750; ideal rel order 1,4,3: IDCG = 7·100 + 3·63 + 1·50 = 939;
    // 7500000 div 939 = 7987. p: score order == ideal order → 10000.
    val df = Seq(
      ("g", 1L, 40L, 3L), ("g", 2L, 30L, 0L),
      ("g", 3L, 20L, 1L), ("g", 4L, 10L, 2L),
      ("p", 5L, 9L, 2L), ("p", 6L, 8L, 1L)).toDF("g", "id", "score", "rel")
    val got = Mining.ndcgAtK(df, "g",
        Seq($"score".desc, $"id".asc), Seq($"rel".desc, $"id".asc),
        $"rel", k = 3, weights = Seq(100L, 63L, 50L))
      .orderBy($"g")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(("g", 750L, 939L, Some(7987L)),
      ("p", 363L, 363L, Some(10000L))))
  }

  test("ndcgAtK: all-zero relevance gives NULL (0 div 0 guarded)") {
    val df = Seq(("z", 1L, 5L, 0L), ("z", 2L, 4L, 0L))
      .toDF("g", "id", "score", "rel")
    val got = Mining.ndcgAtK(df, "g",
        Seq($"score".desc, $"id"), Seq($"rel".desc, $"id"),
        $"rel", k = 2, weights = Seq(100L, 63L))
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(("z", 0L, 0L, None)))
  }

  // -------------------------------------------- precision / recall @ k

  test("precisionRecallAtK: small group caps k_eff, zero-relevant NULL recall") {
    // g: 5 rows ranked by score desc, relevant = {idx 1, 4 in rank order},
    // k=3 → top-3 holds 1 relevant: P = 3333, R (of 2) = 5000.
    // h: 2 rows, none relevant → k_eff 2, P 0, R NULL.
    val df = Seq(
      ("g", 1L, 50L, true), ("g", 2L, 40L, false), ("g", 3L, 30L, false),
      ("g", 4L, 20L, true), ("g", 5L, 10L, false),
      ("h", 6L, 9L, false), ("h", 7L, 8L, false)).toDF("g", "id", "score", "rel")
    val got = Mining.precisionRecallAtK(df, "g",
        Seq($"score".desc, $"id"), $"rel", k = 3)
      .orderBy($"g")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      ("g", 3L, 1L, 2L, 3333L, Some(5000L)),
      ("h", 2L, 0L, 0L, 0L, None)))
  }

  // ------------------------------------------------------ confusion/F1

  test("confusionStats: cells and F1 from a hand confusion table") {
    // tp=2 fp=1 fn=1 tn=2 → P = 2/3 → 6666, R = 2/3 → 6666,
    // F1 = 4·10⁴ div 6 = 6666
    val df = Seq(
      ("s", true, true), ("s", true, true), ("s", true, false),
      ("s", false, true), ("s", false, false), ("s", false, false))
      .toDF("g", "pred", "truth")
    val got = Mining.confusionStats(df, "g", $"pred", $"truth")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(("s", 2L, 1L, 1L, 2L,
      Some(6666L), Some(6666L), Some(6666L))))
  }

  test("confusionStats: degenerate groups report NULL, not fake zero") {
    // never-predicts-positive → precision NULL; no actual positives →
    // recall NULL; F1 NULL only when tp=fp=fn=0
    val df = Seq(("a", false, true), ("a", false, false),
      ("b", false, false)).toDF("g", "pred", "truth")
    val got = Mining.confusionStats(df, "g", $"pred", $"truth")
      .orderBy($"g")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      ("a", 0L, 0L, 1L, 1L, None, Some(0L), Some(0L)),
      ("b", 0L, 0L, 0L, 1L, None, None, None)))
  }

  // -------------------------------------------------------- gap report

  test("gapReport: contiguous missing-day islands inside each key's span") {
    // k: observed 0,1,4,5,9 → gaps [2,3] (2 days) and [6,8] (3 days);
    // dense key m: no gap rows at all
    val df = Seq(("k", 0L), ("k", 1L), ("k", 4L), ("k", 5L), ("k", 9L),
      ("m", 3L), ("m", 4L)).toDF("g", "d")
    val got = Series.gapReport(df, "g", "d")
      .orderBy($"g", $"gap_start")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("k", 2L, 3L, 2L), ("k", 6L, 8L, 3L)))
  }

  // ------------------------------------------- reference percentile

  test("referencePercentile: inclusive ties, ref-free group NULL") {
    // refs in g: 10, 20, 30; scored 25 → 2 of 3 ≤ → 6666; 30 ties
    // inclusive → 10000; 5 → 0. group h has no refs → NULL.
    val df = Seq(
      ("g", 1L, 10L, true), ("g", 2L, 20L, true), ("g", 3L, 30L, true),
      ("g", 4L, 25L, false), ("g", 5L, 30L, false), ("g", 6L, 5L, false),
      ("h", 7L, 99L, false)).toDF("g", "id", "v", "ref")
    val got = Analytics.referencePercentile(df, "g", "id", "v", $"ref")
      .orderBy($"id")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(("g", 4L, 25L, Some(6666L)),
      ("g", 5L, 30L, Some(10000L)), ("g", 6L, 5L, Some(0L)),
      ("h", 7L, 99L, None)))
  }

  // ---------------------------------------------------------- proration

  test("prorateSpan: Hamilton day allocation conserves every cent") {
    // 10 cents over days 5..7 → 4,3,3; 2 cents over 1..4 → 1,1,0,0
    val df = Seq((10L, 5L, 7L), (2L, 1L, 4L)).toDF("cents", "sd", "ed")
    val got = Analytics.prorateSpan(df, "cents", "sd", "ed")
      .orderBy($"sd", $"day")
      .select($"day", $"day_cents").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L),
      (5L, 4L), (6L, 3L), (7L, 3L)))
    val total = Analytics.prorateSpan(df, "cents", "sd", "ed")
      .agg(sum($"day_cents")).as[Long].head()
    assert(total == 12L, "allocation must conserve the input total")
  }

  // -------------------------------------------------------- l-diversity

  test("lDiversity: distinct-l verdicts and dominant-share bp") {
    val df = Seq(
      ("A", "x", 1), ("A", "x", 1), ("A", "x", 2), ("A", "x", 3),
      ("A", "y", 7), ("A", "y", 7),
      ("B", "x", 1), ("B", "x", 2), ("B", "x", 2), ("B", "x", 2), ("B", "x", 2))
      .toDF("qi1", "qi2", "sens")
    val got = Privacy.lDiversity(df, Seq("qi1", "qi2"), "sens", l = 3)
      .orderBy($"qi1", $"qi2")
      .as[(String, String, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      ("A", "x", 4L, 3L, 5000L, "ok"),
      ("A", "y", 2L, 1L, 10000L, "violates"),
      ("B", "x", 5L, 2L, 8000L, "violates")))
  }

  test("stlLite: v = trend + seasonal + residual holds exactly") {
    val sq = spark
    import sq.implicits._
    // 21 consecutive days, v = 70 + 7*dow (pure weekly signal): interior
    // trend = sum of a full week / 7 = 91 (flat), det captures the dow
    // offset exactly, residuals are 0
    val daily = (0L until 21L).map(d => ("k", d, 70L + 7L * (d % 7)))
      .toDF("k", "d", "v")
    val out = Series.stlLite(daily, "k", "d", "v")
      .orderBy($"d").collect()
    out.foreach { r =>
      val (d, v) = (r.getAs[Long]("d"), r.getAs[Long]("v"))
      if (d >= 3 && d <= 17) {
        assert(r.getAs[Long]("trend_num") == 637L, s"d=$d") // 91*7
        // identity: v = trend_num/7 + seas_num/seas_den + res_num/res_den
        val (tn, sn, sd, rn, rd) = (r.getAs[Long]("trend_num"),
          r.getAs[Long]("seas_num"), r.getAs[Long]("seas_den"),
          r.getAs[Long]("res_num"), r.getAs[Long]("res_den"))
        assert(rd == sd)
        assert(v * 7 * sd == tn * sd + 7 * sn + 7 * rn, s"identity at d=$d")
        assert(rn == 0L, s"pure weekly signal -> zero residual at d=$d")
      } else {
        assert(r.get(r.fieldIndex("trend_num")) == null)
      }
    }
  }

  test("cmhTerms: per-stratum margins and exact CMH term") {
    val sq = spark
    import sq.implicits._
    // stratum s: rows (treat, outcome): TT, TF, FT, FF, TT
    // n=5, a=2, r1=3, c1=3 -> term = 2*5 - 9 = 1 over 5 -> 200000 ppm
    val df = Seq((true, true), (true, false), (false, true),
      (false, false), (true, true)).map(t => ("s", t._1, t._2))
      .toDF("st", "t", "o")
    val out = Stats.cmhTerms(df, "st", "t", "o").collect()
    assert(out.toSeq == Seq(Row("s", 5L, 2L, 3L, 3L, 1L, 5L, 200000L)))
  }

  test("skewReport: top keys, shares, and the skew factor") {
    val sq = spark
    import sq.implicits._
    // keys: a x6, b x2, c x1, d x1 -> total 10, 4 keys, max 6
    // skew = 6*4*10000 div 10 = 24000 (2.4x a perfect spread)
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val out = Analytics.skewReport(df, "k", k = 2)
      .select($"rk", $"k", $"n", $"share_bp", $"n_keys", $"max_n",
        $"skew_bp").orderBy($"rk").collect()
    assert(out.toSeq == Seq(
      Row(1L, "a", 6L, 6000L, 4L, 6L, 24000L),
      Row(2L, "b", 2L, 2000L, 4L, 6L, 24000L)))
  }

  test("columnDiff: added/removed/per-column change counts, null-safe") {
    val sq = spark
    import sq.implicits._
    val a = Seq((1L, Some(10L), "x"), (2L, Some(20L), "y"),
      (3L, None, "z")).toDF("k", "v", "s")
    val b = Seq((1L, Some(10L), "x2"), (3L, Some(5L), "z"),
      (9L, Some(1L), "n")).toDF("k", "v", "s")
    val got = Analytics.columnDiff(a, b, "k", Seq("v", "s"))
      .as[(String, Long)].collect().toMap
    // key 2 removed; key 9 added; key 1 changed s; key 3 changed v
    // (null -> 5 counts as a change under null-safe equality)
    assert(got == Map("added" -> 1L, "removed" -> 1L,
      "changed_v" -> 1L, "changed_s" -> 1L))
  }

  test("ols2 recovers an exact planar fit via Cramer's rule") {
    val sq = spark
    import sq.implicits._
    // y = 10 + 2*x1 + 3*x2 exactly -> scaled coefficients are exact
    val df = Seq((0L, 0L, 10L), (1L, 0L, 12L), (0L, 1L, 13L),
      (1L, 1L, 15L), (2L, 1L, 17L)).map { case (a, b, y) => ("g", a, b, y) }
      .toDF("g", "x1", "x2", "y")
    val out = Mining.ols2(df, "g", "x1", "x2", "y").collect()
    assert(out.toSeq ==
      Seq(Row("g", 5L, 100000L, 20000L, 30000L)))
  }

  test("mixShift decomposes share vs rate movement exactly") {
    val sq = spark
    import sq.implicits._
    val df = Seq(("x", "A", 2L, 200L), ("x", "B", 1L, 300L),
      ("y", "A", 2L, 100L), ("y", "B", 3L, 300L))
      .toDF("seg", "period", "n", "s")
    val got = Analytics.mixShift(df, "seg", "period", "n", "s")
      .select($"seg", $"share_a_ppm", $"rate_a", $"share_b_ppm", $"rate_b",
        $"mix_contrib", $"rate_contrib")
      .orderBy($"seg").collect()
    assert(got.toSeq == Seq(
      Row("x", 500000L, 100L, 250000L, 300L, -25000000L, 50000000L),
      Row("y", 500000L, 50L, 750000L, 100L, 12500000L, 37500000L)))
  }

  test("tCloseness: TV distance vs global incl. missing-value cells") {
    val sq = spark
    import sq.implicits._
    // group A: sens a,a,b; group B: sens b. global a:2 b:2, N=4
    // A: |2*4-2*3| + |1*4-2*3| = 4 over 2*3*4 = 24 -> 1666 bp
    // B: missing a contributes |0-2*1| = 2; b: |1*4-2*1| = 2 -> 4/8 = 5000 bp
    val df = Seq(("A", "a"), ("A", "a"), ("A", "b"), ("B", "b"))
      .toDF("qi", "sens")
    val got = Privacy.tCloseness(df, Seq("qi"), "sens")
      .select($"qi", $"n_group", $"n_total",
        $"t_num".cast("long"), $"t_den".cast("long"), $"t_bp")
      .orderBy($"qi")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 3L, 4L, 4L, 24L, 1666L),
      ("B", 1L, 4L, 4L, 8L, 5000L)))
  }
  test("bestSplit: exact Gini argmin, ties broken by the smaller threshold") {
    // 1,2 positive / 3,4 negative -> v<=2 is a perfect split (score 0)
    val df = Seq(("g", 1L, true), ("g", 2L, true),
      ("g", 3L, false), ("g", 4L, false)).toDF("g", "v", "y")
    val out = Mining.bestSplit(df, "g", "v", col("y")).collect().head
    assert(out.getAs[Long]("threshold") == 2L &&
      out.getAs[Long]("score_ppm") == 0L)
    assert(out.getAs[Long]("n") == 4L && out.getAs[Long]("n_pos") == 2L)
    assert(out.getAs[Long]("n_left") == 2L &&
      out.getAs[Long]("pos_left") == 2L)
    // alternating labels: thresholds 1 and 3 tie at 333333 ppm -> pick 1
    val tie = Seq(("t", 1L, true), ("t", 2L, false),
      ("t", 3L, true), ("t", 4L, false)).toDF("g", "v", "y")
    val to = Mining.bestSplit(tie, "g", "v", col("y")).collect().head
    assert(to.getAs[Long]("threshold") == 1L &&
      to.getAs[Long]("score_ppm") == 333333L)
  }

  test("clusterQuality: exact dispersion, nearest-centroid gap, ratio") {
    // seeds 1 -> (0,0) and 2 -> (1000,1000); satellites at dist2 = 4 each
    val emb = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(1.0f, 1.0f)),
      (3L, Array(0.0f, 0.002f)),
      (4L, Array(1.0f, 1.002f))).toDF("vec_id", "embedding")
    val out = Mining.clusterQuality(emb, "vec_id", "embedding", k = 2)
      .orderBy($"cluster").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq == Seq(
      (1L, 2L, 4L, 2L, 2000000L, 100000000L),
      (2L, 2L, 4L, 2L, 2000000L, 100000000L)))
  }

  test("ipsEval: exact IPS/SNIPS fractions from logged bandit rows") {
    // matches contribute r*w; n=4, matched=3
    // ips_num = 1*4 + 0*2 + 1*1 = 5; snips_den = 4 + 2 + 1 = 7
    val df = Seq(("g", true, 1L, 4L), ("g", true, 0L, 2L),
      ("g", false, 1L, 1L), ("g", true, 1L, 1L)).toDF("g", "m", "r", "w")
    val out = Mining.ipsEval(df, "g", col("m"), col("r"), col("w"))
      .collect().head
    assert(out.getAs[Long]("n") == 4L && out.getAs[Long]("n_matched") == 3L)
    assert(out.getAs[Long]("ips_num") == 5L &&
      out.getAs[Long]("snips_den") == 7L)
    assert(out.getAs[Long]("ips_milli") == 1250L &&
      out.getAs[Long]("snips_milli") == 714L)
  }

  test("generalizationLadder: first level meeting k is chosen") {
    val df = Seq((1, "x"), (1, "x"), (2, "x"), (1, "y"), (1, "y"), (1, "y"))
      .toDF("a", "b")
    val out = Privacy.generalizationLadder(df,
      Seq(Seq("a", "b"), Seq("b")), k = 2)
      .orderBy($"level").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (0L, 3L, 1L, 1L, false, false),
      (1L, 2L, 3L, 0L, true, true)))
  }

  test("nbTextConfusion: separable vocab classifies, zero counts penalize") {
    // en vocab {cat, dog}; nl vocab {kat, hond}; V=4
    // doc a (cat cat dog): pos_en = 3*bl(4) = 9, score_en = 9 - 3*bl(10) = -3
    //                      pos_nl = 3*bl(1) = 3, score_nl = 3 - 3*bl(8) = -9
    val docs = Seq((1L, "en", "cat cat dog"), (2L, "nl", "kat kat hond"),
      (3L, "en", "cat dog dog"), (4L, "nl", "   ")).toDF("id", "lang", "text")
    val out = Mining.nbTextConfusion(docs, "id", "text", "lang")
      .orderBy($"true_lang", $"pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // the zero-token doc is not dropped: it reconciles as '(empty)'
    assert(out.toSeq == Seq(("en", "en", 2L), ("nl", "(empty)", 1L),
      ("nl", "nl", 1L)))
  }

  test("liftCurve: top bin captures its positives, bottom reaches 100%") {
    // scores 4,3,2,1; positives at 4 and 1; bins=2
    // bin1 {4,3}: cum_pos=1/tot_pos=2 -> gain 5000; lift 1*4*1e4/(2*2)=1e4
    // bin2 {2,1}: cum_pos=2 -> gain 10000; lift 2*4*1e4/(4*2)=1e4
    val df = Seq(("g", 1L, 4L, true), ("g", 2L, 3L, false),
      ("g", 3L, 2L, false), ("g", 4L, 1L, true)).toDF("g", "id", "s", "y")
    val out = Mining.liftCurve(df, "g", "s", "id", col("y"), bins = 2)
      .orderBy($"bin").collect()
      .map(r => (r.getInt(1), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    assert(out.toSeq == Seq((1, 2L, 1L, 5000L, 10000L),
      (2, 4L, 2L, 10000L, 10000L)))
    // a perfect ranker's top bin shows lift = bins x
    val perfect = Seq(("g", 1L, 9L, true), ("g", 2L, 8L, true),
      ("g", 3L, 2L, false), ("g", 4L, 1L, false)).toDF("g", "id", "s", "y")
    val top = Mining.liftCurve(perfect, "g", "s", "id", col("y"), 2)
      .orderBy($"bin").collect().head
    assert(top.getAs[Long]("gain_bp") == 10000L &&
      top.getAs[Long]("lift_bp") == 20000L)
  }

  test("multiclassF1: one-vs-rest counts, macro means, micro is accuracy") {
    val conf = Seq(("a", "a", 5L), ("a", "b", 1L), ("b", "b", 3L),
      ("b", "a", 2L), ("c", "b", 1L)).toDF("t", "p", "n")
    val out = Mining.multiclassF1(conf, "t", "p", "n")
      .orderBy($"cls").collect()
      .map(r => r.getString(0) -> r).toMap
    // a: tp 5, n_true 6, n_pred 7 -> prec 7142, rec 8333, f1 7692
    assert(out("a").getAs[Long]("prec_bp") == 7142L)
    assert(out("a").getAs[Long]("rec_bp") == 8333L)
    assert(out("a").getAs[Long]("f1_bp") == 7692L)
    // c is never predicted: prec NULL (not fake 0), rec 0, f1 0
    assert(out("c").isNullAt(out("c").fieldIndex("prec_bp")))
    assert(out("c").getAs[Long]("rec_bp") == 0L)
    assert(out("c").getAs[Long]("f1_bp") == 0L)
    // macro = (7692+6000+0)/3 = 4564; micro = 8/12 = 6666
    assert(out("(macro)").getAs[Long]("f1_bp") == 4564L)
    assert(out("(micro)").getAs[Long]("f1_bp") == 6666L)
  }

  test("kneePoint: max chord distance picks the bend, ties to smaller x") {
    // chord (1,100)-(5,22): |−78x − 4y + 478| peaks at x=3 (124)
    val df = Seq(("g", 1L, 100L), ("g", 2L, 50L), ("g", 3L, 30L),
      ("g", 4L, 25L), ("g", 5L, 22L)).toDF("g", "x", "y")
    val out = Analytics.kneePoint(df, "g", "x", "y").collect().head
    assert(out.getAs[Long]("x1") == 1L && out.getAs[Long]("y1") == 100L)
    assert(out.getAs[Long]("x2") == 5L && out.getAs[Long]("y2") == 22L)
    assert(out.getAs[Long]("knee_x") == 3L &&
      out.getAs[Long]("knee_y") == 30L)
    // a straight line: every distance 0 -> tie breaks to the SMALLEST x
    val line = (1L to 4L).map(i => ("h", i, 10L * i)).toDF("g", "x", "y")
    val o2 = Analytics.kneePoint(line, "g", "x", "y").collect().head
    assert(o2.getAs[Long]("knee_x") == 1L)
  }

  test("hhiBp: monopoly 10000, k equals 10000/k, single floor") {
    // g: one member -> 10000; h: 4 equal members -> 2500
    // i: shares 3/4 and 1/4 -> (9+1)*10000/16 = 6250
    val df = (Seq(("g", 1L)) ++ (1L to 4L).map(("h", _)) ++
      Seq(("i", 1L), ("i", 1L), ("i", 1L), ("i", 2L))).toDF("grp", "m")
    val out = Analytics.hhiBp(df, "grp", "m").orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq(("g", 1L, 10000L), ("h", 4L, 2500L),
      ("i", 2L, 6250L)))
  }

  test("collapseRareCategories: sub-threshold labels fold into (other)") {
    val df = Seq("a", "a", "a", "b", "c").toDF("cat")
    val out = Analytics.collapseRareCategories(df, "cat", 2L)
      .orderBy($"category").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.toSeq == Seq(("(other)", 2L, 2L, true), ("a", 3L, 1L, false)))
  }

  test("qiniCurve: pure finder shows zero uplift, real uplift shows") {
    // 8 units, bins=2; treat = id odd; top bin {8,7,6,5}
    // finder: label = score >= 5 regardless of arm -> top bin:
    // cum_pos_t=2, cum_pos_c=2, cum_n_t=cum_n_c=2 -> qini = 2000-2000 = 0
    val finder = (1L to 8L).map(i => ("g", i, i, i % 2 == 1, i >= 5))
      .toDF("g", "id", "s", "t", "l")
    val f = Mining.qiniCurve(finder, "g", "s", "id", col("t"), col("l"), 2)
      .orderBy($"bin").collect()
    assert(f.head.getAs[Long]("qini_milli") == 0L)
    // uplift: only TREATED high scorers convert -> top bin:
    // cum_pos_t=2, cum_pos_c=0 -> qini = 2000
    val uplift = (1L to 8L).map(i =>
      ("g", i, i, i % 2 == 1, i >= 5 && i % 2 == 1))
      .toDF("g", "id", "s", "t", "l")
    val u = Mining.qiniCurve(uplift, "g", "s", "id", col("t"), col("l"), 2)
      .orderBy($"bin").collect()
    assert(u.head.getAs[Long]("qini_milli") == 2000L)
    // all-treated prefix (no control baseline) -> NULL, not fake zero
    val allc = (1L to 4L).map(i => ("g", i, i, true, i >= 3))
      .toDF("g", "id", "s", "t", "l")
    val a = Mining.qiniCurve(allc, "g", "s", "id", col("t"), col("l"), 2)
      .orderBy($"bin").collect()
    assert(a.head.isNullAt(a.head.fieldIndex("qini_milli")))
  }

  test("averagePrecision: per-term floored ppm, imbalance-honest") {
    // positives at ranks 1 and 4: (1e6 + 2*1e6/4) / 2 = 750000
    val df = Seq(("g", 1L, 4L, true), ("g", 2L, 3L, false),
      ("g", 3L, 2L, false), ("g", 4L, 1L, true)).toDF("g", "id", "s", "y")
    val out = Mining.averagePrecision(df, "g", "s", "id", col("y"))
      .collect().head
    assert(out.getAs[Long]("n") == 4L && out.getAs[Long]("n_pos") == 2L)
    assert(out.getAs[Long]("ap_ppm") == 750000L)
    // no positives -> NULL, not a fake zero
    val none = Seq(("h", 1L, 4L, false)).toDF("g", "id", "s", "y")
    assert(Mining.averagePrecision(none, "g", "s", "id", col("y"))
      .collect().head.isNullAt(3))
  }

  test("bestThreshold: asymmetric costs pick the exact argmin cutoff") {
    // scores 1n 2p 3n 4p; costFp=1 costFn=2
    // t=0 (all pos): cost 2; t=1: fp={3} cost 1; t=2: fn={2} fp={3} cost 3
    val df = Seq(("g", 1L, false), ("g", 2L, true), ("g", 3L, false),
      ("g", 4L, true)).toDF("g", "s", "y")
    val out = Mining.bestThreshold(df, "g", "s", col("y"), 1L, 2L)
      .collect().head
    assert(out.getAs[Long]("threshold") == 1L && out.getAs[Long]("cost") == 1L)
    assert(out.getAs[Long]("fn_at") == 0L && out.getAs[Long]("fp_at") == 1L)
    assert(out.getAs[Long]("n_pos") == 2L && out.getAs[Long]("n_neg") == 2L)
  }

  test("priceIndex: matched basket, base quantities frozen, exact bp") {
    // item A: month 1 p=100 q=2; month 2 p=150 (q ignored at t>0)
    // item B: month 1 p=50 q=4; month 2 p=50
    // index m2 = (150*2 + 50*4) / (100*2 + 50*4) = 500/400 -> 12500 bp
    val df = Seq((1L, 1L, 100L, 2L), (1L, 2L, 150L, 9L),
      (2L, 1L, 50L, 4L), (2L, 2L, 50L, 1L)).toDF("i", "t", "up", "q")
    val out = Analytics.priceIndex(df, "i", "t", "up", "q")
      .orderBy($"t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 2L, 10000L), (2L, 2L, 12500L)))
  }

  test("ebSmoothedRate: small n shrinks to global, large n stays raw") {
    // tiny bucket 1/1; big bucket 500/1000 -> global = 501/1001
    val df = (Seq(("t", true)) ++
      (1 to 500).map(_ => ("b", true)) ++
      (1 to 500).map(_ => ("b", false))).toDF("g", "hit")
    val out = Analytics.ebSmoothedRate(df, "g", $"hit", 100L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("raw_ppm"), r.getAs[Long]("smoothed_ppm"))).toMap
    val globalPpm = 501L * 1000000L / 1001L
    // tiny bucket: (1e6 + 100*global) / 101 — far from its raw 100%
    assert(out("t")._1 == 1000000L)
    assert(out("t")._2 == (1000000L + 100L * globalPpm) / 101L)
    // big bucket barely moves: within 1% of raw 500000
    assert(math.abs(out("b")._2 - 500000L) < 10000L)
  }

  test("microaggregate: runs of k..2k-1, floored run means, tiny stratum") {
    // 5 values, k=2 -> runs {10,20} and {30,40,50} (last absorbs odd one)
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 30L),
      ("g", 4L, 40L), ("g", 5L, 50L), ("t", 9L, 7L)).toDF("s", "id", "v")
    val out = Privacy.microaggregate(df, "s", "id", "v", k = 2)
      .orderBy($"s", $"id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5),
        r.getBoolean(6)))
    assert(out.toSeq == Seq(
      ("g", 1L, 2L, 15L, true), ("g", 2L, 2L, 15L, true),
      ("g", 3L, 3L, 40L, true), ("g", 4L, 3L, 40L, true),
      ("g", 5L, 3L, 40L, true),
      // sub-k stratum collapses to one clamped run, flagged meets_k=false
      ("t", 9L, 1L, 7L, false)))
  }

  test("errAtK matches the two-rank dyadic hand example") {
    import spark.implicits._
    // r1 g=3 (R=7/8), r2 g=1 (R=1/8):
    // ERR = 7/8 + (1/2)(1/8)(1/8) = 0.8828125 -> 882812 ppm floored
    val df = Seq(("q", 1, 3L), ("q", 2, 1L)).toDF("g", "rnk", "grade")
    val out = Mining.errAtK(df, "g", "rnk", col("grade"), k = 2)
      .collect()
    assert(out.toSeq == Seq(Row("q", 2L, 882812L)))
  }

}
