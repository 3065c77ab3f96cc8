package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the exact-statistics operators: the doubled
  * mid-rank Mann–Whitney, the cross-multiplied KS fraction, the prefix-min
  * clamped balance identity, LOCF time weighting, and run counting. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("mannWhitneyU matches the hand-ranked tied example") {
    // group 1: sample1 = {3, 5, 5}, sample2 = {5, 7}
    // pooled sorted: 3(rank1), 5,5,5 (ranks 2-4, avg 3), 7 (rank 5)
    // R1 = 1 + 3 + 3 = 7 -> doubled 14; U1 = R1 - n1(n1+1)/2 = 7 - 6 = 1
    // doubled: u1_x2 = 14 - 3*4 = 2
    val df = Seq(
      (1L, 1, 3L), (1L, 1, 5L), (1L, 1, 5L), (1L, 2, 5L), (1L, 2, 7L))
      .toDF("g", "s", "v")
    val out = Stats.mannWhitneyU(df, "g", "s", "v").collect()
    assert(out.toSeq == Seq(Row(1L, 3L, 2L, 2L)))
  }

  test("ksStatistic finds the max CDF gap and its smallest location") {
    // s1 = {1,2,3}, s2 = {3,4}: at v=2 |F1*n2-F2*n1| = |2*2-0*3| = 4 (max)
    val df = Seq((0L, 1, 1L), (0L, 1, 2L), (0L, 1, 3L), (0L, 2, 3L),
      (0L, 2, 4L)).toDF("g", "s", "v")
    val out = Stats.ksStatistic(df, "g", "s", "v").collect()
    assert(out.toSeq == Seq(Row(0L, 3L, 2L, 4L, 2L)))
  }

  test("wasserstein1 integrates the CDF gap over value gaps") {
    // s1 = {0, 10}, s2 = {10, 20}: shift by 10 -> W1 = 10, n1*n2 = 4
    // supports 0,10,20: |F1n2-F2n1| at 0 = |1*2-0| = 2 (gap 10),
    // at 10 = |2*2-1*2| = 2 (gap 10), at 20 = 0 -> num = 40 = W1*4
    val df = Seq((1L, 1, 0L), (1L, 1, 10L), (1L, 2, 10L), (1L, 2, 20L))
      .toDF("g", "s", "v")
    val out = Stats.wasserstein1(df, "g", "s", "v").collect()
    assert(out.toSeq == Seq(Row(1L, 2L, 2L, 40L)))
  }

  test("clampedBalance equals the sequential max(0, prev + delta) scan") {
    val deltas = Seq(2L, -5L, 4L, -6L, 3L, -1L, 10L, -2L)
    val df = deltas.zipWithIndex
      .map { case (d, i) => (7L, i.toLong, d) }.toDF("k", "i", "delta")
    val got = Stats.clampedBalance(df, "k", Seq("i"), "delta")
      .orderBy($"i").select($"balance").as[Long].collect().toSeq
    val want = deltas.scanLeft(0L)((c, d) => math.max(0L, c + d)).tail
    assert(got == want)
  }

  test("timeWeighted holds each value to the next observation or bucket end") {
    // bucket [0, 100): obs at t=10 (v=3) held 40, t=50 (v=5) held 50
    val df = Seq((1L, 0L, 10L, 0L, 3L), (1L, 0L, 50L, 1L, 5L))
      .toDF("k", "b", "us", "tie", "v")
    val out = Stats.timeWeighted(df, "k", "b", "us", "tie", "v", lit(100L))
      .collect()
    assert(out.toSeq == Seq(Row(1L, 0L, 3L * 40 + 5L * 50, 90L)))
  }

  test("fifoMatch allocates demand to the oldest supply lots") {
    // supply lots [0,5) [5,8); demand draws [0,4) [4,8)
    // -> s1/d1: 4, s1/d2: 1, s2/d2: 3
    val sup = Seq((1L, 10L, 1L, 5L), (1L, 11L, 2L, 3L))
      .toDF("k", "id", "t", "q")
    val dem = Seq((1L, 20L, 1L, 4L), (1L, 21L, 2L, 4L))
      .toDF("k", "id", "t", "q")
    val out = Stats.fifoMatch(sup, dem, "k", "id", Seq("t", "id"), "q")
      .orderBy($"s_id", $"d_id").collect()
    assert(out.toSeq == Seq(
      Row(1L, 10L, 20L, 4L), Row(1L, 10L, 21L, 1L), Row(1L, 11L, 21L, 3L)))
  }

  test("fifoMatch conserves min(total supply, total demand) per key") {
    val sup = Seq((1L, 1L, 1L, 7L), (1L, 2L, 2L, 2L), (2L, 3L, 1L, 4L))
      .toDF("k", "id", "t", "q")
    val dem = Seq((1L, 9L, 1L, 3L), (1L, 8L, 2L, 3L), (2L, 7L, 1L, 9L))
      .toDF("k", "id", "t", "q")
    val got = Stats.fifoMatch(sup, dem, "k", "id", Seq("t", "id"), "q")
      .groupBy($"k").sum("qty").orderBy($"k").collect()
    assert(got.toSeq == Seq(Row(1L, 6L), Row(2L, 4L)))
  }

  test("fifoMatch drops zero-quantity lots instead of emitting qty=0 rows") {
    // zero-qty supply lot 11 sits strictly inside demand [0,4): no row
    val sup = Seq((1L, 10L, 1L, 2L), (1L, 11L, 2L, 0L), (1L, 12L, 3L, 2L))
      .toDF("k", "id", "t", "q")
    val dem = Seq((1L, 20L, 1L, 4L)).toDF("k", "id", "t", "q")
    val out = Stats.fifoMatch(sup, dem, "k", "id", Seq("t", "id"), "q")
      .orderBy($"s_id").collect()
    assert(out.toSeq == Seq(Row(1L, 10L, 20L, 2L), Row(1L, 12L, 20L, 2L)))
  }

  test("psiFromCounts: zero on identical mixes, positive on a shift") {
    // group "same": actual == reference -> every term 0
    // group "shift": mass moved from bin x to bin y
    val counts = Seq(
      ("same", "x", 50L, 50L), ("same", "y", 50L, 50L),
      ("shift", "x", 50L, 10L), ("shift", "y", 50L, 90L))
      .toDF("g", "bin", "c_ref", "c_act")
    val out = Stats.psiFromCounts(counts, "g", "bin", "c_ref", "c_act")
      .orderBy($"g").collect()
    val same = out(0)
    assert(same.getAs[Long]("psi_bits_num") == 0L &&
      same.getAs[Long]("psi_cb") == 0L)
    val shift = out(1)
    assert(shift.getAs[Long]("psi_bits_num") > 0L)
    assert(shift.getAs[Long]("na") == 102L && shift.getAs[Long]("nb") == 102L)
  }

  test("isotonicFit: monotone input is identity, violations pool to the mean") {
    // rates .1 .5 .3 .9 over equal bins: PAV pools bins 2,3 to .4
    val bins = Seq((1L, 10L, 1L), (2L, 10L, 5L), (3L, 10L, 3L), (4L, 10L, 9L))
      .map { case (b, n, p) => ("g", b, p, n) }.toDF("g", "bin", "n_pos", "n")
    val out = Stats.isotonicFit(bins, "g", "bin", "n_pos", "n")
      .orderBy($"bin").collect().map(_.getAs[Long]("y_fit_ppb"))
    assert(out.toSeq == Seq(100000000L, 400000000L, 400000000L, 900000000L))
    // already-monotone input comes back unchanged
    val mono = Seq((1L, 2L), (2L, 4L), (3L, 9L))
      .map { case (b, p) => ("g", b, p, 10L) }.toDF("g", "bin", "n_pos", "n")
    val out2 = Stats.isotonicFit(mono, "g", "bin", "n_pos", "n")
      .orderBy($"bin").collect().map(_.getAs[Long]("y_fit_ppb"))
    assert(out2.toSeq == Seq(200000000L, 400000000L, 900000000L))
  }

  test("runCounts counts maximal runs with a null-safe first boundary") {
    // T T F T F F -> runs: TT | F | T | FF = 4
    val df = Seq(true, true, false, true, false, false).zipWithIndex
      .map { case (h, i) => (1L, i.toLong, h) }.toDF("k", "i", "hi")
    val out = Stats.runCounts(df, "k", Seq("i"), "hi").collect()
    assert(out.toSeq == Seq(Row(1L, 3L, 3L, 4L)))
  }

  test("mcnemar counts only discordant pairs") {
    // g=1: concordant TT, b-pair, c-pair, concordant FF, concordant both-wrong
    // -> b=1, c=1, stat 0/2;  g=2: b=2, c=1 -> stat 1/3
    val df = Seq(
      (1L, true, true, true), (1L, true, true, false),
      (1L, true, false, true), (1L, false, false, false),
      (1L, true, false, false),
      (2L, true, true, false), (2L, true, true, false),
      (2L, true, false, true)).toDF("g", "truth", "pa", "pb")
    val out = Stats.mcnemar(df, "g", "truth", "pa", "pb")
      .orderBy($"g").collect()
    assert(out.toSeq == Seq(
      Row(1L, 5L, 1L, 1L, 0L, 2L), Row(2L, 3L, 2L, 1L, 1L, 3L)))
  }

  test("brierDecomposition emits exact per-bin REL and RES fractions") {
    // bins: p100=0 (n=2,s=0), 50 (n=2,s=2), 100 (n=1,s=1); N=5, S=3
    val df = Seq((0L, false), (0L, false), (50L, true), (50L, true),
      (100L, true)).toDF("p100", "pos")
    val out = Stats.brierDecomposition(df, "p100", "pos")
      .select($"p100", $"n", $"s",
        $"rel_num".cast("long"), $"rel_den".cast("long"),
        $"res_num".cast("long"), $"res_den".cast("long"))
      .orderBy($"p100").collect()
    assert(out.toSeq == Seq(
      // rel = (p100·n − 100·s)², res = (s·N − S·n)² over n·N²
      Row(0L, 2L, 0L, 0L, 20000L, 36L, 50L),
      Row(50L, 2L, 2L, 10000L, 20000L, 16L, 50L),
      Row(100L, 1L, 1L, 0L, 10000L, 4L, 25L)))
  }

  test("ece telescopes bin gaps into one exact fraction") {
    // bin 9: n=2, s=1, P=190 -> |100−190|=90; bin 4: n=1, s=1, P=45 -> 55
    // ece = 145/300 -> 4833 bp (floored)
    val df = Seq((1L, 95L, true), (1L, 95L, false), (1L, 45L, true))
      .toDF("m", "p100", "correct")
    val out = Stats.ece(df, "m", "p100", "correct").collect()
    assert(out.toSeq == Seq(Row(1L, 3L, 145L, 300L, 4833L)))
  }

  test("mutualInfoBits quantizes PMI per contingency cell") {
    // cells (a,p)=2, (a,q)=1, (b,q)=1; r_a=3, r_b=1, c_p=2, c_q=2, N=4
    // bits = bitlen(n)+bitlen(N)−bitlen(r)−bitlen(c)
    val df = Seq(("a", "p"), ("a", "p"), ("a", "q"), ("b", "q"))
      .toDF("x", "y")
    val out = Stats.mutualInfoBits(df, "x", "y")
      .select($"x", $"y", $"n_xy", $"r_x", $"c_y", $"n_total",
        $"pmi_bits", $"mi_num")
      .orderBy($"x", $"y").collect()
    assert(out.toSeq == Seq(
      Row("a", "p", 2L, 3L, 2L, 4L, 1L, 2L),   // 2+3−2−2 = 1
      Row("a", "q", 1L, 3L, 2L, 4L, 0L, 0L),   // 1+3−2−2 = 0
      Row("b", "q", 1L, 1L, 2L, 4L, 1L, 1L)))  // 1+3−1−2 = 1
  }

  test("klFromCounts quantizes the divergence via per-factor bit lengths") {
    // ref (3,1) vs act (1,3): a=(4,2), b=(2,4), na=nb=6
    // term_x = 2*(2+3-3-3) = -2; term_y = 4*(3+3-2-3) = 4 -> num 2, cb 33
    val df = Seq((1L, "x", 3L, 1L), (1L, "y", 1L, 3L))
      .toDF("g", "bin", "ref", "act")
    val out = Stats.klFromCounts(df, "g", "bin", "ref", "act").collect()
    assert(out.toSeq == Seq(Row(1L, 6L, 6L, 2L, 33L)))
  }

  test("pinballLoss charges q up, 100-q down, exactly") {
    // (y, yhat) = (100, 40), (10, 40)
    // q=50: 50*60 + 50*30 = 4500/200; q=90: 90*60 + 10*30 = 5700/200
    val df = Seq(("g", 100L, 40L), ("g", 10L, 40L)).toDF("g", "y", "p")
    val out = Stats.pinballLoss(df, "g", "y", "p", Seq(50, 90))
      .select($"g", $"q", $"n", $"loss_num".cast("long"), $"loss_den")
      .orderBy($"q").collect()
    assert(out.toSeq == Seq(
      Row("g", 50, 2L, 4500L, 200L), Row("g", 90, 2L, 5700L, 200L)))
  }

  test("dispersionIndex emits the exact variance/mean fraction") {
    // values 1,2,9: n=3, sum=12, sum2=86 -> num 3*(258-144)=342, den 72
    // (D = 19/4 = 4.75); singleton group -> null fraction
    val df = Seq(("a", 1L), ("a", 2L), ("a", 9L), ("b", 5L)).toDF("g", "v")
    val out = Stats.dispersionIndex(df, "g", "v")
      .select($"g", $"n", $"sum_x",
        $"d_num".cast("long"), $"d_den".cast("long"))
      .orderBy($"g").collect()
    assert(out.toSeq == Seq(
      Row("a", 3L, 12L, 342L, 72L), Row("b", 1L, 5L, null, null)))
  }

  test("cramersV2: perfect 2x2 association scores V² = 1, incl. empty cells") {
    // (a,p)x2, (b,q)x2: observed cells contribute 200 centi-chi2 and the
    // two EMPTY cells the other 200 -> chi2_cb 400, v2 = 400/(4*1) = 1e6 ppm
    val df = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "q"))
      .toDF("x", "y")
    val out = Stats.cramersV2(df, "x", "y").collect()
    assert(out.toSeq == Seq(Row(4L, 2L, 2L, 400L, 1000000L)))
  }

  test("looTargetEncode excludes the own row; singletons go null") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 5L))
      .toDF("cat", "t")
    val out = Encoding.looTargetEncode(df, "cat", "t")
      .select($"cat", $"t", $"n_cat", $"loo_num", $"loo_den")
      .orderBy($"cat", $"t").collect()
    assert(out.toSeq == Seq(
      Row("a", 10L, 3L, 50L, 2L), Row("a", 20L, 3L, 40L, 2L),
      Row("a", 30L, 3L, 30L, 2L), Row("b", 5L, 1L, null, null)))
  }

  test("woeEncode computes Laplace-smoothed WoE bits and IV fraction") {
    // a: 2T,1F -> g=3,b=2; c: 1T -> g=2,b=1; totals tg=5, tb=3
    val df = Seq(("a", true), ("a", true), ("a", false), ("c", true))
      .toDF("cat", "good")
    val out = Encoding.woeEncode(df, "cat", "good")
      .select($"cat", $"good", $"bad", $"good_total", $"bad_total",
        $"woe_bits", $"iv_num".cast("long"), $"iv_den".cast("long"))
      .orderBy($"cat").collect()
    assert(out.toSeq == Seq(
      // a: bits = 2+2−2−3 = −1; iv = (3·3−2·5)·(−1) = 1 over 15
      Row("a", 3L, 2L, 5L, 3L, -1L, 1L, 15L),
      // c: bits = 2+2−1−3 = 0
      Row("c", 2L, 1L, 5L, 3L, 0L, 0L, 15L)))
  }
  test("jsFromCounts: balanced bitlens — identity 0, symmetric, ~1 bit on disjoint") {
    // ref (3,1) vs act (1,3): a=(4,2), b=(2,4), na=nb=6, w=72, m=(36,36)
    // term_P,x = 4*(3+7-3-6)=4, term_P,y = 2*(2+7-3-6)=0 -> jsp=4; jsq=4
    // js_cb = (4*6+4*6)*50 div 36 = 66
    val df = Seq((1L, "x", 3L, 1L), (1L, "y", 1L, 3L))
      .toDF("g", "bin", "ref", "act")
    val out = Stats.jsFromCounts(df, "g", "bin", "ref", "act").collect()
    assert(out.toSeq == Seq(Row(1L, 6L, 6L, 4L, 4L, 66L)))
    // swapping ref and act leaves the divergence unchanged
    val sw = Stats.jsFromCounts(df, "g", "bin", "act", "ref").collect()
    assert(sw.head.getAs[Long]("js_cb") == 66L)
    // identical mixes quantize to exactly zero (no clamp involved)
    val id = Seq((1L, "x", 50L, 50L), (1L, "y", 50L, 50L))
      .toDF("g", "bin", "ref", "act")
    val zo = Stats.jsFromCounts(id, "g", "bin", "ref", "act").collect()
    assert(zo.head.getAs[Long]("jsp_num") == 0L &&
      zo.head.getAs[Long]("js_cb") == 0L)
    // near-disjoint mass approaches the 1-bit JS bound (100 cb)
    val dj = Seq((1L, "x", 1000L, 0L), (1L, "y", 0L, 1000L))
      .toDF("g", "bin", "ref", "act")
    val db = Stats.jsFromCounts(dj, "g", "bin", "ref", "act")
      .collect().head.getAs[Long]("js_cb")
    assert(db >= 90L && db <= 100L)
    // a group whose smoothed totals reach 2^31 fails loudly (the
    // bit-length products would silently overflow a long otherwise)
    val big = Seq((1L, "x", (1L << 31) - 1L, 1L))
      .toDF("g", "bin", "ref", "act")
    val ex = intercept[Throwable] {
      Stats.jsFromCounts(big, "g", "bin", "ref", "act").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.toString +: chain(e.getCause))
    assert(chain(ex).exists(_.contains("jsFromCounts")))
  }

  test("diffInDiff: 2x2 contrast exact, sign-safe, empty cell NULL") {
    // means: m00=10 m01=20 m10=30 m11=60 -> DiD = (60-30)-(20-10) = 20
    val df = Seq(("g", false, false, 10L), ("g", false, true, 20L),
      ("g", true, false, 30L), ("g", true, true, 60L))
      .toDF("g", "tr", "po", "v")
    val out = Stats.diffInDiff(df, "g", col("tr"), col("po"), "v")
      .collect().head
    assert(out.getAs[Long]("did_milli") == 20000L)
    // negative contrast truncates toward zero identically: DiD = -20
    val neg = Seq(("g", false, false, 60L), ("g", false, true, 80L),
      ("g", true, false, 30L), ("g", true, true, 30L))
      .toDF("g", "tr", "po", "v")
    val o2 = Stats.diffInDiff(neg, "g", col("tr"), col("po"), "v")
      .collect().head
    assert(o2.getAs[Long]("did_milli") == -20000L)
    // missing (treated, post) cell -> NULL contrast, not a fake zero
    val miss = Seq(("g", false, false, 10L), ("g", false, true, 20L),
      ("g", true, false, 30L)).toDF("g", "tr", "po", "v")
    val o3 = Stats.diffInDiff(miss, "g", col("tr"), col("po"), "v")
      .collect().head
    assert(o3.isNullAt(o3.fieldIndex("did_milli")))
  }

  test("cuped: perfect pre-period predictor nulls the adjusted gap") {
    // y = x exactly -> theta = 1000 milli; dx = dy -> adj_dy = 0
    // control x/y: 10, 20; treated x/y: 40, 50 (slope 1, intercept 0/10)
    val df = Seq(("e", false, 10L, 10L), ("e", false, 20L, 20L),
      ("e", true, 40L, 40L), ("e", true, 50L, 50L))
      .toDF("g", "t", "x", "y")
    val out = Stats.cuped(df, "g", col("t"), "x", "y").collect().head
    assert(out.getAs[Long]("n_t") == 2L && out.getAs[Long]("n_c") == 2L)
    assert(out.getAs[Long]("theta_milli") == 1000L)
    assert(out.getAs[Long]("dx_milli") == 30000L &&
      out.getAs[Long]("dy_milli") == 30000L)
    assert(out.getAs[Long]("adj_dy_milli") == 0L)
    // pooled theta with a constant +7 lift: n=4 sx=120 sy=134 sxx=4600
    // sxy=5230 -> theta = 4840/4000 = 1210 milli; dy = 37000;
    // adj = 37000 - trunc(1210*30000/1000) = 700
    val lift = Seq(("e", false, 10L, 10L), ("e", false, 20L, 20L),
      ("e", true, 40L, 47L), ("e", true, 50L, 57L))
      .toDF("g", "t", "x", "y")
    val o2 = Stats.cuped(lift, "g", col("t"), "x", "y").collect().head
    assert(o2.getAs[Long]("theta_milli") == 1210L)
    assert(o2.getAs[Long]("dy_milli") == 37000L)
    assert(o2.getAs[Long]("adj_dy_milli") == 700L)
    // zero covariate variance -> NULL theta, not a fake zero
    val flat = Seq(("e", false, 5L, 1L), ("e", true, 5L, 2L))
      .toDF("g", "t", "x", "y")
    val o3 = Stats.cuped(flat, "g", col("t"), "x", "y").collect().head
    assert(o3.isNullAt(o3.fieldIndex("theta_milli")))
  }

  test("scoreMatchAtt: nearest control by score, caliper gap, no-control NULL") {
    // g: treated (10,100),(20,50); controls (9,80),(25,10)
    // s=10 -> backward 9 (gap 1, y 80); s=20 -> forward 25 (gap 5, y 10)
    // att = (150-90)*1000/2 = 30000; max_gap = 5
    val df = Seq(("g", true, 10L, 100L), ("g", true, 20L, 50L),
      ("g", false, 9L, 80L), ("g", false, 25L, 10L),
      ("h", true, 1L, 7L)).toDF("grp", "t", "s", "y")
    val out = Stats.scoreMatchAtt(df, "grp", $"t", "s", "y")
      .orderBy($"grp").collect()
    val g = out(0)
    assert(g.getAs[Long]("n_treated") == 2L &&
      g.getAs[Long]("n_matched") == 2L)
    assert(g.getAs[Long]("sy_t") == 150L && g.getAs[Long]("sy_c") == 90L)
    assert(g.getAs[Long]("max_gap") == 5L)
    assert(g.getAs[Long]("att_milli") == 30000L)
    val h = out(1)
    assert(h.getAs[Long]("n_matched") == 0L)
    assert(h.isNullAt(h.fieldIndex("att_milli")))
  }

  test("burstDays: prior-only median baseline, honest cold start") {
    // key g days 1..9: 7 quiet days (10 +/- jitter), day 8 spike 16,
    // day 9 normal 10 — day 8 flags (16 >= 1.5*10), day 9 does not
    // (its baseline median over {9,10,10,10,11,10,16} is still 10);
    // days 1-7 have <7 priors -> NULL baseline, never flag
    val daily = Seq(("g", 1L, 10L), ("g", 2L, 9L), ("g", 3L, 11L),
      ("g", 4L, 10L), ("g", 5L, 10L), ("g", 6L, 10L), ("g", 7L, 10L),
      ("g", 8L, 16L), ("g", 9L, 10L)).toDF("k", "d", "x")
    val out = Series.burstDays(daily, "k", "d", "x", n = 7)
      .orderBy($"d").collect()
    assert(out.take(7).forall(r => r.isNullAt(3) && !r.getBoolean(4)))
    assert(out(7).getLong(3) == 10L && out(7).getBoolean(4))
    assert(out(8).getLong(3) == 10L && !out(8).getBoolean(4))
  }

  test("srmCheck: balanced passes, lopsided flags, units dedupe") {
    // g: units 1-6, arms 3/3 (unit 1 appears twice -> dedup) -> chi2 0
    // h: 10 units all arm 0 -> chi2 = 100*1000/10 = 10000 > 3841
    val rows = (Seq(("g", 1L), ("g", 1L)) ++ (2L to 6L).map(("g", _)) ++
      (10L to 28L by 2).map(("h", _))).toDF("grp", "u")
    val out = Stats.srmCheck(rows, "grp", $"u" % 2 === 0, "u")
      .orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(("g", 3L, 3L, 0L, 0L, false),
      ("h", 0L, 10L, 0L, 10000L, true)))
  }

  test("srmCheck: a unit observed in both arms surfaces as n_mixed") {
    // unit 1 is logged under arm 0 AND arm 1 (the dual-assignment bug the
    // gate exists to catch): it counts in arm 1 for n0/n1 (max semantics,
    // documented) and MUST show up in n_mixed so the readout is not
    // silently trusted
    val rows = Seq(("g", 1L, false), ("g", 1L, true), ("g", 2L, false),
      ("g", 3L, true)).toDF("grp", "u", "armed")
    val r = Stats.srmCheck(rows, "grp", $"armed", "u").collect().head
    assert(r.getAs[Long]("n0") == 1L && r.getAs[Long]("n1") == 2L)
    assert(r.getAs[Long]("n_mixed") == 1L)
  }

  test("conformalRadius: finite-sample rank, too-small n yields NULL") {
    // scores 1..10: alpha 10% -> k = ceil(11*0.90) = 10 -> radius 10;
    // alpha 5% -> k = 11 > n -> NULL radius
    val df = (1L to 10L).map(("g", _)).toDF("g", "s")
    val out = Stats.conformalRadius(df, "g", "s", Seq(10, 5))
      .collect().head
    assert(out.getAs[Long]("n") == 10L)
    assert(out.getAs[Long]("k_a10") == 10L &&
      out.getAs[Long]("radius_a10") == 10L)
    assert(out.getAs[Long]("k_a5") == 11L && out.isNullAt(
      out.fieldIndex("radius_a5")))
  }

  test("qte: per-quantile exact diffs, sides ranked independently") {
    // side 1 = {10,20,30,40}; side 2 = {10,10,10,10}
    // p50: q1 = rank 2 = 20, q2 = 10 -> +10; p90: q1 = rank 4 = 40 -> +30
    val df = Seq((1L, 1, 10L), (1L, 1, 20L), (1L, 1, 30L), (1L, 1, 40L),
      (1L, 2, 10L), (1L, 2, 10L), (1L, 2, 10L), (1L, 2, 10L))
      .toDF("g", "s", "v")
    val out = Stats.qte(df, "g", "s", "v", Seq(50, 90)).collect().head
    assert(out.getAs[Long]("n1") == 4L && out.getAs[Long]("n2") == 4L)
    assert(out.getAs[Long]("qte_p50") == 10L &&
      out.getAs[Long]("qte_p90") == 30L)
  }

  test("welchT: hand-computed t2, zero-variance NULL, small arms dropped") {
    // g1: arm1 {10,20}, arm2 {10,10,40}: m=(15,20), v=(50,300)
    // t2 = 25/(50/2 + 300/3) = 0.2 -> 2000 bp; diff_num = 30*3-60*2 = -30
    // g2: both arms constant -> C = 0 -> NULL t2_bp
    // g3: arm2 has 1 row -> dropped
    val df = Seq(
      (1L, 1, 10L), (1L, 1, 20L), (1L, 2, 10L), (1L, 2, 10L), (1L, 2, 40L),
      (2L, 1, 5L), (2L, 1, 5L), (2L, 2, 7L), (2L, 2, 7L),
      (3L, 1, 1L), (3L, 1, 2L), (3L, 2, 9L)).toDF("g", "arm", "v")
    val out = Stats.welchT(df, "g", col("arm"), col("v"))
      .collect().map(r => r.getAs[Long]("g") -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).getAs[Long]("n1") == 2L && out(1L).getAs[Long]("n2") == 3L)
    assert(out(1L).getAs[Long]("diff_num") == -30L)
    assert(out(1L).getAs[Long]("t2_bp") == 2000L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("t2_bp")))
  }

  test("brownForsythe: hand-computed F, constant series NULL, k=1 drop") {
    // series a: g1 {0,2,10} med 2 -> z {2,0,8}: S=10, Q=68, t=33
    //           g2 {5,5,5,5} med 5 -> z all 0
    // N=7 k=2: ssb = 33 - 100//7 = 19, ssw = 68-33 = 35
    // f_milli = 19*1000*5 // 35 = 2714
    // series b: single group -> dropped; series c: all z=0 -> NULL f
    val df = Seq(
      ("a", 1L, 0L), ("a", 1L, 2L), ("a", 1L, 10L),
      ("a", 2L, 5L), ("a", 2L, 5L), ("a", 2L, 5L), ("a", 2L, 5L),
      ("b", 1L, 3L), ("b", 1L, 9L),
      ("c", 1L, 3L), ("c", 1L, 3L), ("c", 2L, 7L)).toDF("s", "g", "v")
    val out = Stats.brownForsythe(df, "s", "g", col("v"))
      .collect().map(r => r.getAs[String]("s") -> r).toMap
    assert(out.keySet == Set("a", "c"))
    assert(out("a").getAs[Long]("n_groups") == 2L &&
      out("a").getAs[Long]("n_total") == 7L)
    assert(out("a").getAs[Long]("ssb_q") == 19L &&
      out("a").getAs[Long]("ssw_q") == 35L)
    assert(out("a").getAs[Long]("f_milli") == 2714L)
    assert(out("c").isNullAt(out("c").fieldIndex("f_milli")))
  }

  test("signTestPpm: exact binomial tail, tie discard, maxN guard") {
    // k1: {3,5,9,9} vs ref 5 -> m=3 kept, x=2 above
    //     p = (C(3,2)+C(3,3)) * 1e6 // 8 = 500000
    // k2: all ties -> m=0 -> p = 1e6
    val df = Seq(
      ("f", "k1", 3L, 5L), ("f", "k1", 5L, 5L),
      ("f", "k1", 9L, 5L), ("f", "k1", 9L, 5L),
      ("f", "k2", 4L, 4L), ("f", "k2", 4L, 4L)).toDF("fam", "k", "v", "ref")
    val out = Stats.signTestPpm(df, "fam", "k", col("v"), col("ref"))
      .collect().map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("m"), r.getAs[Long]("x"),
          r.getAs[Long]("p_ppm"))).toMap
    assert(out == Map("k1" -> ((3L, 2L, 500000L)), "k2" -> ((0L, 0L, 1000000L))))
    val boom = intercept[Exception] {
      Stats.signTestPpm(df, "fam", "k", col("v"), col("ref"), maxN = 2)
        .collect()
    }
    assert(boom.getMessage != null)
  }

  test("bhFdr: step-up rejects a rank whose own p missed the line") {
    // alpha=10%, m=3: p {10k, 95k, 96k}: rank2 fails its own line
    // (285k > 200k) but rank3 passes (288k <= 300k) -> cut=3, ALL reject
    val df = Seq(("f", "a", 10000L), ("f", "b", 95000L), ("f", "c", 96000L),
      ("g", "a", 900000L)).toDF("fam", "k", "p")
    val out = Stats.bhFdr(df, "fam", "k", col("p"))
      .collect().map(r => (r.getAs[String]("family"),
        r.getAs[String]("key")) -> r.getAs[Boolean]("rejected")).toMap
    assert(out(("f", "a")) && out(("f", "b")) && out(("f", "c")))
    assert(!out(("g", "a"))) // 900k*1 > 1*100k -> no cut in family g
  }

  test("jackknifeRatio: hand-computed LOO variance, degenerate NULL") {
    // series a, den=1 per row: g1 {10,20}, g2 {30}, g3 {0,0}
    // theta = 60000//5 = 12000; LOO thetas 10000, 7500, 20000
    // var = 2*(556250000 - 1406250000//3)//3 = 58333333
    // series b: one group holds the whole denominator -> degenerate
    val df = Seq(
      ("a", 1L, 10L), ("a", 1L, 20L), ("a", 2L, 30L),
      ("a", 3L, 0L), ("a", 3L, 0L),
      ("b", 1L, 7L), ("b", 1L, 9L)).toDF("s", "g", "y")
    val out = Stats.jackknifeRatio(df, "s", "g", col("y"), lit(1L))
      .collect().map(r => r.getAs[String]("s") -> r).toMap
    assert(out("a").getAs[Long]("n_groups") == 3L &&
      out("a").getAs[Long]("n_degenerate") == 0L)
    assert(out("a").getAs[Long]("theta_milli") == 12000L)
    assert(out("a").getAs[Long]("var_jk_q") == 58333333L)
    assert(out("b").getAs[Long]("n_degenerate") == 1L)
    assert(out("b").getAs[Long]("theta_milli") == 8000L)
    assert(out("b").isNullAt(out("b").fieldIndex("var_jk_q")))
  }

  test("mannKendall: exact S, tie-corrected var18, signed trend") {
    // up: 1,2,2,3 -> S=5, var18 = 156-18 = 138, trend = +450000//138
    // flat: all ties -> var18 = 0 -> NULL; down: 5,3,1 -> S=-3
    val df = Seq(
      ("up", 1L, 1L), ("up", 2L, 2L), ("up", 3L, 2L), ("up", 4L, 3L),
      ("flat", 1L, 7L), ("flat", 2L, 7L), ("flat", 3L, 7L),
      ("down", 1L, 5L), ("down", 2L, 3L), ("down", 3L, 1L))
      .toDF("s", "t", "v")
    val out = Stats.mannKendall(df, "s", col("t"), col("v"))
      .collect().map(r => r.getAs[String]("s") -> r).toMap
    assert(out("up").getAs[Long]("s_stat") == 5L &&
      out("up").getAs[Long]("var18") == 138L &&
      out("up").getAs[Long]("trend_milli") == 450000L / 138)
    assert(out("flat").getAs[Long]("s_stat") == 0L &&
      out("flat").getAs[Long]("var18") == 0L &&
      out("flat").isNullAt(out("flat").fieldIndex("trend_milli")))
    assert(out("down").getAs[Long]("s_stat") == -3L &&
      out("down").getAs[Long]("trend_milli") == -(162000L / 66))
  }

  test("changePoint: argmax lands on the level shift, exact segment means") {
    // series 1,1,1,5,5: scores (x1e4/den) k=1: 32000, k=2: 85333,
    // k=3: 192000, k=4: 72000 -> split after k=3
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 5L), (5L, 5L))
      .map { case (d, y) => ("a", d, y) }.toDF("g", "d", "y")
    val out = Stats.changePoint(df, "g", col("d"), col("y")).collect().head
    assert(out.getAs[Long]("n_points") == 5L &&
      out.getAs[Long]("split_k") == 3L && out.getAs[Long]("split_idx") == 3L)
    assert(out.getAs[Long]("score_q") == 192000L)
    assert(out.getAs[Long]("left_mean_x100") == 100L &&
      out.getAs[Long]("right_mean_x100") == 500L)
  }

  test("copelandPrefs: majority edges, surfaced ties, raw duel counts") {
    // a beats b 2-1 (majority a), a-c split 1-1 (tie), b beats c 1-0
    val prefs = Seq(("a", "b"), ("a", "b"), ("b", "a"),
      ("a", "c"), ("c", "a"), ("b", "c")).toDF("w", "l")
    val out = Stats.copelandPrefs(prefs, "w", "l").collect()
      .map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("raw_wins"), r.getAs[Long]("raw_losses"),
         r.getAs[Long]("maj_wins"), r.getAs[Long]("maj_losses"),
         r.getAs[Long]("maj_ties"), r.getAs[Long]("copeland"))).toMap
    assert(out == Map(
      "a" -> ((3L, 2L, 1L, 0L, 1L, 1L)),
      "b" -> ((2L, 2L, 1L, 1L, 0L, 0L)),
      "c" -> ((1L, 2L, 0L, 1L, 1L, -1L))))
  }

  test("bradleyTerry: quantized MM parity with a BigInt model; zero-win collapse") {
    // a beats b 3-0, b beats c 1-0: a strongest, c never wins -> strength 0
    val prefs = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("b", "c"))
      .toDF("w", "l")
    val out = Stats.bradleyTerry(prefs, "w", "l", iters = 2).collect()
      .map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("wins"), r.getAs[Long]("games"),
         r.getAs[Long]("strength_ppm"))).toMap

    // from-scratch model of the documented quantized MM recurrence
    val items = Seq("a", "b", "c")
    val wins = Map("a" -> BigInt(3), "b" -> BigInt(1), "c" -> BigInt(0))
    val nAb = Map(("a", "b") -> BigInt(3), ("b", "c") -> BigInt(1))
    var s = items.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to 2) {
      val tq = nAb.map { case ((x, y), n) =>
        (x, y) -> n * BigInt(1000000000) / (s(x) + s(y)) }
      val den = items.map { i => i -> tq.collect {
        case ((x, y), t) if x == i || y == i => t }.sum }.toMap
      val raw = items.map { i =>
        i -> (if (den(i) == 0) BigInt(0)
              else wins(i) * BigInt(1000000000) / den(i)) }.toMap
      val tot = raw.values.sum
      s = items.map { i => i -> raw(i) * items.length * 1000000 / tot }.toMap
    }
    assert(out == Map(
      "a" -> ((3L, 3L, s("a").toLong)),
      "b" -> ((1L, 4L, s("b").toLong)),
      "c" -> ((0L, 1L, 0L))))
    assert(s("c") == 0 && s("a") > s("b") && s("b") > 0)
  }

  test("changePoint: constant series ties break to the earliest split") {
    val df = (1L to 4L).map(d => ("a", d, 3L)).toDF("g", "d", "y")
    val out = Stats.changePoint(df, "g", col("d"), col("y")).collect().head
    assert(out.getAs[Long]("split_k") == 1L &&
      out.getAs[Long]("score_q") == 0L)
  }

  test("kruskalWallis matches the hand-ranked no-tie example; " +
    "all-tied series drops") {
    // series a: arms {1,2} vs {3,4}: ranks 1..4, doubled 2,4,6,8
    // HR_A=6, HR_B=14 -> q=18000+98000; H = 0.6*(4.5+24.5)-15 = 2.4
    // series b: all values equal -> cube == tsum -> undefined, dropped
    val df = Seq(("a", 0, 1L), ("a", 0, 2L), ("a", 1, 3L), ("a", 1, 4L),
      ("b", 0, 5L), ("b", 1, 5L)).toDF("s", "g", "v")
    val out = Stats.kruskalWallis(df, "s", "g", col("v")).collect()
    assert(out.toSeq == Seq(Row("a", 2L, 4L, 0L, 2400L)))
  }

  test("cochranArmitage matches the hand-computed dose ladder") {
    // x=0: 2/10, x=1: 5/10, x=2: 8/10 -> Z^2 = 7.2, upward trend
    val rows = for {
      (x, pos) <- Seq((0L, 2), (1L, 5), (2L, 8))
      i <- 0 until 10
    } yield ("s", x, i < pos)
    val df = rows.toDF("s", "x", "y")
    val out = Stats.cochranArmitage(df, "s", col("x"), col("y")).collect()
    assert(out.toSeq == Seq(Row("s", 30L, 15L, 1, 7200L)))
  }

  test("krippendorffAlpha: two-rater example with a single-rating unit") {
    // u1 {a,a}, u2 {a,b}, u3 {b,b}, u4 {a} (drops: no pair info)
    // S = 2e6 (only u2 disagrees), n = 6, E = 3*3 + 3*3 = 18
    // alpha_ppm = 1e6 - 2e6*5 // 18 = 444445
    val df = Seq(("g", 1L, "a"), ("g", 1L, "a"), ("g", 2L, "a"),
      ("g", 2L, "b"), ("g", 3L, "b"), ("g", 3L, "b"), ("g", 4L, "a"))
      .toDF("s", "u", "c")
    val out = Stats.krippendorffAlpha(df, "s", "u", col("c")).collect()
    assert(out.toSeq == Seq(Row("g", 3L, 6L, 444445L)))
  }

  test("fairnessGaps: balanced groups read zero gaps; empty-negative " +
    "group reads NULL fpr") {
    val df = Seq(
      ("s", "A", true, true), ("s", "A", true, false),
      ("s", "A", false, true), ("s", "A", false, false),
      ("s", "B", true, true), ("s", "B", false, true))
      .toDF("src", "g", "p", "y")
    val out = Stats.fairnessGaps(df, "src", "g", col("p"), col("y"))
      .collect().map(r => r.getString(1) -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("sel_bp") == 5000L &&
      a.getAs[Long]("tpr_bp") == 5000L && a.getAs[Long]("fpr_bp") == 5000L &&
      a.getAs[Long]("sel_gap_bp") == 0L && a.getAs[Long]("tpr_gap_bp") == 0L &&
      a.getAs[Long]("fpr_gap_bp") == 0L)
    val b = out("B")
    assert(b.getAs[Long]("sel_bp") == 5000L && b.isNullAt(b.fieldIndex("fpr_bp")))
  }

  test("smdBalance matches the hand example: arms {1,3} vs {5,9}") {
    // m1=2, v1=2; m0=7, v0=8; d=-5, vp=5, smd^2=5 -> 5000 milli
    val df = Seq(("s", true, 1L), ("s", true, 3L),
      ("s", false, 5L), ("s", false, 9L)).toDF("s", "t", "v")
    val out = Stats.smdBalance(df, "s", col("t"), col("v")).collect()
    assert(out.toSeq == Seq(Row("s", 2L, 2L, -5000L, 5000L)))
  }

  test("samplePowerPlan: n = C*var/delta^2 on the {10,20} series") {
    // mean 15, var 50, delta 0.75 -> n = 15.697*50/0.5625 = 1395 (floored)
    val df = Seq(("s", 10L), ("s", 20L)).toDF("s", "v")
    val out = Stats.samplePowerPlan(df, "s", col("v")).collect()
    assert(out.toSeq ==
      Seq(Row("s", 2L, 15000L, 50000L, 750L, 1395L)))
  }

  test("matthewsCorr: perfect classifier reads 1000, empty margin NULL") {
    val df = Seq(("a", true, true), ("a", false, false),
      ("b", true, true), ("b", true, true)).toDF("s", "p", "y")
    val out = Stats.matthewsCorr(df, "s", col("p"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Int]("mcc_sign") == 1 &&
      a.getAs[Long]("mcc2_milli") == 1000L)
    // b: all predicted-positive, all positive -> den = 0 -> NULL
    assert(out("b").isNullAt(out("b").fieldIndex("mcc2_milli")))
  }

  test("foldedPeriodScan scores a pure period-2 signal 1000 at p=2, " +
    "500 at p=3") {
    // x = 10,0,10,0 over d=0..3: p=2 explains all variance, p=3 half
    val daily = Seq(("e", 0L, 10L), ("e", 1L, 0L), ("e", 2L, 10L),
      ("e", 3L, 0L)).toDF("k", "d", "x")
    val out = Series.foldedPeriodScan(daily, "k", "d", "x", Seq(2, 3))
      .collect().map(r => r.getInt(1) -> r.getLong(3)).toMap
    assert(out == Map(2 -> 1000L, 3 -> 500L))
  }

  test("simpsonReversal fires on the classic two-stratum paradox") {
    // stratum 1: T 81/87 vs C 234/270; stratum 2: T 192/263 vs C 55/80
    // treatment wins both strata, loses pooled (273/350 vs 289/350)
    val cells = Seq(
      (1L, true, 81, 6), (1L, false, 234, 36),
      (2L, true, 192, 71), (2L, false, 55, 25))
    val rows = cells.flatMap { case (g, t, succ, fail) =>
      Seq.fill(succ)(("s", g, t, true)) ++ Seq.fill(fail)(("s", g, t, false))
    }
    val df = rows.toDF("s", "g", "t", "y")
    val out = Stats.simpsonReversal(df, "s", "g", col("t"), col("y"))
      .collect()
    assert(out.toSeq ==
      Seq(Row("s", 2L, 2L, 0L, 0L, -1, true)))
  }

}
