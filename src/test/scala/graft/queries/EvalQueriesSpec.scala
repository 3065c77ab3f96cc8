package graft.queries

import graft.SparkSpec

/** Independent-computation checks for the eval-analytics family. The
  * DuckDB oracle twins share every formula with the queries (a wrong
  * constant or an off-by-one ceil would pass the gate on BOTH sides),
  * so these specs re-derive the contracts from first principles:
  * BigInt binomials for pass@k, math.ceil for the conformal rank,
  * math.log for the SPRT/power literals. */
class EvalQueriesSpec extends SparkSpec {

  test("pass@k expression matches an independent BigInt binomial") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def choose(n: Int, k: Int): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (BigInt(n - k + 1) to BigInt(n)).product /
        (BigInt(1) to BigInt(k)).product
    def expected(n: Int, c: Int, k: Int): Long =
      (BigInt(1000000) -
        choose(n - c, k) * 1000000 / choose(n, k)).toLong
    val cases = Seq((3, 1), (5, 5), (10, 2), (50, 0), (50, 50), (7, 3),
      (10, 9), (2, 1))
    for (k <- Seq(1, 5, 10)) {
      // LONG columns, as in the query (n and c are count/sum aggregates
      // there) — int columns would overflow the k=10 factor chain
      val in = cases.filter(_._1 >= k)
        .map { case (n, c) => (n.toLong, c.toLong) }.toDF("n", "c")
      val got = in
        .withColumn("p", expr(EvalQueries.passPpmSqlExpr(k)))
        .select($"n", $"c", $"p")
        .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
          r.getLong(2)).toMap
      for ((n, c) <- cases if n >= k)
        assert(got((n, c)) == expected(n, c, k),
          s"pass@$k(n=$n,c=$c): got ${got((n, c))}, " +
            s"want ${expected(n, c, k)}")
    }
  }

  test("pass@k edge: n-c < k means certainty (a zero factor, not clamping)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 2 wrong answers among 10, ask for 5: can't fill a 5-sample with
    // wrong ones, pass@5 = 1.0 exactly
    val got = Seq((10, 8)).toDF("n", "c")
      .withColumn("p", expr(EvalQueries.passPpmSqlExpr(5)))
      .select($"p").as[Long].head()
    assert(got == 1000000L)
  }

  test("conformal rank literal is the ceil, not the floor") {
    // q468 (and its oracle) both spell ceil(0.9*(n+1)) as
    // (9*(n+1)+9) div 10 — pin it to math.ceil so a shared off-by-one
    // can't survive
    for (n <- 1 to 200) {
      val spelled = (9 * (n + 1) + 9) / 10
      val truth = math.ceil(0.9 * (n + 1)).toInt
      assert(spelled == truth, s"n=$n: $spelled != $truth")
    }
  }

  test("SPRT milli-nat literals are the rounded true logs") {
    def milli(x: Double): Long = math.round(1000.0 * math.log(x))
    assert(milli(0.03 / 0.02) == 405L)       // per-success increment
    assert(milli(0.97 / 0.98) == -10L)       // per-failure increment
    assert(milli(0.90 / 0.05) == 2890L)      // accept-H1 boundary
    assert(milli(0.10 / 0.95) == -2251L)     // accept-H0 boundary
  }

  test("power-table z constant is the milli-rounded z-sum squared") {
    // z_{0.975} = 1.959964, z_{0.8} = 0.841621; the convention is
    // round-to-milli FIRST, then square exactly (2802^2) so both
    // engines evaluate one integer — the constant must be that, and
    // must sit within 0.1% of the unrounded truth
    val zsumMilli = math.round(1000.0 * (1.959964 + 0.841621))
    assert(zsumMilli == 2802L)
    assert(7851204L == zsumMilli * zsumMilli)
    val exact = math.pow(1.959964 + 0.841621, 2) * 1e6
    assert(math.abs(7851204L - exact) / exact < 0.001)
  }

  test("1-bit minhash estimator identity at the anchors") {
    // est1_bp = max((2m-32)*10000/32, 0): all-match -> 10000 (J=1),
    // half-match -> 0 (the random floor), below half clamps to 0
    def est1(m: Long): Long = math.max((m * 2 - 32) * 10000 / 32, 0L)
    assert(est1(32) == 10000L)
    assert(est1(16) == 0L)
    assert(est1(8) == 0L)
    assert(est1(24) == 5000L) // 3/4 match -> J-hat = 1/2
  }

  test("OBF squared boundaries are micro-rounded 2.040^2 * 5/k") {
    // O'Brien-Fleming: z_k = z_K * sqrt(K/k), so z_k^2 = z_K^2 * K/k
    // exactly — the squared table needs no square roots at all; each
    // literal must be round(2.040^2 * 1e6 * 5 / k)
    val lits = Map(1 -> 20808000L, 2 -> 10404000L, 3 -> 6936000L,
      4 -> 5202000L, 5 -> 4161600L)
    for ((k, b2) <- lits) {
      assert(b2 == 4161600L * 5 / k,
        s"look $k: literal $b2 vs exact ${4161600L * 5 / k}")
      val want = math.round(2.040 * 2.040 * 1e6 * 5.0 / k)
      assert(b2 == want, s"look $k: literal $b2 vs derived $want")
    }
  }

  test("LPT fold expression matches an independent greedy") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the q482 fold (sorted-loads state, assign to min, re-sort) on a
    // hand fixture, vs a plain-Scala LPT: sizes 10..1 on 8 workers ->
    // loads {10,9,8,7,6,5,5,5}, makespan 10, min 5
    val sizes = (1L to 10L)
    val df = sizes.map(s => (s * 37 % 1000, s)).toDF("d", "sz") // d = any tiebreak
    val out = df
      .agg(sort_array(collect_list(struct((-$"sz").as("negsz"),
        $"d".as("d"), $"sz".as("sz")))).as("items"))
      .withColumn("loads", expr(
        """aggregate(items, array_repeat(CAST(0 AS BIGINT), 8),
          |  (acc, x) -> array_sort(concat(slice(acc, 2, 7),
          |    array(acc[0] + x.sz))))""".stripMargin))
      .select(expr("element_at(loads, 8)"), expr("element_at(loads, 1)"))
      .as[(Long, Long)].head()
    // independent greedy
    var loads = Vector.fill(8)(0L)
    for (s <- sizes.sorted.reverse) {
      val i = loads.zipWithIndex.minBy(_._1)._2
      loads = loads.updated(i, loads(i) + s)
    }
    assert(out == ((loads.max, loads.min)), s"$out vs $loads")
    assert(out == ((10L, 5L)))
  }

  test("ESS identity: equal weights recover the nominal n") {
    // Kish ESS with constant w: (nw)^2 / (n w^2) = n, ess_bp = 10000
    val n = 137L; val w = 42L
    val sw = BigInt(n * w); val sw2 = BigInt(n) * w * w
    assert((sw * sw / sw2).toLong == n)
    assert((sw * sw * 10000 / (sw2 * n)).toLong == 10000L)
  }
}
