package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench box-speed-control contract (round-10 verdict item 1):
  * graft.Bench times two pinned control queries first and emits
  * `control_median` (= median of time/floor); dev/bench_diff.py divides
  * every per-query ratio by it before flagging. This spec pins the three
  * legs that could silently drift apart:
  *   1. the hardcoded floors in Bench.controlFloors equal the committed
  *      BENCH_BUDGET.json floors (a budget re-base must touch both);
  *   2. the controls are real queries of the current surface;
  *   3. the python normalization logic itself passes its selftest
  *      (uniform slowdown never flags, a genuine regression on a
  *      contended box still does, legacy artifacts fall back).
  */
class BenchControlSpec extends AnyFunSuite {

  private def repoFile(name: String): java.io.File = {
    // sbt forks tests with cwd = repo root; walk up defensively anyway
    Iterator.iterate(new java.io.File(".").getAbsoluteFile)(_.getParentFile)
      .takeWhile(_ != null).take(4)
      .map(d => new java.io.File(d, name))
      .find(_.exists())
      .getOrElse(fail(s"$name not found from ${new java.io.File(".").getAbsolutePath}"))
  }

  test("controlFloors match the committed BENCH_BUDGET.json control_floors") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(repoFile("BENCH_BUDGET.json"))
    // control_floors is the dedicated control pass's measurement context
    // (fresh-JVM warmup + min-of-2), NOT the in-run queries[] floors —
    // see Bench.controlFloors scaladoc
    val budgets = root.get("control_floors")
    assert(budgets != null, "BENCH_BUDGET.json lacks control_floors")
    assert(budgets.size() == Bench.controlFloors.size)
    Bench.controlFloors.foreach { case (q, floor) =>
      val node = budgets.get(q)
      assert(node != null, s"control $q missing from control_floors")
      assert(math.abs(node.asDouble() - floor) < 1e-9,
        s"control $q floor drifted: Bench.controlFloors=$floor " +
          s"BENCH_BUDGET.json=${node.asDouble()} — re-base BOTH together")
    }
    // and the controls keep ordinary in-run floors too (they are part of
    // the benched surface like any other query)
    Bench.controls.foreach { q =>
      assert(root.get("queries").get(q) != null, s"$q lacks an in-run floor")
    }
  }

  test("controls are pinned to real queries of the current surface") {
    assert(Bench.controls.nonEmpty)
    assert(Bench.controls.toSet == Bench.controlFloors.keySet)
    Bench.controls.foreach { q =>
      assert(SparkEntry.queries.contains(q), s"control $q is not a query")
    }
    // controls must also be part of the benched surface so their floors
    // keep min-folding down at every round close like any other query
    assert(Bench.controls.forall(SparkEntry.oracleSql.contains),
      "controls must stay oracle-gated (stability is the point)")
  }

  test("in-run auto-retry triggers exactly on bench_diff's flag condition") {
    // mirrors dev/bench_diff.py: normalized ratio > 1.5 AND delta > 1 s
    assert(Bench.shouldRetry(elapsed = 4.0, floor = 2.0, boxFactor = 1.0))
    // contended box: same raw 2x ratio, controls at 1.6 → no retry
    assert(!Bench.shouldRetry(elapsed = 4.0, floor = 2.0, boxFactor = 1.6))
    // sub-second jitter never retries even at 3x ratio (abs floor)
    assert(!Bench.shouldRetry(elapsed = 0.6, floor = 0.2, boxFactor = 1.0))
    // a failed shot is a failure, not a tail spike — no retry
    assert(!Bench.shouldRetry(elapsed = -1.0, floor = 2.0, boxFactor = 1.0))
    // no floor / degenerate inputs never retry
    assert(!Bench.shouldRetry(elapsed = 4.0, floor = 0.0, boxFactor = 1.0))
  }

  test("a retry can only lower a reading, and never masks a failure") {
    assert(Bench.foldRetry(19.2, 7.5) == 7.5)
    assert(Bench.foldRetry(7.5, 19.2) == 7.5)   // a slower retry changes nothing
    assert(Bench.foldRetry(19.2, -1.0) == 19.2) // failed retry keeps the reading
    assert(Bench.foldRetry(-1.0, 5.0) == -1.0)  // failed first shot stays failed
  }

  test("retry floors load from the committed BENCH_BUDGET.json") {
    val floors = Bench.loadBudgetFloors(repoFile("BENCH_BUDGET.json").getPath)
    assert(floors.size == SparkEntry.queries.size ||
      floors.nonEmpty, "budget floors must parse")
    Bench.controls.foreach(q => assert(floors.contains(q)))
    assert(floors.values.forall(_ > 0))
    // missing file degrades to no retries, never throws
    assert(Bench.loadBudgetFloors("/nonexistent/BENCH_BUDGET.json").isEmpty)
  }

  test("bench_diff.py --selftest passes (normalization logic)") {
    import scala.sys.process._
    val script = repoFile("dev/bench_diff.py")
    val out = new StringBuilder
    val code = Process(Seq("python3", script.getAbsolutePath, "--selftest"))
      .!(ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(code == 0, s"selftest failed:\n$out")
    assert(out.toString.contains("selftest OK"), out.toString)
  }
}
