package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec,
  LocalLimitExec, RangeExec, TakeOrderedAndProjectExec}

/** The systemic guard the per-query PlanShapeSpec cases can't give:
  * EVERY query plan in [[SparkEntry.queries]] is walked, and every
  * unpartitioned `WindowExec` (Spark's "Moving all data to a single
  * partition" warning — the one construct that silently turns into a
  * one-task sort of an unbounded table at 100 TB) must sit above a node
  * that mechanically bounds its input:
  *
  *   - GlobalLimit / LocalLimit / CollectLimit / TakeOrderedAndProject
  *     (the repo's orderBy+limit top-k convention),
  *   - WindowGroupLimit (Spark's own rank-filter pushdown: per-partition
  *     top-k heaps run BEFORE the single-partition window),
  *   - a small literal Range (enum domains built from spark.range(n)).
  *
  * Everything else needs an entry in [[boundedByAudit]] naming the
  * reason the input is bounded (calendar-domain series, enum-keyed
  * aggregate tables, ...). A new query with a global window over raw
  * rows fails this suite instead of shipping a scale-killer — the
  * docstring boundedness arguments are now a regression gate
  * (round-7 verdict item 2; q182/q268 were exactly this bug). */
class WindowLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Audited queries whose unpartitioned windows consume an input that
    * is bounded for a reason the lint can't see mechanically. Every
    * entry must still HAVE an unpartitioned window (second test) so the
    * allowlist can't rot into a skip-list. */
  private val boundedByAudit: Map[String, String] = Map(
    "q12_distribution" -> ("global sum window over the per-lang aggregate " +
      "(enum language domain, dozens of rows)"),
    "q86_new_users" -> ("cumsum over the per-DAY adoption aggregate - " +
      "cardinality = calendar span days, not events (docstring states it)"),
    "q105_skyline" -> ("cum-min over the per-x min aggregate; x = retail " +
      "price cents on a bounded literal domain (~1.2e5 distinct values)"),
    "q117_vocab_encode" -> ("Vocab.vocabulary two-phase range-rank: the " +
      "only global window is the per-bucket offsets cumsum, " +
      "O(rankPartitions)=32 rows"),
    "q151_vocab_coverage" -> ("same Vocab.vocabulary offsets cumsum, " +
      "O(rankPartitions) rows"),
    "q175_largest_remainder" -> ("largestRemainderAlloc rank window over " +
      "the per-GROUP weight table (callers pass aggregated enum-domain " +
      "weights)"),
    "q178_quota_sample" -> ("largestRemainderAlloc over the per-group " +
      "quota table (enum group domain)"),
    "q180_life_table" -> ("life-table cumsum over the per-day-offset " +
      "aggregate (calendar-bounded)"),
    "q206_shuffle_shard" -> ("deterministicShuffle offsets cumsum, " +
      "O(rankPartitions)=32 (PlanShapeSpec separately pins the " +
      "range-partitioned rank path)"),
    "q238_rolling_corr" -> ("rolling windows over the DAILY series " +
      "(calendar-bounded row count)"),
    "q275_cum_hazard" -> ("two life-table cumsums over the per-day-offset " +
      "aggregate (calendar-bounded)"),
    "q284_var_alloc" -> ("largestRemainderAlloc over the per-group " +
      "variance table (enum group domain)"),
    "q396_priority_sample" -> ("rank window over the k+1-row " +
      "orderBy+limit result; the GlobalLimit is invisible here only " +
      "because localCheckpoint truncates the plan at the materialized " +
      "k+1-row table"),
    "q414_budget_select" -> ("budgetedSelect offsets cumsum over the " +
      "per-bucket size table, O(rankPartitions)=32"),
    "q421_shuffle_mix" -> ("deterministicShuffle offsets cumsum, " +
      "O(rankPartitions)=32"),
    "q470_sprt_walk" -> ("SPRT cumulative walk over the per-DAY " +
      "aggregate (calendar-bounded row count)"),
    "q473_curation_roi" -> ("cumulative-from-best over the 100-row " +
      "quality-bin aggregate (score%997 div 10 - bounded literal " +
      "domain)"),
    "q481_crawl_saturation" -> ("cumulative over the 10-row crawl-order " +
      "bucket aggregate (literal decile domain)"))

  private def bounding(p: SparkPlan): Boolean = p.exists {
    case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec |
        _: TakeOrderedAndProjectExec | _: WindowGroupLimitExec => true
    case r: RangeExec if r.numElements <= BigInt(100000) => true
    case _ => false
  }

  // plain collect (not collectWithSubqueries: its subquery walk hands
  // LOGICAL nodes to the typed partial function and class-casts). The
  // repo builds scalar sides as crossJoin(broadcast(...)), not subquery
  // expressions, so the main physical tree is the whole surface.
  private def offenders(plan: SparkPlan): Seq[WindowExec] =
    plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty && !bounding(w.child) => w
    }

  private def globalWindows(plan: SparkPlan): Seq[WindowExec] =
    plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }

  test("every unpartitioned WindowExec in every query plan has a bounded input") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        if (boundedByAudit.contains(name)) Nil
        else {
          val plan = fn(spark, dir).queryExecution.sparkPlan
          val off = offenders(plan)
          if (off.nonEmpty)
            Seq(s"$name: ${off.size} unpartitioned WindowExec over an " +
              s"input with no limit/top-k/range bound")
          else Nil
        }
    }
    assert(bad.isEmpty,
      s"unbounded global windows (fix with orderBy+limit before the rank " +
        s"window, or add an audited boundedByAudit entry):\n${bad.mkString("\n")}")
  }

  test("no query plan contains an unbounded cartesian product") {
    // the one join shape with NO scale story: PlanShapeSpec pins this
    // per-query for the risky families; this walks the whole surface.
    // (crossJoin(broadcast(tiny)) plans BroadcastNestedLoopJoin, which
    // is allowed — bounded by the broadcast side's size.)
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (_, fn) =>
        fn(spark, dir).queryExecution.sparkPlan.exists {
          case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
            true
          case _ => false
        }
    }.map(_._1)
    assert(bad.isEmpty, s"cartesian products in: ${bad.mkString(", ")}")
  }

  test("the allowlist names only queries that really have a global window") {
    val stale = boundedByAudit.keys.toSeq.sorted.filter { name =>
      globalWindows(
        SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan).isEmpty
    }
    assert(stale.isEmpty,
      s"boundedByAudit entries with no unpartitioned window left — remove:" +
        s" ${stale.mkString(", ")}")
  }

  test("negative control: a deliberately-global rank plan fails the lint") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = Tables.events(spark, dir)
      .withColumn("rk", row_number().over(Window.orderBy(col("ts"))))
    assert(offenders(df.queryExecution.sparkPlan).nonEmpty,
      "the lint must flag row_number() OVER (ORDER BY ts) on a raw scan")
  }
}
