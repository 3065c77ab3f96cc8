package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator surface (SURVEY.md §2.1–§2.3, §2.9–§2.12).
  *
  * Each query is paired with ANSI SQL in [[oracleSql]] that DuckDB runs over the
  * same parquet tables. Cross-engine float determinism rules used throughout:
  *   - money sums go through exact integer cents/ten-thousandths
  *     (`CAST(ROUND(x*100) AS BIGINT)` summed, divided back once at the end);
  *   - doubles only ever see a single, identically-ordered division/rounding;
  *   - every query ends in a total ORDER BY over a unique key set;
  *   - raw nanosecond timestamps are never emitted (Spark truncates to µs).
  */
object Relational {

  /** Q1 — pricing summary report (agg A5/A14 analog; TPC-H Q1 shape).
    * Map-side partial aggregation + single shuffle on the 2 grouping keys;
    * at 100 TB the cardinality of (returnflag, linestatus) is tiny so the
    * reduce side is trivially small — the scan dominates, and only
    * the 5 referenced columns are read (column pruning). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        (sum(round($"l_extendedprice" * 100).cast("long")) / 100.0).as("sum_base_price"),
        (sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * 10000).cast("long")) / 10000.0)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Q2 — filter + projection (F6): predicates and 4-column ReadSchema are
    * pushed into the parquet scan. */
  def q2Filter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_quantity" > 45 && $"l_returnflag" === "R")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Q3 — star join + agg (J1/J2): customer/nation/region are dimension
    * tables, broadcast so the fact scan never shuffles for the join; the
    * only shuffle is the final groupBy on (r_name, n_name). */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name", $"n_name")
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(round($"o_totalprice" * 100).cast("long")) / 100.0).as("total_sales"))
      .orderBy($"r_name", $"n_name")
  }

  /** Q4 — global top-k (O1/O2): `orderBy().limit(k)` plans as TakeOrderedAndProject,
    * a per-partition top-k + driver merge — no full sort, no full shuffle. */
  def q4TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .limit(10)
  }

  /** Q5 — dedup keep-best (A1, dedupe.ts:23-52): window row_number over the
    * natural key ordered by recency with a deterministic tiebreak; one shuffle
    * on user_id. This is the reference's "keep highest quality score" shape. */
  def q5DedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type",
        (round($"value" * 100).cast("long")).as("value_cents"))
      .orderBy($"user_id")
  }

  /** Q6 — set op (§2.12): union + distinct of two key sets. */
  def q6Union(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir).select($"c_nationkey".cast("int").as("nationkey"))
    val s = Tables.supplier(spark, dir).select($"s_nationkey".cast("int").as("nationkey"))
    c.unionByName(s).distinct().orderBy($"nationkey")
  }

  /** Q7 — explode/UDTF surface (S4): tokenize → explode → count; the shuffle
    * is on the token, with map-side partial counts. */
  def q7Explode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token")
  }

  /** Q8 — content hash (X5, transform-products-for-db.js:10-36): stable
    * sha256 over a canonical field concatenation; pure map, no shuffle. */
  def q8ContentHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        sha2(concat_ws("|", $"text", $"lang", $"source"), 256).as("content_hash"))
      .orderBy($"doc_id")
  }

  /** Q9 — running window (§2.13 progress counters analog): per-user running
    * total in exact cents; one shuffle on user_id. */
  def q9RunningWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("cents", round($"value" * 100).cast("long"))
      .withColumn("running_cents", sum($"cents").over(w))
      .select($"user_id", $"event_id", $"running_cents")
      .orderBy($"user_id", $"event_id")
  }

  /** Q10 — similar-group detection (A3, dedupe.ts:100-124): group by
    * normalized text, keep groups with >1 member. Runs on the
    * planted-duplicate corpus ([[TrainingData.corpus]]) so dup groups
    * actually exist at every SF — on raw documents the result is empty
    * and the oracle compare would pin nothing. */
  def q10SimilarGroups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    TrainingData.corpus(spark, dir)
      .withColumn("norm",
        trim(regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " ")))
      .groupBy($"norm")
      .agg(count(lit(1)).as("cnt"), min($"doc_id").as("first_doc"))
      .filter($"cnt" > 1)
      .orderBy($"norm")
  }

  /** Q11 — error-summary style agg (A11, postgres-adapter.ts:974-1002):
    * COUNT(*) + COUNT(DISTINCT) + filtered counts per group. */
  def q11ErrorSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("total"),
        countDistinct($"user_id").as("distinct_users"),
        count(when($"value" > 100, 1)).as("high_value"),
        count(when($"value" <= 100, 1)).as("low_value"))
      .orderBy($"event_type")
  }

  /** Q12 — category distribution with share (A7, visualize-data.ts:102-118):
    * count + percentage per group; the percentage is a single division over
    * exact integer counts so it is bit-identical across engines. */
  def q12Distribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy()
    Tables.documents(spark, dir)
      .groupBy($"lang").agg(count(lit(1)).as("cnt"))
      // no 2dp re-round: 100*cnt/total is one exact-int division, bit-stable
      // cross-engine; round(q, 2) on a quotient is the decimal-tie trap
      // (DuckDB rounds the repr, the JVM the binary value)
      .withColumn("pct", lit(100.0) * $"cnt" / sum($"cnt").over(w))
      .orderBy($"cnt".desc, $"lang")
  }

  /** Q13 — histogram buckets + stats (A8, visualize-data.ts:123-162):
    * range buckets via CASE WHEN; avg via exact cents / count (one division). */
  def q13Histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        // single int divisions, no re-round (see q12)
        (sum($"cents") / count(lit(1)) / 100.0).as("avg_price"),
        (min($"cents") / 100.0).as("min_price"),
        (max($"cents") / 100.0).as("max_price"),
        count(when($"o_totalprice" < 1000, 1)).as("b_lt_1000"),
        count(when($"o_totalprice" >= 1000 && $"o_totalprice" < 10000, 1)).as("b_1k_10k"),
        count(when($"o_totalprice" >= 10000 && $"o_totalprice" < 100000, 1)).as("b_10k_100k"),
        count(when($"o_totalprice" >= 100000, 1)).as("b_ge_100k"))
      .orderBy($"o_orderpriority")
  }

  /** Q14 — top-k per group (A15 topIssues): rank window + filter. */
  def q14TopKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rk")
  }

  /** Q15 — pagination (O1, postgres-adapter.ts:72-81): ORDER BY ... LIMIT n
    * OFFSET m. The global top-(offset+limit) runs as TakeOrderedAndProject
    * (per-partition top-k + driver merge); only those ≤40 rows go through
    * the single-partition row_number window — at 100 TB the full table
    * never funnels through one task. */
  def q15Pagination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val top = Tables.orders(spark, dir)
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      .limit(40)
    val w = Window.orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    top.withColumn("rn", row_number().over(w))
      .filter($"rn" > 20 && $"rn" <= 40)
      .select($"rn", $"o_orderkey", $"o_orderstatus")
      .orderBy($"rn")
  }

  /** Q16 — left anti join = changed-row detection shape (J3): rows in orders
    * whose customer is NOT in the filtered dim — the content-hash anti-join
    * pattern used before MERGE. */
  def q16AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigCust = Tables.customer(spark, dir).filter($"c_acctbal" > 0)
      .select($"c_custkey")
    Tables.orders(spark, dir)
      .join(broadcast(bigCust), $"o_custkey" === $"c_custkey", "left_anti")
      .select($"o_orderkey", $"o_custkey")
      .orderBy($"o_orderkey")
  }

  /** Q17 — semi join (EXISTS shape, F5 analog). */
  def q17SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val promoUsers = Tables.events(spark, dir).filter($"event_type" === "purchase")
      .select($"user_id").distinct()
    Tables.events(spark, dir)
      .join(promoUsers, Seq("user_id"), "left_semi")
      .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  /** Q18 — time-window aggregation (§2.13 batch equivalent of the streaming
    * tumbling window): per-day per-type counts and exact-cents sums. */
  def q18TimeWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("day", to_date(date_trunc("day", $"ts")))
      .groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(round($"value" * 100).cast("long")) / 100.0).as("sum_value"))
      .orderBy($"day", $"event_type")
  }

  /** Q36 — multi-dimensional reporting rollup (A7/A8 report family):
    * per (priority, status) with subtotals and grand total; exact-cents
    * sums so every level is bit-stable. */
  def q36Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .rollup($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  /** Q37 — RANGE-frame sliding window: per user, how many events landed in
    * the preceding hour (inclusive). Time expressed as epoch micros so the
    * frame bounds are exact integers in both engines. */
  def q37RangeWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-3600L * 1000000L, 0L)
    Tables.events(spark, dir)
      .withColumn("us", unix_micros($"ts"))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .select($"event_id", $"user_id", $"n_last_hour")
      .orderBy($"event_id")
  }

  /** Q38 — EXACT per-group median (vs the approx A8 percentile): rank rows
    * per group, pick the middle one-or-two cents values, report their sum
    * (med2 = 2×median, kept integral to stay bit-stable cross-engine). */
  def q38ExactMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"cents", $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"o_orderpriority")))
      .groupBy($"o_orderpriority")
      .agg((sum(when($"rn" === expr("(cnt + 1) div 2"), $"cents")) +
            sum(when($"rn" === expr("cnt div 2 + 1"), $"cents"))).as("median2_cents"),
        max($"cnt").as("n"))
      .orderBy($"o_orderpriority")
  }

  /** Q39 — top-k as an AGGREGATE (typed Aggregator, §2.14 UDAF surface):
    * the buffer caps at k so partial aggregation ships k values per
    * partition, not the group — compare the window-based q14. The top-k
    * array is posexploded to scalar (priority, rk, cents) rows so the
    * cross-engine compare never sees an array column. */
  def q39TopKAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val topk = udaf(graft.functions.TopKAgg(3))
    Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .groupBy($"o_orderpriority")
      .agg(topk($"cents").as("top3_cents"))
      .select($"o_orderpriority", posexplode($"top3_cents"))
      .select($"o_orderpriority", ($"pos" + 1).cast("long").as("rk"),
        $"col".as("cents"))
      .orderBy($"o_orderpriority", $"rk")
  }

  /** Q56 — top-k rows per group as a bounded typed Aggregator
    * ([[graft.functions.TopKRowsAgg]]): same result as the q14 window-rank
    * formulation, but the map side ships at most k (cents, orderkey) pairs
    * per (group, partition) instead of sorting every row of every group —
    * the shape that survives a 10⁹-row group at 100 TB. */
  def q56TopKRowsAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val topk = udaf(graft.functions.TopKRowsAgg(3))
    Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .groupBy($"o_custkey")
      .agg(topk($"cents", $"o_orderkey").as("top3"))
      .select($"o_custkey", posexplode($"top3"))
      .select($"o_custkey", ($"pos" + 1).cast("long").as("rk"),
        $"col._2".as("o_orderkey"), $"col._1".as("cents"))
      .orderBy($"o_custkey", $"rk")
  }

  /** Q57 — skew-safe two-stage aggregation ([[graft.etl.Skew.saltedCount]]):
    * result is identical to a plain groupBy count, but a Zipfian hot key
    * spreads over 32 reducers before the tiny re-aggregation. Oracle is the
    * plain count — salting must be invisible in the result. */
  def q57SaltedCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Skew.saltedCount(Tables.events(spark, dir), $"event_type", 32)
      .orderBy($"key")
  }

  /** Q58 — salted replicated join ([[graft.etl.Skew.saltedJoin]]) for a
    * skewed fact against a non-broadcastable dim: dim rows replicate ×16,
    * the hot fact key spreads across 16 partitions, and the join result is
    * byte-identical to the unsalted join (the oracle is the plain join). */
  def q58SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fact = Tables.events(spark, dir)
    val dim = Tables.customer(spark, dir)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    graft.etl.Skew.saltedJoin(fact, dim, "user_id", 16)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum(round($"value" * 100).cast("long")).as("value_cents"))
      .orderBy($"c_mktsegment")
  }

  /** Q60 — pivot (wide report shape): per-user event counts, one column
    * per event type. The value list is explicit, so the plan is a single
    * groupBy — no extra distinct-values job, which is also the 100 TB rule:
    * never let pivot infer its columns from a full scan. */
  def q60Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"user_id")
  }

  /** Q61 — unpivot/melt (the inverse reshape): lineitem measures to long
    * form. Narrow transform, no shuffle — each row fans out to 3 rows
    * within its partition. */
  def q61Unpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount", $"l_tax")
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_discount", $"l_tax"),
        "metric", "value")
      .orderBy($"l_orderkey", $"l_linenumber", $"metric")
  }

  /** Q62 — lag/lead window functions: per-user event deltas in exact
    * cents. One shuffle on user_id; the frame is implicit (offset
    * functions need no buffer beyond the offset row). */
  def q62LagLead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("cents", round($"value" * 100).cast("long"))
      .select($"user_id", $"event_id", $"cents",
        lag($"cents", 1).over(w).as("prev_cents"),
        lead($"cents", 1).over(w).as("next_cents"),
        ($"cents" - coalesce(lag($"cents", 1).over(w), lit(0L))).as("delta_cents"))
      .orderBy($"user_id", $"event_id")
  }

  /** Q63 — cube reporting aggregation (q36's rollup sibling): all four
    * grouping sets in one pass, map-side partials per set. */
  def q63Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  /** Q68 — ranking-function family over cents (rank/dense_rank/percent_rank
    * tolerate ties — they depend only on the sort key; ntile and cume_dist
    * ride a fully-deterministic (cents, o_orderkey) ordering). percent_rank
    * is (rank−1)/(n−1): a single integer division, bit-stable
    * cross-engine. */
  def q68RankFamily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byCents = Window.partitionBy($"o_orderpriority")
      .orderBy($"cents")
    val unique = Window.partitionBy($"o_orderpriority")
      .orderBy($"cents", $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .select($"o_orderpriority", $"o_orderkey", $"cents",
        rank().over(byCents).as("rk"),
        dense_rank().over(byCents).as("drk"),
        percent_rank().over(byCents).as("prk"),
        ntile(4).over(unique).as("quartile"),
        cume_dist().over(unique).as("cd"))
      .orderBy($"o_orderpriority", $"cents", $"o_orderkey")
  }

  /** Q69 — explicit grouping sets (the generalization rollup/cube
    * specialize): per-priority and per-status marginals in ONE pass —
    * map-side partials per set, no second scan. Uses Spark 4's native
    * `Dataset.groupingSets`. */
  def q69GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .groupingSets(
        Seq(Seq($"o_orderpriority"), Seq($"o_orderstatus")),
        $"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  /** Q70 — the remaining set operators (§2.12 lists union as the only one
    * the reference uses; EXCEPT/INTERSECT complete the family): both plan
    * as aggregates/joins on the hashed row, one shuffle each. */
  def q70SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    def users(t: String) = ev.filter($"event_type" === t).select($"user_id")
    val clickOnly = users("click").except(users("purchase"))
      .select(lit("click_only").as("tag"), $"user_id")
    val clickAndBuy = users("click").intersect(users("purchase"))
      .select(lit("click_and_buy").as("tag"), $"user_id")
    clickOnly.unionByName(clickAndBuy).orderBy($"tag", $"user_id")
  }

  /** Q71 — temporal extraction family (X4's query-side kin): every part
    * the reporting layer slices by, in one codegen projection. Convention
    * notes pinned by the oracle: Spark `dayofweek` is 1=Sunday (DuckDB
    * `dow` is 0=Sunday → +1), `weekofyear` is ISO week on both engines. */
  def q71Datetime(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).select(
        $"event_id",
        year($"ts").as("y"),
        quarter($"ts").as("q"),
        month($"ts").as("m"),
        dayofmonth($"ts").as("d"),
        hour($"ts").as("h"),
        minute($"ts").as("mi"),
        dayofweek($"ts").as("dow1"),
        weekofyear($"ts").as("iso_week"),
        dayofyear($"ts").as("doy"),
        last_day($"ts").cast("date").as("month_end"),
        date_trunc("week", $"ts").cast("date").as("week_start"))
      .orderBy($"event_id")
  }

  /** Q78 — exact nearest-rank percentile family
    * ([[graft.etl.Analytics.exactPercentiles]]): p25/p50/p75 of order
    * cents per priority, percentile_disc semantics (always a data value,
    * never an interpolated float) — q38's median generalized. */
  def q78Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Analytics.exactPercentiles(
        Tables.orders(spark, dir)
          .withColumn("cents", round($"o_totalprice" * 100).cast("long")),
        "o_orderpriority", "cents")
      .orderBy($"o_orderpriority")
  }

  /** Q81 — Morton (Z-order) clustering key ([[graft.etl.Layout.zValue]]):
    * the layout primitive behind two-dimensional file pruning; the key
    * itself is oracle-checked bit-for-bit (the cluster-by-write around it
    * is exercised in LayoutSpec). */
  def q81Zorder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        graft.etl.Layout.zValue($"o_orderkey", $"o_custkey").as("zval"))
      .orderBy($"o_orderkey")
  }

  /** Q251 — Hilbert-curve layout key ([[graft.etl.Layout.hilbertValue]],
    * native codegen `hilbert` expression): the z-curve's better-locality
    * sibling over the same (orderkey, custkey) plane; order 8 keeps the
    * oracle's recursive re-derivation 8 rounds deep. */
  def q251Hilbert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        graft.etl.Layout.hilbertValue($"o_orderkey", $"o_custkey", order = 8)
          .as("hval"))
      .orderBy($"o_orderkey")
  }

  /** Q310 — compaction plan ([[graft.etl.Layout.compactionPlan]]) over
    * the documents "file listing" (n_chars as the size), per language,
    * 64 kB target: contiguous doc_id ranges folded into ≥-target output
    * bins — the deterministic small-files rewrite task list a long-lived
    * table's maintenance job executes. */
  def q310CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Layout.compactionPlan(
        Tables.documents(spark, dir)
          .select($"lang", $"doc_id", $"n_chars"),
        "lang", "doc_id", "n_chars", targetBytes = 64000L)
      .orderBy($"lang", $"bin")
  }

  /** Q355 — zone-map pruning audit ([[graft.etl.Layout.zonemapAudit]]):
    * three candidate lineitem layouts (arrival order, shipdate-sorted,
    * partkey-sorted) cut into 64 rank-contiguous shards; for three
    * 30-day shipdate windows, how many shards' min/max zones a reader
    * would have to open. The measured case for rewriting the table
    * shipdate-first before committing the 100 TB rewrite. */
  def q355ZonemapAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select(
      datediff(to_date($"l_shipdate"), to_date(lit("1970-01-01")))
        .cast("long").as("sd"),
      $"l_orderkey", $"l_linenumber", $"l_partkey")
    graft.etl.Layout.zonemapAudit(li, Seq(
        "natural" -> Seq("l_orderkey", "l_linenumber"),
        "by_shipdate" -> Seq("sd", "l_orderkey", "l_linenumber"),
        "by_partkey" -> Seq("l_partkey", "l_orderkey", "l_linenumber")),
      "sd", Seq((8400L, 8430L), (9200L, 9230L), (10000L, 10030L)),
      nShards = 64)
      .orderBy($"layout", $"p_lo")
  }

  /** Q371 — functional-dependency audit
    * ([[graft.etl.Quality.functionalDependency]]) of four schema claims:
    * the two key claims (p_partkey→p_brand, o_orderkey→o_custkey) hold,
    * and the two plausible-but-false assumptions (brand determines type,
    * customer determines priority) get their violation mass quantified —
    * the contract check run before anyone denormalizes on a "determined"
    * column. */
  def q371FdAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir)
    val o = Tables.orders(spark, dir)
    graft.etl.Quality
      .functionalDependency(p, Seq("p_partkey"), "p_brand",
        "p_partkey->p_brand")
      .unionByName(graft.etl.Quality.functionalDependency(
        p, Seq("p_brand"), "p_type", "p_brand->p_type"))
      .unionByName(graft.etl.Quality.functionalDependency(
        o, Seq("o_orderkey"), "o_custkey", "o_orderkey->o_custkey"))
      .unionByName(graft.etl.Quality.functionalDependency(
        o, Seq("o_custkey"), "o_orderpriority", "o_custkey->o_orderpriority"))
      .orderBy($"fd")
  }

  /** Q366 — clustering factor ([[graft.etl.Layout.clusteringFactor]]) of
    * two candidate filter keys under lineitem's arrival order: the order
    * key (contiguous by construction → bp 10000) vs the supplier key
    * (interleaved → bp collapses). The run-count companion to q355's
    * zone-map audit: zonemaps say what a layout would prune, this says
    * how badly the CURRENT layout serves each key. */
  def q366ClusteringFactor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_linenumber")
    val order = Seq($"l_orderkey", $"l_linenumber")
    graft.etl.Layout.clusteringFactor(li, order, "l_orderkey")
      .unionByName(graft.etl.Layout.clusteringFactor(li, order, "l_suppkey"))
      .orderBy($"key")
  }

  /** Q356 — salting planner ([[graft.etl.Skew.saltPlan]]) for the
    * events stream keyed by event type: per key, the salt factor that
    * caps any one (key, salt) reducer at 500 rows and the residual
    * per-task load it achieves — measured before q57/q58's salted
    * operators commit to a factor. */
  def q356SaltPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Skew.saltPlan(Tables.events(spark, dir), $"event_type",
        targetPerTask = 500L)
      .orderBy($"key")
  }

  /** Q301 — fixed-basket Laspeyres price index per month
    * ([[graft.etl.Analytics.priceIndex]]): part-level minimum unit
    * prices against base-month quantities over the matched basket — the
    * inflation tracker the reference's grocery price data exists to
    * feed, as one exact cross-multiplied fraction per month. */
  def q301PriceIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"o_orderkey" === $"l_orderkey")
      .select($"l_partkey".as("item"),
        (year(to_date($"o_orderdate")) * 12 +
          month(to_date($"o_orderdate"))).cast("long").as("mon"),
        expr("""CAST(round(l_extendedprice * 100) AS BIGINT)
                div CAST(l_quantity AS BIGINT)""").as("up"),
        expr("CAST(l_quantity AS BIGINT)").as("q"))
    graft.etl.Analytics.priceIndex(li, "item", "mon", "up", "q")
      .orderBy($"mon")
  }

  /** Q302 — empirical-Bayes conversion smoothing
    * ([[graft.etl.Analytics.ebSmoothedRate]]): per customer bucket the
    * fulfilled-order rate shrunk toward the global rate with 200
    * pseudo-observations — the partial pooling that keeps a 1-of-1
    * bucket from outranking a 980-of-1000 one. */
  def q302EbSmoothing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Analytics.ebSmoothedRate(
        Tables.orders(spark, dir)
          .select(($"o_custkey" % 1000).as("bucket"), $"o_orderstatus"),
        "bucket", col("o_orderstatus") === "F", priorStrength = 200L)
      .orderBy($"bucket")
  }

  /** Q266 — grid-bucketed proximity join ([[graft.etl.Geo]]): synthetic
    * micro-degree points from customer keys, all pairs within 0.5° via
    * the 3×3-cell equi-join — never an all-pairs distance pass. */
  def q266ProximityJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = Tables.customer(spark, dir).select($"c_custkey".as("id"),
      (($"c_custkey" * 7919) % 360000000L - 180000000L).as("x"),
      (($"c_custkey" * 104729) % 180000000L - 90000000L).as("y"))
    graft.etl.Geo.gridProximityJoin(pts, "id", "x", "y",
        radiusMicroDeg = 500000L)
      .orderBy($"id_a", $"id_b")
  }

  /** Q267 — decile + exact cumulative distribution per cohort: `ntile`
    * over the deterministic (cents, event_id) total order, and cume as
    * the exact fraction rows-with-value-≤-mine / n via a RANGE window —
    * no float cume_dist. */
  def q267NtileCume(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).filter($"value".isNotNull)
      .select($"event_id", ($"user_id" % 4).as("cohort"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val wRows = Window.partitionBy($"cohort").orderBy($"cents", $"event_id")
    val wRange = Window.partitionBy($"cohort").orderBy($"cents")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"cohort")
    e.withColumn("decile", ntile(10).over(wRows).cast("long"))
      .withColumn("cume_num", count(lit(1)).over(wRange))
      .withColumn("cume_den", count(lit(1)).over(wAll))
      .orderBy($"event_id")
  }

  /** Q269 — column-level snapshot diff ([[graft.etl.Analytics.columnDiff]]):
    * a synthetic rewrite of orders (dropped keys, repriced keys, flipped
    * statuses, net-new keys) reduced to the long-form added/removed/
    * changed-per-column report a migration gate asserts on. */
  def q269ColumnDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.orders(spark, dir).select($"o_orderkey".as("k"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      $"o_orderstatus".as("status"), $"o_orderpriority".as("prio"))
    val b0 = a.filter($"k" % 17 =!= 0)
      .select($"k",
        ($"cents" + when($"k" % 13 === 0, 100L).otherwise(0L)).as("cents"),
        when($"k" % 11 === 0, lit("X")).otherwise($"status").as("status"),
        $"prio")
    val b = b0.unionByName(a.filter($"k" % 19 === 0)
      .select(($"k" + 2000000000L).as("k"), $"cents", $"status", $"prio"))
    graft.etl.Analytics.columnDiff(a, b, "k",
        Seq("cents", "status", "prio"))
      .orderBy($"metric")
  }

  /** Q82 — Tukey-fence outliers ([[graft.etl.Analytics.iqrOutliers]]
    * composed over exactPercentiles + broadcast fences): k=1 (0.5·IQR —
    * the synthetic uniform prices have no 1.5·IQR tail, which would make
    * the query vacuous). */
  def q82IqrOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Analytics.iqrOutliers(
        Tables.orders(spark, dir)
          .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
          .select($"o_orderpriority", $"o_orderkey", $"cents"),
        "o_orderpriority", "cents", k = 1)
      .select($"o_orderkey", $"o_orderpriority", $"cents")
      .orderBy($"o_orderkey")
  }

  /** Q84 — ordered string aggregation (listagg shape): the concatenated
    * value list is made deterministic by sorting the DISTINCT set before
    * joining — an unordered listagg is nondeterministic under parallel
    * merge and can never be oracle-checked. */
  def q84Listagg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(array_join(array_sort(collect_set($"o_orderstatus")), ",")
          .as("statuses"),
        countDistinct($"o_orderstatus").as("n_statuses"))
      .orderBy($"o_orderpriority")
  }

  /** Q93 — dynamic-range equi-width histogram: global min/max computed in
    * one aggregate row, broadcast back (the two-pass bounds pattern —
    * q13's buckets are fixed), then pure integer binning; `hi-lo+1`
    * keeps the max value inside the last of the 20 buckets. */
  def q93DynHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
    val bounds = o.agg(min($"cents").as("lo"), max($"cents").as("hi"))
    o.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr("(cents - lo) * 20 div (hi - lo + 1)"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        min($"cents").as("min_c"), max($"cents").as("max_c"))
      .orderBy($"bucket")
  }

  /** Q97 — group-wise min-max normalization to integer basis points:
    * (v − lo)·10000 div (hi − lo) per group — feature scaling without a
    * float quotient; the per-group bounds broadcast back (q82's fence
    * pattern with bounds instead of quartiles). */
  def q97MinmaxNorm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
    val bounds = o.groupBy($"o_orderpriority")
      .agg(min($"cents").as("lo"), max($"cents").as("hi"))
    o.join(broadcast(bounds), Seq("o_orderpriority"))
      .withColumn("bp", when($"hi" === $"lo", 0L)
        .otherwise(expr("(cents - lo) * 10000 div (hi - lo)")))
      .select($"o_orderkey", $"o_orderpriority", $"bp")
      .orderBy($"o_orderkey")
  }

  /** Q99 — median absolute deviation per group (robust dispersion):
    * [[graft.etl.Analytics.exactPercentiles]] composed TWICE — the group
    * median broadcasts back, absolute deviations re-rank, their median is
    * the MAD. Integers end to end (|cents − median| stays integral). */
  def q99Mad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .select($"o_orderpriority", $"cents")
    val med = graft.etl.Analytics
      .exactPercentiles(o, "o_orderpriority", "cents")
      .select($"o_orderpriority", $"p50")
    val dev = o.join(broadcast(med), Seq("o_orderpriority"))
      .withColumn("adev", abs($"cents" - $"p50"))
      .select($"o_orderpriority", $"adev")
    graft.etl.Analytics.exactPercentiles(dev, "o_orderpriority", "adev")
      .select($"o_orderpriority", $"n", $"p50".as("mad_cents"))
      .orderBy($"o_orderpriority")
  }

  /** Q100 — Benford first-digit audit (data-quality screen): first digit
    * taken lexically from the integer cents (no float log10), counts per
    * digit — uniform synthetic prices won't follow Benford, which is
    * exactly what the audit is for. */
  def q100Benford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .withColumn("digit", substring($"cents".cast("string"), 1, 1).cast("long"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
      .orderBy($"digit")
  }

  /** Q191 — period-over-period growth: revenue cents per brand in the
    * first vs second half of the shipdate range (midpoint from one
    * broadcast min/max row), growth in bp with a NULLIF guard — the BI
    * staple "compare this period to last" as one join + one conditional
    * aggregation, no self-join of the fact table against itself. */
  def q191PopGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir).select($"l_partkey",
      datediff(to_date($"l_shipdate"), to_date(lit("1970-01-01")))
        .cast("long").as("_d"),
      graft.etl.Series.cents($"l_extendedprice").as("_rev_c"))
    val bounds = l.agg(min($"_d").as("_lo"), max($"_d").as("_hi"))
    val p = Tables.part(spark, dir)
      .select($"p_partkey".as("l_partkey"), $"p_brand")
    l.join(p, "l_partkey").crossJoin(broadcast(bounds))
      .withColumn("_half",
        when($"_d" < expr("(_lo + _hi + 1) div 2"), 1).otherwise(2))
      .groupBy($"p_brand")
      .agg(sum(when($"_half" === 1, $"_rev_c").otherwise(0L)).as("rev1_c"),
        sum(when($"_half" === 2, $"_rev_c").otherwise(0L)).as("rev2_c"))
      .withColumn("growth_bp",
        expr("((rev2_c - rev1_c) * 10000L) div NULLIF(rev1_c, 0L)"))
      .orderBy($"p_brand")
  }

  /** Cumulative revenue leaderboard: per ship month, the top-3 brands by
    * revenue-to-date. A dense brand × month grid (both dimensions tiny,
    * broadcast) keeps brands with no sales this month in the running;
    * cumulative sums partition by brand, the rank window by month — the
    * expanding-window twin of q14's per-group top-k. */
  def q215Leaderboard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir).select($"l_partkey",
      (year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long")
        .as("month"),
      graft.etl.Series.cents($"l_extendedprice").as("_c"))
    val p = Tables.part(spark, dir).select($"p_partkey", $"p_brand")
    val monthly = li.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"month").agg(sum($"_c").as("_mc"))
    val grid = monthly.select($"p_brand").distinct()
      .crossJoin(broadcast(monthly.select($"month").distinct()))
    val cum = grid.join(monthly, Seq("p_brand", "month"), "left")
      .na.fill(0L, Seq("_mc"))
      .withColumn("cum_cents", sum($"_mc").over(
        Window.partitionBy($"p_brand").orderBy($"month")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
    cum.withColumn("rk", row_number().over(
        Window.partitionBy($"month").orderBy($"cum_cents".desc, $"p_brand"))
        .cast("long"))
      .filter($"rk" <= 3)
      .select($"month", $"rk", $"p_brand", $"cum_cents")
      .orderBy($"month", $"rk")
  }

  /** Q411 — per-partition Bloom-filter sizing plan
    * ([[graft.etl.Layout.bloomPlan]]): for each order month, the exact
    * distinct customer count and the 1%-FPP bit/word footprint a
    * runtime-filter build would allocate — the capacity table consulted
    * before materializing per-partition blooms for the q124-style
    * pruned semi-join. Pure integer sizing (9585 milli-bits/key, k=7):
    * no libm in either engine. */
  def q411BloomPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select(date_format($"o_orderdate", "yyyy-MM").as("month"),
        $"o_custkey")
    graft.etl.Layout.bloomPlan(o, "month", "o_custkey")
      .orderBy($"month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q411_bloom_plan" -> q411BloomPlan _,
    "q215_leaderboard" -> q215Leaderboard _,
    "q191_pop_growth" -> q191PopGrowth _,
    "q1_agg" -> q1Agg _,
    "q2_filter" -> q2Filter _,
    "q3_join_agg" -> q3JoinAgg _,
    "q4_topk" -> q4TopK _,
    "q5_dedup_keep_best" -> q5DedupKeepBest _,
    "q6_union" -> q6Union _,
    "q7_explode" -> q7Explode _,
    "q8_content_hash" -> q8ContentHash _,
    "q9_running_window" -> q9RunningWindow _,
    "q10_similar_groups" -> q10SimilarGroups _,
    "q11_error_summary" -> q11ErrorSummary _,
    "q12_distribution" -> q12Distribution _,
    "q13_histogram" -> q13Histogram _,
    "q14_topk_per_group" -> q14TopKPerGroup _,
    "q15_pagination" -> q15Pagination _,
    "q16_anti_join" -> q16AntiJoin _,
    "q17_semi_join" -> q17SemiJoin _,
    "q18_time_window" -> q18TimeWindow _,
    "q36_rollup" -> q36Rollup _,
    "q37_range_window" -> q37RangeWindow _,
    "q38_exact_median" -> q38ExactMedian _,
    "q39_topk_agg" -> q39TopKAgg _,
    "q56_topk_rows_agg" -> q56TopKRowsAgg _,
    "q57_salted_count" -> q57SaltedCount _,
    "q58_salted_join" -> q58SaltedJoin _,
    "q60_pivot" -> q60Pivot _,
    "q61_unpivot" -> q61Unpivot _,
    "q62_lag_lead" -> q62LagLead _,
    "q63_cube" -> q63Cube _,
    "q68_rank_family" -> q68RankFamily _,
    "q69_grouping_sets" -> q69GroupingSets _,
    "q70_set_ops" -> q70SetOps _,
    "q71_datetime" -> q71Datetime _,
    "q78_percentiles" -> q78Percentiles _,
    "q81_zorder" -> q81Zorder _,
    "q251_hilbert" -> q251Hilbert _,
    "q310_compaction_plan" -> q310CompactionPlan _,
    "q355_zonemap_audit" -> q355ZonemapAudit _,
    "q366_clustering_factor" -> q366ClusteringFactor _,
    "q371_fd_audit" -> q371FdAudit _,
    "q356_salt_plan" -> q356SaltPlan _,
    "q266_proximity_join" -> q266ProximityJoin _,
    "q301_price_index" -> q301PriceIndex _,
    "q302_eb_smoothing" -> q302EbSmoothing _,
    "q267_ntile_cume" -> q267NtileCume _,
    "q269_column_diff" -> q269ColumnDiff _,
    "q82_iqr_outliers" -> q82IqrOutliers _,
    "q84_listagg" -> q84Listagg _,
    "q93_dyn_histogram" -> q93DynHistogram _,
    "q97_minmax_norm" -> q97MinmaxNorm _,
    "q99_mad" -> q99Mad _,
    "q100_benford" -> q100Benford _)

  /** DuckDB-flavored ANSI SQL oracles. `1e2`/`1e4` double literals are used
    * instead of `100.0` because DuckDB parses `100.0` as DECIMAL and would
    * round differently from Spark's double arithmetic. */
  val oracleSql: Map[String, String] = Map(
    "q411_bloom_plan" -> """
      |WITH p AS (
      |  SELECT substring(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7)
      |    AS month,
      |    count(DISTINCT o_custkey) AS n_keys
      |  FROM orders GROUP BY 1),
      |b AS (
      |  SELECT month, n_keys,
      |    (n_keys * 9585 + 999) // 1000 AS bits
      |  FROM p)
      |SELECT month, CAST(n_keys AS BIGINT) AS n_keys,
      |  CAST(bits AS BIGINT) AS bits,
      |  CAST((bits + 63) // 64 AS BIGINT) AS words64,
      |  7 AS k_hashes
      |FROM b ORDER BY month""".stripMargin,
    "q371_fd_audit" -> {
      def one(name: String, table: String, lhs: String, rhs: String) =
        s"""SELECT '$name' AS fd, CAST(count(*) AS BIGINT) AS n_groups,
           |  CAST(sum(n) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  CAST(sum(CASE WHEN d > 1 THEN n ELSE 0 END) AS BIGINT)
           |    AS rows_in_violating,
           |  CAST(max(d) AS BIGINT) AS max_fanout,
           |  CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) * 10000
           |    // count(*) AS BIGINT) AS violation_bp
           |FROM (SELECT $lhs, count(*) AS n, count(DISTINCT $rhs) AS d
           |      FROM $table GROUP BY 1)""".stripMargin
      Seq(
        one("p_partkey->p_brand", "part", "p_partkey", "p_brand"),
        one("p_brand->p_type", "part", "p_brand", "p_type"),
        one("o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
        one("o_custkey->o_orderpriority", "orders", "o_custkey",
          "o_orderpriority"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
    },
    "q366_clustering_factor" -> """
      |WITH s AS (
      |  SELECT l_orderkey, l_suppkey,
      |    lag(l_orderkey) OVER (ORDER BY l_orderkey, l_linenumber) AS p1,
      |    lag(l_suppkey) OVER (ORDER BY l_orderkey, l_linenumber) AS p2
      |  FROM lineitem),
      |a AS (
      |  SELECT 'l_orderkey' AS key, count(*) AS n_rows,
      |    count(DISTINCT l_orderkey) AS n_distinct,
      |    1 + sum(CASE WHEN p1 IS NOT NULL AND l_orderkey <> p1
      |            THEN 1 ELSE 0 END) AS n_runs
      |  FROM s
      |  UNION ALL
      |  SELECT 'l_suppkey', count(*), count(DISTINCT l_suppkey),
      |    1 + sum(CASE WHEN p2 IS NOT NULL AND l_suppkey <> p2
      |            THEN 1 ELSE 0 END)
      |  FROM s)
      |SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(n_distinct AS BIGINT) AS n_distinct,
      |  CAST(n_runs AS BIGINT) AS n_runs,
      |  CAST(n_distinct * 10000 // n_runs AS BIGINT) AS clustering_bp
      |FROM a ORDER BY key""".stripMargin,
    "q355_zonemap_audit" -> """
      |WITH li AS (
      |  SELECT date_diff('day', DATE '1970-01-01', l_shipdate) AS sd,
      |    l_orderkey, l_linenumber, l_partkey FROM lineitem),
      |tot AS (SELECT count(*) AS t FROM li),
      |pr AS (SELECT * FROM (VALUES (8400, 8430), (9200, 9230),
      |        (10000, 10030)) v(p_lo, p_hi)),
      |lay AS (
      |  SELECT 'natural' AS layout,
      |    row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rk, sd
      |  FROM li
      |  UNION ALL
      |  SELECT 'by_shipdate',
      |    row_number() OVER (ORDER BY sd, l_orderkey, l_linenumber), sd
      |  FROM li
      |  UNION ALL
      |  SELECT 'by_partkey',
      |    row_number() OVER (ORDER BY l_partkey, l_orderkey, l_linenumber),
      |    sd
      |  FROM li),
      |z AS (SELECT layout, (rk - 1) * 64 // t AS shard,
      |        min(sd) AS lo, max(sd) AS hi
      |      FROM lay, tot GROUP BY 1, 2)
      |SELECT z.layout, CAST(p.p_lo AS BIGINT) AS p_lo,
      |  CAST(p.p_hi AS BIGINT) AS p_hi,
      |  CAST(count(*) AS BIGINT) AS n_shards,
      |  CAST(sum(CASE WHEN z.hi >= p.p_lo AND z.lo <= p.p_hi
      |           THEN 1 ELSE 0 END) AS BIGINT) AS shards_scanned,
      |  CAST(sum(CASE WHEN z.hi >= p.p_lo AND z.lo <= p.p_hi
      |           THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS scan_bp
      |FROM pr p CROSS JOIN z
      |GROUP BY 1, 2, 3 ORDER BY layout, p_lo""".stripMargin,
    "q356_salt_plan" -> """
      |WITH c AS (SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n
      |           FROM events GROUP BY 1)
      |SELECT key, n, CAST((n + 499) // 500 AS BIGINT) AS salt,
      |  CAST((n + (n + 499) // 500 - 1) // ((n + 499) // 500) AS BIGINT)
      |    AS max_task_rows,
      |  (n + 499) // 500 > 1 AS is_hot
      |FROM c ORDER BY key""".stripMargin,
    "q310_compaction_plan" -> """
      |WITH c AS (
      |  SELECT lang, doc_id, n_chars,
      |    CAST(coalesce(sum(n_chars) OVER (PARTITION BY lang
      |      ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS prev
      |  FROM documents)
      |SELECT lang, CAST(prev // 64000 AS BIGINT) AS bin,
      |  CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(sum(n_chars) AS BIGINT) AS bytes,
      |  CAST(min(doc_id) AS BIGINT) AS first_id,
      |  CAST(max(doc_id) AS BIGINT) AS last_id
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q215_leaderboard" -> """
      |WITH m AS (SELECT p_brand,
      |        year(l_shipdate) * 12 + month(l_shipdate) AS month,
      |        CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |          AS BIGINT) AS mc
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      GROUP BY 1, 2),
      |gr AS (SELECT b.p_brand, mo.month
      |       FROM (SELECT DISTINCT p_brand FROM m) b,
      |            (SELECT DISTINCT month FROM m) mo),
      |d AS (SELECT gr.p_brand, gr.month, coalesce(m.mc, 0) AS mc
      |      FROM gr LEFT JOIN m USING (p_brand, month)),
      |c AS (SELECT p_brand, month,
      |        CAST(sum(mc) OVER (PARTITION BY p_brand ORDER BY month
      |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      |      FROM d),
      |r AS (SELECT month, p_brand, cum_cents,
      |        CAST(row_number() OVER (PARTITION BY month
      |          ORDER BY cum_cents DESC, p_brand) AS BIGINT) AS rk
      |      FROM c)
      |SELECT month, rk, p_brand, cum_cents FROM r
      |WHERE rk <= 3 ORDER BY month, rk""".stripMargin,
    "q191_pop_growth" -> """
      |WITH l AS (SELECT l_partkey,
      |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS rev_c
      |  FROM lineitem),
      |b AS (SELECT min(d) AS lo, max(d) AS hi FROM l),
      |j AS (SELECT p_brand,
      |    CASE WHEN d < (lo + hi + 1) // 2 THEN 1 ELSE 2 END AS half, rev_c
      |  FROM l JOIN part ON l_partkey = p_partkey CROSS JOIN b),
      |a AS (SELECT p_brand,
      |    CAST(sum(CASE WHEN half = 1 THEN rev_c ELSE 0 END) AS BIGINT)
      |      AS rev1_c,
      |    CAST(sum(CASE WHEN half = 2 THEN rev_c ELSE 0 END) AS BIGINT)
      |      AS rev2_c
      |  FROM j GROUP BY 1)
      |SELECT p_brand, rev1_c, rev2_c,
      |  ((rev2_c - rev1_c) * 10000) // NULLIF(rev1_c, 0) AS growth_bp
      |FROM a ORDER BY 1""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(CAST(round(l_extendedprice*1e2) AS BIGINT))/1e2 AS sum_base_price,
        |  sum(CAST(round(l_extendedprice*(1-l_discount)*1e4) AS BIGINT))/1e4 AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q2_filter" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_agg" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  sum(CAST(round(o_totalprice*1e2) AS BIGINT))/1e2 AS total_sales
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q4_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    // epoch_us (not raw ts): Spark truncates the parquet's nanosecond
    // timestamps to µs (Tables.events), so a same-user µs collision would
    // tiebreak by event_id in Spark but by sub-µs nanos in DuckDB — the
    // oracle must sort at the same precision the engine sees
    "q5_dedup_keep_best" ->
      """SELECT user_id, event_id, event_type,
        |  CAST(round(value*1e2) AS BIGINT) AS value_cents
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q6_union" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,
    "q7_explode" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> '' GROUP BY token ORDER BY cnt DESC, token""".stripMargin,
    "q8_content_hash" ->
      """SELECT doc_id, sha256(concat_ws('|', text, lang, source)) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    // NOTE (driver-hash determinism): DuckDB SUM(BIGINT) widens to HUGEINT,
    // which the driver's pandas bridge renders as float64 ("123.0" vs "123")
    // even when values are identical — every raw SUM emitted to the compare
    // is CAST back to BIGINT so both engines present int64.
    "q9_running_window" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(round(value*1e2) AS BIGINT)) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q10_similar_groups" ->
      s"""WITH ${TrainingData.corpusSql}
        |SELECT norm, count(*) AS cnt, min(doc_id) AS first_doc FROM (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm FROM corpus)
        |GROUP BY norm HAVING count(*) > 1 ORDER BY norm""".stripMargin,
    "q11_error_summary" ->
      """SELECT event_type, count(*) AS total,
        |  count(DISTINCT user_id) AS distinct_users,
        |  count(*) FILTER (WHERE value > 100) AS high_value,
        |  count(*) FILTER (WHERE value <= 100) AS low_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_distribution" ->
      """SELECT lang, cnt, 1e2*cnt/sum(cnt) OVER () AS pct
        |FROM (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1)
        |ORDER BY cnt DESC, lang""".stripMargin,
    "q13_histogram" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(cents)/count(*)/1e2 AS avg_price,
        |  min(cents)/1e2 AS min_price,
        |  max(cents)/1e2 AS max_price,
        |  count(*) FILTER (WHERE o_totalprice < 1000) AS b_lt_1000,
        |  count(*) FILTER (WHERE o_totalprice >= 1000 AND o_totalprice < 10000) AS b_1k_10k,
        |  count(*) FILTER (WHERE o_totalprice >= 10000 AND o_totalprice < 100000) AS b_10k_100k,
        |  count(*) FILTER (WHERE o_totalprice >= 100000) AS b_ge_100k
        |FROM (SELECT *, CAST(round(o_totalprice*1e2) AS BIGINT) AS cents FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_topk_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q15_pagination" ->
      """SELECT rn, o_orderkey, o_orderstatus FROM (
        |  SELECT *, row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn > 20 AND rn <= 40 ORDER BY rn""".stripMargin,
    "q16_anti_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
        |ORDER BY o_orderkey""".stripMargin,
    "q17_semi_join" ->
      """SELECT user_id, count(*) AS n_events FROM events
        |WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q39_topk_agg" ->
      """SELECT o_orderpriority, rk, cents FROM (
        |  SELECT o_orderpriority, CAST(round(o_totalprice*1e2) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice*1e2) AS BIGINT) DESC) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
    "q99_mad" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |    CAST(round(o_totalprice*1e2) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice*1e2) AS BIGINT)) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders),
        |m AS (SELECT o_orderpriority,
        |        CAST(sum(CASE WHEN rn = (n+1)//2 THEN cents END) AS BIGINT) AS p50
        |      FROM r GROUP BY 1),
        |d AS (
        |  SELECT r.o_orderpriority, abs(r.cents - m.p50) AS adev
        |  FROM r JOIN m USING (o_orderpriority)),
        |r2 AS (
        |  SELECT o_orderpriority, adev,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY adev) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM d)
        |SELECT o_orderpriority, max(n) AS n,
        |  CAST(sum(CASE WHEN rn = (n+1)//2 THEN adev END) AS BIGINT) AS mad_cents
        |FROM r2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q100_benford" ->
      """SELECT CAST(substring(CAST(CAST(round(o_totalprice*1e2) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q97_minmax_norm" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(round(o_totalprice*1e2) AS BIGINT) AS cents FROM orders),
        |b AS (SELECT o_orderpriority, min(cents) AS lo, max(cents) AS hi
        |      FROM r GROUP BY 1)
        |SELECT r.o_orderkey, r.o_orderpriority,
        |  CASE WHEN b.hi = b.lo THEN 0
        |       ELSE (r.cents - b.lo) * 10000 // (b.hi - b.lo) END AS bp
        |FROM r JOIN b USING (o_orderpriority)
        |ORDER BY r.o_orderkey""".stripMargin,
    "q93_dyn_histogram" ->
      """WITH r AS (
        |  SELECT CAST(round(o_totalprice*1e2) AS BIGINT) AS cents FROM orders),
        |b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM r)
        |SELECT (cents - lo) * 20 // (hi - lo + 1) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(cents) AS min_c, max(cents) AS max_c
        |FROM r, b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q84_listagg" ->
      """SELECT o_orderpriority,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        |  CAST(count(*) AS BIGINT) AS n_statuses
        |FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The 4-step mask-shift Morton spread, unrolled as chained CTEs —
    // same closed form the engine evaluates, in plain bigint bit ops.
    "q81_zorder" ->
      """WITH a AS (SELECT o_orderkey,
        |    o_orderkey % 65536 AS x, o_custkey % 65536 AS y FROM orders),
        |b AS (SELECT o_orderkey, (x | (x << 8)) & 16711935 AS x,
        |             (y | (y << 8)) & 16711935 AS y FROM a),
        |c AS (SELECT o_orderkey, (x | (x << 4)) & 252645135 AS x,
        |             (y | (y << 4)) & 252645135 AS y FROM b),
        |d AS (SELECT o_orderkey, (x | (x << 2)) & 858993459 AS x,
        |             (y | (y << 2)) & 858993459 AS y FROM c),
        |e AS (SELECT o_orderkey, (x | (x << 1)) & 1431655765 AS x,
        |             (y | (y << 1)) & 1431655765 AS y FROM d)
        |SELECT o_orderkey, CAST(x | (y << 1) AS BIGINT) AS zval
        |FROM e ORDER BY o_orderkey""".stripMargin,
    "q301_price_index" -> """
      |WITH li AS (
      |  SELECT l_partkey AS i,
      |    CAST(year(CAST(o_orderdate AS DATE)) * 12
      |      + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
      |    CAST(round(l_extendedprice * 100) AS BIGINT)
      |      // CAST(l_quantity AS BIGINT) AS up,
      |    CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
      |per AS (SELECT i, t, CAST(min(up) AS BIGINT) AS p,
      |          CAST(sum(q) AS BIGINT) AS q
      |        FROM li GROUP BY 1, 2),
      |base AS (
      |  SELECT i, p AS p0, q AS q0 FROM per
      |  QUALIFY row_number() OVER (PARTITION BY i ORDER BY t) = 1),
      |j AS (SELECT per.t, per.p, base.p0, base.q0
      |      FROM per JOIN base ON base.i = per.i)
      |SELECT t AS mon, CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(p AS HUGEINT) * q0) AS BIGINT) AS basket_t_c,
      |  CAST(sum(CAST(p0 AS HUGEINT) * q0) AS BIGINT) AS basket_0_c,
      |  CAST(sum(CAST(p AS HUGEINT) * q0) * 10000
      |    // NULLIF(sum(CAST(p0 AS HUGEINT) * q0), 0) AS BIGINT)
      |    AS index_bp
      |FROM j GROUP BY t ORDER BY t""".stripMargin,
    "q302_eb_smoothing" -> """
      |WITH per AS (
      |  SELECT CAST(o_custkey % 1000 AS BIGINT) AS bucket,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |g AS (SELECT CAST(sum(x) * 1000000 // sum(n) AS BIGINT)
      |        AS global_ppm FROM per)
      |SELECT bucket, n, x,
      |  CAST(x * 1000000 // n AS BIGINT) AS raw_ppm, global_ppm,
      |  CAST((x * 1000000 + 200 * global_ppm) // (n + 200) AS BIGINT)
      |    AS smoothed_ppm
      |FROM per CROSS JOIN g ORDER BY bucket""".stripMargin,
    "q266_proximity_join" -> """
      |WITH p AS (
      |  SELECT c_custkey AS id,
      |    (c_custkey * 7919) % 360000000 - 180000000 AS x,
      |    (c_custkey * 104729) % 180000000 - 90000000 AS y
      |  FROM customer),
      |c AS (
      |  SELECT *,
      |    CASE WHEN x >= 0 THEN x // 500000
      |         ELSE ((x + 1) // 500000) - 1 END AS cx,
      |    CASE WHEN y >= 0 THEN y // 500000
      |         ELSE ((y + 1) // 500000) - 1 END AS cy
      |  FROM p),
      |probe AS (
      |  SELECT id AS id_a, x AS xa, y AS ya,
      |    cx + dx.range AS cx, cy + dy.range AS cy
      |  FROM c, range(-1, 2) dx, range(-1, 2) dy)
      |SELECT DISTINCT id_a, c.id AS id_b,
      |  CAST((xa - x) * (xa - x) + (ya - y) * (ya - y) AS BIGINT) AS dist2
      |FROM probe JOIN c ON probe.cx = c.cx AND probe.cy = c.cy
      |WHERE id_a < c.id
      |  AND (xa - x) * (xa - x) + (ya - y) * (ya - y)
      |      <= CAST(500000 AS BIGINT) * 500000
      |ORDER BY id_a, id_b""".stripMargin,
    "q267_ntile_cume" -> """
      |WITH e AS (
      |  SELECT event_id, CAST(user_id % 4 AS BIGINT) AS cohort,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE value IS NOT NULL)
      |SELECT event_id, cohort, cents,
      |  CAST(ntile(10) OVER (PARTITION BY cohort
      |    ORDER BY cents, event_id) AS BIGINT) AS decile,
      |  CAST(count(*) OVER (PARTITION BY cohort ORDER BY cents
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cume_num,
      |  CAST(count(*) OVER (PARTITION BY cohort) AS BIGINT) AS cume_den
      |FROM e ORDER BY event_id""".stripMargin,
    "q269_column_diff" -> """
      |WITH a AS (
      |  SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    o_orderstatus AS status, o_orderpriority AS prio
      |  FROM orders),
      |b AS (
      |  SELECT k,
      |    cents + CASE WHEN k % 13 = 0 THEN 100 ELSE 0 END AS cents,
      |    CASE WHEN k % 11 = 0 THEN 'X' ELSE status END AS status, prio
      |  FROM a WHERE k % 17 <> 0
      |  UNION ALL
      |  SELECT k + 2000000000, cents, status, prio FROM a
      |  WHERE k % 19 = 0),
      |j AS (SELECT a.k AS ak, b.k AS bk,
      |        a.cents AS ac, b.cents AS bc,
      |        a.status AS ast, b.status AS bst,
      |        a.prio AS ap, b.prio AS bp
      |      FROM a FULL JOIN b ON a.k = b.k),
      |agg AS (
      |  SELECT
      |    count(*) FILTER (WHERE ak IS NULL) AS added,
      |    count(*) FILTER (WHERE bk IS NULL) AS removed,
      |    count(*) FILTER (WHERE ak IS NOT NULL AND bk IS NOT NULL
      |      AND ac IS DISTINCT FROM bc) AS changed_cents,
      |    count(*) FILTER (WHERE ak IS NOT NULL AND bk IS NOT NULL
      |      AND ast IS DISTINCT FROM bst) AS changed_status,
      |    count(*) FILTER (WHERE ak IS NOT NULL AND bk IS NOT NULL
      |      AND ap IS DISTINCT FROM bp) AS changed_prio
      |  FROM j)
      |SELECT metric, CAST(n AS BIGINT) AS n FROM (
      |  SELECT 'added' AS metric, added AS n FROM agg
      |  UNION ALL SELECT 'removed', removed FROM agg
      |  UNION ALL SELECT 'changed_cents', changed_cents FROM agg
      |  UNION ALL SELECT 'changed_status', changed_status FROM agg
      |  UNION ALL SELECT 'changed_prio', changed_prio FROM agg)
      |ORDER BY metric""".stripMargin,
    // the Hilbert walk re-derived as a recursive CTE: one rotate-and-
    // accumulate step per recursion level (s halves each round, 8 rounds
    // for order 8), exactly the loop in graft.plans.Hilbert.xy2d
    "q251_hilbert" -> """
      |WITH RECURSIVE h AS (
      |  SELECT o_orderkey,
      |    CAST(o_orderkey % 256 AS BIGINT) AS x,
      |    CAST(o_custkey % 256 AS BIGINT) AS y,
      |    CAST(0 AS BIGINT) AS d, CAST(128 AS BIGINT) AS s
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey,
      |    CASE WHEN ry = 0 THEN yy ELSE xx END AS x,
      |    CASE WHEN ry = 0 THEN xx ELSE yy END AS y,
      |    d2 AS d, s // 2 AS s
      |  FROM (
      |    SELECT o_orderkey,
      |      CASE WHEN ry = 0 AND rx = 1 THEN s - 1 - x ELSE x END AS xx,
      |      CASE WHEN ry = 0 AND rx = 1 THEN s - 1 - y ELSE y END AS yy,
      |      d + s * s * xor(3 * rx, ry) AS d2, rx, ry, s
      |    FROM (
      |      SELECT o_orderkey, x, y, d, s,
      |        CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END AS rx,
      |        CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END AS ry
      |      FROM h WHERE s > 0) t1) t2)
      |SELECT o_orderkey, d AS hval FROM h WHERE s = 0
      |ORDER BY o_orderkey""".stripMargin,
    "q82_iqr_outliers" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(round(o_totalprice*1e2) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice*1e2) AS BIGINT)) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders),
        |f AS (SELECT o_orderpriority,
        |        CAST(sum(CASE WHEN rn = (n+3)//4 THEN cents END) AS BIGINT) AS p25,
        |        CAST(sum(CASE WHEN rn = (3*n+3)//4 THEN cents END) AS BIGINT) AS p75
        |      FROM r GROUP BY 1)
        |SELECT r.o_orderkey, r.o_orderpriority, r.cents
        |FROM r JOIN f USING (o_orderpriority)
        |WHERE 2*r.cents < 2*f.p25 - (f.p75 - f.p25)
        |   OR 2*r.cents > 2*f.p75 + (f.p75 - f.p25)
        |ORDER BY r.o_orderkey""".stripMargin,
    "q78_percentiles" ->
      """WITH r AS (
        |  SELECT o_orderpriority, CAST(round(o_totalprice*1e2) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice*1e2) AS BIGINT)) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, max(n) AS n,
        |  CAST(sum(CASE WHEN rn = (n+3)//4 THEN cents END) AS BIGINT) AS p25,
        |  CAST(sum(CASE WHEN rn = (n+1)//2 THEN cents END) AS BIGINT) AS p50,
        |  CAST(sum(CASE WHEN rn = (3*n+3)//4 THEN cents END) AS BIGINT) AS p75
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q38_exact_median" ->
      """WITH r AS (
        |  SELECT o_orderpriority, CAST(round(o_totalprice*1e2) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice*1e2) AS BIGINT), o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
        |  FROM orders)
        |SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN rn = (cnt+1)//2 THEN cents END)
        |    + sum(CASE WHEN rn = cnt//2 + 1 THEN cents END) AS BIGINT) AS median2_cents,
        |  max(cnt) AS n
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q37_range_window" ->
      """SELECT event_id, user_id, count(*) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events ORDER BY event_id""".stripMargin,
    "q36_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*1e2) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q18_time_window" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n,
        |  sum(CAST(round(value*1e2) AS BIGINT))/1e2 AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q56_topk_rows_agg" ->
      """SELECT o_custkey, rk, o_orderkey, cents FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice*1e2) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(round(o_totalprice*1e2) AS BIGINT) DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q57_salted_count" ->
      """SELECT event_type AS key, CAST(count(*) AS BIGINT) AS count
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q58_salted_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(value*1e2) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q60_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q61_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "q62_lag_lead" ->
      """SELECT user_id, event_id, cents,
        |  lag(cents, 1) OVER w AS prev_cents,
        |  lead(cents, 1) OVER w AS next_cents,
        |  cents - coalesce(lag(cents, 1) OVER w, 0) AS delta_cents
        |FROM (SELECT user_id, event_id, ts,
        |        CAST(round(value*1e2) AS BIGINT) AS cents FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q63_cube" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*1e2) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q68_rank_family" ->
      """SELECT o_orderpriority, o_orderkey, cents,
        |  rank() OVER wc AS rk,
        |  dense_rank() OVER wc AS drk,
        |  percent_rank() OVER wc AS prk,
        |  ntile(4) OVER wu AS quartile,
        |  cume_dist() OVER wu AS cd
        |FROM (SELECT o_orderpriority, o_orderkey,
        |        CAST(round(o_totalprice*1e2) AS BIGINT) AS cents FROM orders)
        |WINDOW wc AS (PARTITION BY o_orderpriority ORDER BY cents),
        |       wu AS (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey)
        |ORDER BY o_orderpriority, cents, o_orderkey""".stripMargin,
    "q69_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*1e2) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q70_set_ops" ->
      """SELECT 'click_only' AS tag, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT 'click_and_buy' AS tag, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY tag, user_id""".stripMargin,
    "q71_datetime" ->
      """SELECT event_id,
        |  year(ts) AS y, quarter(ts) AS q, month(ts) AS m,
        |  day(ts) AS d, hour(ts) AS h, minute(ts) AS mi,
        |  dayofweek(ts) + 1 AS dow1,
        |  week(ts) AS iso_week,
        |  dayofyear(ts) AS doy,
        |  last_day(CAST(ts AS DATE)) AS month_end,
        |  CAST(date_trunc('week', ts) AS DATE) AS week_start
        |FROM events ORDER BY event_id""".stripMargin)
}
