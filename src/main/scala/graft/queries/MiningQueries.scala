package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.{Mining, Series, Sketches}

/** Round-4 additions: Bloom-pruned exact semi-join, single-pass grouped
  * regression, Gini impurity, set-overlap Jaccard, ranking quality (MRR),
  * and k-means assignment on quantized embeddings.
  *
  * Same exactness contract as [[Curation]]: sketches and hashes only
  * produce CANDIDATES (the Bloom filter prunes, the exact join decides);
  * emitted numbers are integer counts or cross-multiplied scaled ratios
  * the DuckDB oracle re-derives bit-for-bit.
  */
object MiningQueries {

  // ------------------------------------------------ q124 bloom semi-join

  /** Lineitems of URGENT orders via [[Sketches.bloomSemiJoin]]: the Bloom
    * bitmap (2¹⁷ bits built distributed, fetched bounded) prunes the fact
    * side map-side before the exact semi-join; result is bit-identical to
    * the plain semi-join the oracle runs. */
  def q124BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT")
    Sketches.bloomSemiJoin(Tables.lineitem(spark, dir), dim,
        "l_orderkey", "o_orderkey", mBits = 1 << 17, kHashes = 4)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty_cents"))
      .orderBy($"l_returnflag")
  }

  // ------------------------------------------------ q125 grouped slope

  /** Per-event-type OLS slope of value-cents over day index
    * ([[Mining.groupedSlope]]): one pass, five sufficient statistics,
    * decimal(38,0) sums, scaled-integer quotient. */
  def q125GroupedSlope(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_type",
      datediff(to_date($"ts"), to_date(lit("1970-01-01"))).as("x"),
      Series.cents($"value").as("y"))
    Mining.groupedSlope(e, "event_type", "x", "y", scale = 10000)
      .orderBy($"event_type")
  }

  // ------------------------------------------------------- q126 gini

  /** Gini impurity of each brand's part-type mix ([[Mining.giniImpurity]]):
    * two combiner-friendly shuffles, decimal squares. */
  def q126Gini(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.giniImpurity(Tables.part(spark, dir), "p_brand", "p_type",
        scale = 10000)
      .orderBy($"p_brand")
  }

  // ------------------------------------------- q127 set jaccard

  /** Pairwise Jaccard between event-type user populations
    * ([[Mining.groupSetJaccard]]) — element-key self-join, fan-out bounded
    * by the enum-sized group domain squared. */
  def q127SetJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.groupSetJaccard(Tables.events(spark, dir), "event_type", "user_id")
      .orderBy($"g_a", $"g_b")
  }

  // ------------------------------------------------------- q128 mrr

  /** Reciprocal rank of the first relevant customer per market segment
    * ([[Mining.firstRelevantRank]]): rank by (acctbal DESC, custkey),
    * relevance = custkey divisible by 13 — a deterministic stand-in for a
    * relevance label. */
  def q128Mrr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.firstRelevantRank(Tables.customer(spark, dir), "c_mktsegment",
        Seq($"c_acctbal".desc, $"c_custkey".asc), $"c_custkey" % 13 === 0)
      .orderBy($"c_mktsegment")
  }

  // ---------------------------------------------------- q129 kmeans

  /** K-means assignment (k=8, lowest-id seeding) on scale-1000 quantized
    * embeddings ([[Mining.kmeansAssign]]): broadcast centroids, integer
    * distances, argmin via min(struct) — the oracle re-derives it with a
    * QUALIFY window, a genuinely different formulation. */
  def q129Kmeans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.kmeansAssign(Tables.embeddings(spark, dir), "vec_id", "embedding",
        k = 8)
      .orderBy($"vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q124_bloom_join" -> q124BloomJoin _,
    "q125_grouped_slope" -> q125GroupedSlope _,
    "q126_gini" -> q126Gini _,
    "q127_set_jaccard" -> q127SetJaccard _,
    "q128_mrr" -> q128Mrr _,
    "q129_kmeans" -> q129Kmeans _)

  val oracleSql: Map[String, String] = Map(
    "q124_bloom_join" -> """
      |SELECT l_returnflag, count(*) AS n_items,
      |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
      |         AS qty_cents
      |FROM lineitem l
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_orderkey = l.l_orderkey
      |                AND o.o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q125_grouped_slope" -> """
      |WITH b AS (SELECT event_type,
      |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
      |             CAST(round(value * 100) AS BIGINT) AS y
      |           FROM events),
      |s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |        CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |        CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |        CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |        CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      |      FROM b GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  CAST(((n * sxy - sx * sy) * 10000)
      |       // NULLIF(n * sxx - sx * sx, 0) AS BIGINT) AS slope_scaled
      |FROM s ORDER BY event_type""".stripMargin,
    "q126_gini" -> """
      |WITH c AS (SELECT p_brand, p_type, count(*) AS c
      |           FROM part GROUP BY 1, 2),
      |g AS (SELECT p_brand, CAST(sum(c) AS HUGEINT) AS n,
      |        CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss,
      |        count(*) AS n_cats
      |      FROM c GROUP BY 1)
      |SELECT p_brand, CAST(n AS BIGINT) AS n,
      |       CAST(n_cats AS BIGINT) AS n_cats,
      |       CAST(((n * n - ss) * 10000) // (n * n) AS BIGINT) AS gini_scaled
      |FROM g ORDER BY p_brand""".stripMargin,
    "q127_set_jaccard" -> """
      |WITH d AS (SELECT DISTINCT event_type AS g, user_id AS e FROM events),
      |sz AS (SELECT g, count(*) AS sz FROM d GROUP BY 1),
      |i AS (SELECT a.g AS g_a, b.g AS g_b, count(*) AS inter
      |      FROM d a JOIN d b ON a.e = b.e AND a.g < b.g GROUP BY 1, 2)
      |SELECT i.g_a, i.g_b, CAST(i.inter AS BIGINT) AS inter,
      |  CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS union_size,
      |  CAST((i.inter * 10000) // (sa.sz + sb.sz - i.inter) AS BIGINT)
      |    AS jaccard_bp
      |FROM i JOIN sz sa ON sa.g = i.g_a JOIN sz sb ON sb.g = i.g_b
      |ORDER BY g_a, g_b""".stripMargin,
    "q128_mrr" -> """
      |WITH r AS (SELECT c_mktsegment, c_custkey,
      |             row_number() OVER (PARTITION BY c_mktsegment
      |               ORDER BY c_acctbal DESC, c_custkey) AS rk
      |           FROM customer)
      |SELECT c_mktsegment,
      |  CAST(min(CASE WHEN c_custkey % 13 = 0 THEN rk END) AS BIGINT)
      |    AS first_rank,
      |  CAST(sum(CASE WHEN c_custkey % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_relevant,
      |  CAST(1000000 // min(CASE WHEN c_custkey % 13 = 0 THEN rk END)
      |    AS BIGINT) AS rr_scaled
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q129_kmeans" -> """
      |WITH q AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
      |               AS qv
      |           FROM embeddings),
      |c AS (SELECT vec_id AS cid, qv AS cv FROM q ORDER BY vec_id LIMIT 8),
      |s AS (SELECT q.vec_id, c.cid,
      |        CAST(list_sum(list_transform(list_zip(q.qv, c.cv),
      |          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist2
      |      FROM q CROSS JOIN c)
      |SELECT vec_id, cid AS cluster, dist2 FROM s
      |QUALIFY row_number() OVER (PARTITION BY vec_id
      |  ORDER BY dist2, cid) = 1
      |ORDER BY vec_id""".stripMargin)
}
