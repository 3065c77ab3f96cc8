package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.{Analytics, Dedupe, GenericAdapter, Quality, Sinks, Sources}
import graft.queries.SortBarrier._

/** Oracle rows for the small reporting aggregates that previously had only
  * ScalaTest pins (SURVEY.md §2.9 A2/A5/A12/A15, §2.10 J4/J5, §2.4 T7):
  * each query runs the REAL operator over rows synthesized deterministically
  * from the TPC-H-ish tables and the oracle recomputes the expectation
  * analytically in SQL.
  */
object Reports {

  /** A2 — per-retailer counts (dedupe.ts:59-76) through
    * `Dedupe.countByRetailer`. */
  def q45CountByRetailer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shops = array(lit("AH"), lit("JUMBO"), lit("ALDI"), lit("PLUS"))
    val df = Tables.orders(spark, dir)
      .select(element_at(shops, ($"o_orderkey" % 4).cast("int") + 1).as("shop_type"))
    Dedupe.countByRetailer(df).orderBy($"shop_type")
  }

  /** A12 — schema-version stats with the CurrentSchemaVersion default
    * (postgres-adapter.ts:1004-1023) through `Sinks.schemaVersionStats`. */
  def q46SchemaVersionStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shops = array(lit("AH"), lit("JUMBO"), lit("ALDI"), lit("PLUS"))
    val df = Tables.orders(spark, dir).select(
      element_at(shops, ($"o_orderkey" % 4).cast("int") + 1).as("shop_type"),
      when($"o_orderkey" % 3 === 1, lit("0.9.0"))
        .otherwise(lit(null).cast("string")).as("schema_version"))
    Sinks.schemaVersionStats(df)
  }

  /** A15 — issue statistics by (type, severity, shop) with the top-k sort
    * (issue-tracker.ts:203+) through `Analytics.issueStats`. topK=60 exceeds
    * the 40 synthesized groups so the limit never cuts inside a count tie
    * (the cross-engine compare needs a deterministic row SET). */
  def q47IssueStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shops = array(lit("AH"), lit("JUMBO"), lit("ALDI"), lit("PLUS"))
    val issues = Tables.orders(spark, dir).select(
      concat(lit("T"), ($"o_orderkey" % 5).cast("int")).as("issue_type"),
      when($"o_orderkey" % 3 === 0, lit("error")).otherwise(lit("warning"))
        .as("severity"),
      element_at(shops, ($"o_orderkey" % 4).cast("int") + 1).as("shop_type"))
    Analytics.issueStats(issues, topK = 60)
  }

  /** J4/J5/T7 — raw→processed lineage through the generic schemaless
    * adapter: raw JSONB-shaped rows run `GenericAdapter.unified` (T7), the
    * per-shop external-id cascade recovers the scraper id (J5), and the
    * deterministic unified_id carries the raw row key through the pipeline
    * (J4) so processed rows join back to their raw origin. Also pins the
    * JSON-falsy `is_promotion` semantics ("false"/"0"/absent vs any other
    * string). */
  def q48GenericLineage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = (($"o_orderkey" % 19) + 1) * 20
    // k=3 leaves the field absent; "false"/"0" are JSON-falsy, "yes" truthy
    val promoLit = when($"o_orderkey" % 4 === 0, lit("\"false\""))
      .when($"o_orderkey" % 4 === 1, lit("\"0\""))
      .when($"o_orderkey" % 4 === 2, lit("\"yes\""))
    val raw = graft.etl.Parallelism.spread(Tables.orders(spark, dir)).select(
      concat(lit("R"), $"o_orderkey".cast("string")).as("id"),
      concat(
        lit("{\"name\":\"Gen "), $"o_orderkey".cast("string"), lit("\""),
        lit(",\"price\":\""),
        ShopQueries.dec(cents),
        lit("\",\"articleNumber\":\"X"), $"o_orderkey".cast("string"), lit("\""),
        lit(",\"category\":\"cat"), ($"o_orderkey" % 3).cast("string"), lit("\""),
        when(promoLit.isNotNull, concat(lit(",\"is_promotion\":"), promoLit))
          .otherwise(lit("")),
        lit("}")).as("raw_data"))
    val unified = GenericAdapter.unified(raw, "ALDI", "r1")
    // ONE named parse for the whole cascade (see externalId's scaladoc:
    // the inline spelling cloned a schema-pruned from_json per candidate
    // and nullif doubled each — ~5 document scans per row here)
    val lineage = raw
      .withColumn("unified_id", concat_ws("_", lit("ALDI"), $"id", lit("r1")))
      .withColumn("_pl", GenericAdapter.parsedRaw($"raw_data"))
      .select($"unified_id",
        GenericAdapter.externalId("aldi", $"_pl").as("external_id"))
    unified.join(lineage, Seq("unified_id")).select(
      $"unified_id", $"external_id", $"title", $"main_category", $"brand",
      $"quantity_amount",
      round($"current_price" * 100).cast("long").as("cp_cents"),
      $"is_promotion", $"promotion_type", $"is_active")
      .sortedOnce($"unified_id")
  }

  /** Schema-on-read field profile ([[graft.etl.Sources.jsonFieldProfile]])
    * over a q48-style raw feed with 1-in-11 malformed rows and an
    * optional field: key coverage in bp over PARSEABLE docs plus the
    * malformed count — the first report run on a new scraper feed. The
    * oracle derives every count arithmetically, so it genuinely gates the
    * engine's key extraction and malformed handling. */
  def q374JsonProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = $"o_orderkey"
    val promo = when(k % 4 === 0, lit("\"false\""))
      .when(k % 4 === 1, lit("\"0\""))
      .when(k % 4 === 2, lit("\"yes\""))
    val raw = Tables.orders(spark, dir).select(
      when(k % 11 === 0, lit("{not json"))
        .otherwise(concat(
          lit("{\"name\":\"Gen "), k.cast("string"),
          lit("\",\"price\":\"1.00\",\"articleNumber\":\"X"),
          k.cast("string"), lit("\",\"category\":\"c\""),
          when(promo.isNotNull, concat(lit(",\"is_promotion\":"), promo))
            .otherwise(lit("")),
          lit("}"))).as("raw_data"))
    Sources.jsonFieldProfile(raw, "raw_data").orderBy($"key")
  }

  /** A5 — the quality report histogram (product-quality-service.ts:163-278)
    * through `Quality.report` on the q23 fixture. The 2dp-rounded avg_score
    * is excluded from the cross-engine compare (a decimal-representation
    * rounding tie between BigDecimal and DuckDB repr-rounding is possible
    * for an arbitrary sum/count quotient); it is pinned exactly by
    * HelpersSpec instead. */
  def q49QualityReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Quality.report(Domain.qualityFixture(spark, dir)).select(
      $"n_products", $"b_90_100", $"b_80_89", $"b_70_79", $"b_60_69",
      $"b_50_59", $"b_lt_50")
  }

  /** Column-level data profile ([[graft.etl.Analytics.columnProfile]]):
    * null/exact-distinct counts per column of `orders` — the trust-a-new-
    * source report, one aggregation pass for all columns. */
  def q83ColumnProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Analytics.columnProfile(
        graft.Tables.orders(spark, dir),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"))
      .orderBy($"col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_column_profile" -> q83ColumnProfile _,
    "q45_count_by_retailer" -> q45CountByRetailer _,
    "q46_schema_version_stats" -> q46SchemaVersionStats _,
    "q47_issue_stats" -> q47IssueStats _,
    "q48_generic_lineage" -> q48GenericLineage _,
    "q374_json_profile" -> q374JsonProfile _,
    "q49_quality_report" -> q49QualityReport _)

  val oracleSql: Map[String, String] = Map(
    "q83_column_profile" -> """
      |SELECT 'o_orderkey' AS col_name,
      |  CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_null,
      |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct FROM orders
      |UNION ALL SELECT 'o_custkey',
      |  CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT),
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
      |UNION ALL SELECT 'o_orderstatus',
      |  CAST(count(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT),
      |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
      |UNION ALL SELECT 'o_totalprice',
      |  CAST(count(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT),
      |  CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders
      |UNION ALL SELECT 'o_orderdate',
      |  CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT),
      |  CAST(count(DISTINCT o_orderdate) AS BIGINT) FROM orders
      |UNION ALL SELECT 'o_orderpriority',
      |  CAST(count(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT),
      |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders
      |ORDER BY col_name""".stripMargin,
    "q45_count_by_retailer" -> """
      |SELECT CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'AH' WHEN 1 THEN 'JUMBO'
      |         WHEN 2 THEN 'ALDI' ELSE 'PLUS' END AS shop_type,
      |  count(*) AS n_products
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q46_schema_version_stats" -> """
      |SELECT CASE WHEN o_orderkey % 3 = 1 THEN '0.9.0' ELSE '1.0.0' END
      |    AS schema_version,
      |  CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'AH' WHEN 1 THEN 'JUMBO'
      |    WHEN 2 THEN 'ALDI' ELSE 'PLUS' END AS shop_type,
      |  count(*) AS n
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q47_issue_stats" -> """
      |SELECT 'T' || CAST(o_orderkey % 5 AS INT) AS issue_type,
      |  CASE WHEN o_orderkey % 3 = 0 THEN 'error' ELSE 'warning' END AS severity,
      |  CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'AH' WHEN 1 THEN 'JUMBO'
      |    WHEN 2 THEN 'ALDI' ELSE 'PLUS' END AS shop_type,
      |  count(*) AS n
      |FROM orders GROUP BY 1, 2, 3 ORDER BY n DESC, issue_type""".stripMargin,
    "q48_generic_lineage" -> """
      |SELECT 'ALDI_R' || o_orderkey || '_r1' AS unified_id,
      |  'X' || o_orderkey AS external_id,
      |  'Gen ' || o_orderkey AS title,
      |  'cat' || CAST(o_orderkey % 3 AS INT) AS main_category,
      |  'Unknown' AS brand,
      |  CAST(1 AS DOUBLE) AS quantity_amount,
      |  CAST(((o_orderkey % 19) + 1) * 20 AS BIGINT) AS cp_cents,
      |  CAST(o_orderkey % 4 AS INT) = 2 AS is_promotion,
      |  'none' AS promotion_type,
      |  TRUE AS is_active
      |FROM orders ORDER BY unified_id""".stripMargin,
    "q374_json_profile" -> """
      |WITH t AS (SELECT count(*) AS n_total,
      |    sum(CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END) AS n_mal
      |  FROM orders),
      |k AS (
      |  SELECT 'name' AS key, n_total - n_mal AS np FROM t
      |  UNION ALL SELECT 'price', n_total - n_mal FROM t
      |  UNION ALL SELECT 'articleNumber', n_total - n_mal FROM t
      |  UNION ALL SELECT 'category', n_total - n_mal FROM t
      |  UNION ALL SELECT 'is_promotion',
      |    (SELECT count(*) FROM orders
      |     WHERE o_orderkey % 11 <> 0 AND o_orderkey % 4 <> 3) FROM t)
      |SELECT key, CAST(np AS BIGINT) AS n_present,
      |  CAST(n_total - n_mal AS BIGINT) AS n_docs,
      |  CAST(n_mal AS BIGINT) AS n_malformed,
      |  CAST(np * 10000 // (n_total - n_mal) AS BIGINT) AS presence_bp
      |FROM k, t ORDER BY key""".stripMargin,
    "q49_quality_report" -> """
      |WITH sc AS (
      |  SELECT least(50
      |    + CASE WHEN p_partkey % 3 = 0 THEN 10 ELSE 0 END
      |    + CASE WHEN p_partkey % 5 = 0 THEN 5 ELSE 0 END
      |    + CASE WHEN p_partkey % 2 = 0 THEN 5 ELSE 0 END
      |    + CASE WHEN p_partkey % 7 = 0 THEN 10 ELSE 0 END
      |    + CASE WHEN p_partkey % 2 = 0 THEN 5 ELSE 0 END
      |    + CASE WHEN p_partkey % 11 <> 0 THEN 10 ELSE 0 END
      |    + CASE WHEN p_partkey % 13 <> 0 THEN 5 ELSE 0 END, 100) AS s
      |  FROM part)
      |SELECT count(*) AS n_products,
      |  count(*) FILTER (WHERE s >= 90) AS b_90_100,
      |  count(*) FILTER (WHERE s >= 80 AND s < 90) AS b_80_89,
      |  count(*) FILTER (WHERE s >= 70 AND s < 80) AS b_70_79,
      |  count(*) FILTER (WHERE s >= 60 AND s < 70) AS b_60_69,
      |  count(*) FILTER (WHERE s >= 50 AND s < 60) AS b_50_59,
      |  count(*) FILTER (WHERE s < 50) AS b_lt_50
      |FROM sc""".stripMargin)
}
