package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Strings

/** Coverage for the smaller helpers: F5 incomplete filter, A2 retailer
  * counts, K4/A13 error sink + report, A7 distribution, A15 issue stats,
  * X3/X6 string scalars. */
class HelpersSpec extends SparkSpec {

  test("filterIncomplete keeps only rows with id/shop/title/price (F5)") {
    import spark.implicits._
    val df = Seq(
      ("1", "AH", "Melk", Some(1.0)),
      ("", "AH", "X", Some(1.0)),
      ("3", "", "X", Some(1.0)),
      ("4", "AH", "", Some(1.0)),
      ("5", "AH", "X", None))
      .toDF("unified_id", "shop_type", "title", "current_price")
    assert(Dedupe.filterIncomplete(df).collect().map(_.getString(0)).toSeq == Seq("1"))
  }

  test("countByRetailer (A2) and categoryDistribution (A7)") {
    import spark.implicits._
    val df = Seq(("AH", "Bakkerij"), ("AH", "Bakkerij"), ("JUMBO", "Diepvries"))
      .toDF("shop_type", "main_category")
    val counts = Dedupe.countByRetailer(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("AH" -> 2L, "JUMBO" -> 1L))
    val dist = Analytics.categoryDistribution(df).collect()
    assert(dist.head.getAs[String]("main_category") == "Bakkerij")
    assert(dist.head.getAs[Double]("pct") == 66.67)
  }

  test("errorRows + errorReport (K4/A13)") {
    import spark.implicits._
    val df = Seq(("1", 0.0), ("2", 2.0), ("3", -1.0))
      .toDF("unified_id", "price_before_bonus")
    val errs = Sinks.errorRows(df, col("price_before_bonus") <= 0,
      "INVALID_PRICE", "error", "job-9")
    assert(errs.count() == 2)
    val report = Sinks.errorReport(errs).collect().head
    assert(report.getAs[String]("error_type") == "INVALID_PRICE")
    assert(report.getAs[Long]("n") == 2)
    assert(report.getAs[scala.collection.Seq[String]]("examples").sorted == Seq("1", "3"))
  }

  test("issueStats top-k ordering (A15)") {
    import spark.implicits._
    val issues = (Seq.fill(5)(("QUANTITY_PARSE_FALLBACK", "warning", "AH")) ++
      Seq.fill(2)(("PROMOTION_UNKNOWN", "info", "JUMBO")))
      .toDF("issue_type", "severity", "shop_type")
    val top = Analytics.issueStats(issues, topK = 1).collect()
    assert(top.length == 1)
    assert(top.head.getAs[String]("issue_type") == "QUANTITY_PARSE_FALLBACK")
    assert(top.head.getAs[Long]("n") == 5)
  }

  test("approxProfile: sketches land within tolerance of the exact answers") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val prof = Analytics.approxProfile(ev, "event_type", "user_id", "value")
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d"),
        expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("d"), r.getAs[Double]("p50"))).toMap
    assert(prof.keySet == exact.keySet)
    exact.foreach { case (k, (d, p50)) =>
      val approxD = prof(k).getAs[Long]("approx_distinct")
      assert(math.abs(approxD - d) <= math.max(1, d * 0.15),
        s"$k: approx distinct $approxD vs exact $d")
      val approxP = prof(k).getAs[Double]("p50")
      // approx_percentile returns an actually-occurring value near the rank
      assert(math.abs(approxP - p50) <= math.max(0.5, p50 * 0.1),
        s"$k: approx p50 $approxP vs exact $p50")
    }
  }

  test("string scalars (X3/X6)") {
    assert(Strings.extractNumbers("2 voor 3.50 en -1") == Seq(2.0, 3.50, -1.0))
    assert(Strings.parsePrice("€ 1,49") == 1.49)
    assert(Strings.parsePrice("garbage") == 0.0)
    // reference quirk: 'ca. 250g' strips to '.250' → parseFloat → 0.25
    assert(Strings.parseNumber("ca. 250g") == 0.25)
    assert(Strings.parseNumber("250g") == 250.0)
    assert(Strings.camelToSnake("priceBeforeBonus") == "price_before_bonus")
    assert(Strings.snakeToCamel("price_before_bonus") == "priceBeforeBonus")
    assert(Strings.similarity("melk", "melk") == 1.0)
    assert(Strings.normalizeString("  AH! Basic-Melk  2x ") == "ah basic melk 2x")
  }

  test("quality report avg + histogram (A5) — exact values") {
    import spark.implicits._
    // row 1 scores 100 (every factor), row 2 scores 50 (none)
    val df = Seq(
      ("i.jpg", Some("Bakkerij"), "AH", true, "2 voor 3.00", true, 1.0, "g", Some(0.5)),
      ("", None, "", false, "", false, 0.0, "", None))
      .toDF("image_url", "main_category", "brand", "is_promotion",
        "promotion_mechanism", "is_active", "quantity_amount", "quantity_unit",
        "conversion_factor")
    val r = Quality.report(df).collect().head
    assert(r.getAs[Double]("avg_score") == 75.0)
    assert(r.getAs[Long]("n_products") == 2)
    assert(r.getAs[Long]("b_90_100") == 1)
    assert(r.getAs[Long]("b_50_59") == 1)
    assert(r.getAs[Long]("b_lt_50") == 0)
  }

  test("schemaVersionStats defaults the version (A12)") {
    import spark.implicits._
    val df = Seq(("AH", None: Option[String]), ("AH", Some("0.9.0")))
      .toDF("shop_type", "schema_version")
    val stats = Sinks.schemaVersionStats(df).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(stats == Set(("0.9.0", "AH"), ("1.0.0", "AH")))
  }

  test("exactPercentiles matches the nearest-rank model on random groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // group sizes 1..40 exercise every n%4 branch of the rank arithmetic
    val data = (1 to 8).flatMap { g =>
      (1 to (g * 5)).map(_ => (s"g$g", rnd.nextInt(1000).toLong))
    }
    val out = Analytics.exactPercentiles(
        data.toDF("grp", "v"), "grp", "v")
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("p25"), r.getAs[Long]("p50"),
          r.getAs[Long]("p75")))).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      def nr(p: Double) = sorted(math.ceil(p * n).toInt - 1)
      assert(out(g) == ((n.toLong, nr(0.25), nr(0.5), nr(0.75))), s"group $g")
    }
  }

  test("int8QuantStats: hand-checked vectors, zero vector quantizes to zeros") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f)),   // scale 127 → [127, -127, 63]
      (2L, Seq(0.0f, 0.0f)),          // zero vector → all zeros
      (3L, Seq(-2.0f)))               // scale 63.5 → floor(-127.0) = -127
      .toDF("vec_id", "embedding")
    val out = Similarity.int8QuantStats(df, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_dims"), r.getAs[Long]("sum_q"),
          r.getAs[Long]("min_q"), r.getAs[Long]("max_q"),
          r.getAs[Long]("n_sat")))).toMap
    assert(out(1L) == ((3L, 63L, -127L, 127L, 2L)))
    assert(out(2L) == ((2L, 0L, 0L, 0L, 0L)))
    assert(out(3L) == ((1L, -127L, -127L, -127L, 1L)))
  }

  test("columnProfile: null and distinct counts, nulls not distinct-counted") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None),
      (Some(2L), Some("b")), (None, Some("a")))
      .toDF("k", "s")
    val out = Analytics.columnProfile(df, Seq("k", "s"))
      .collect().map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct")))).toMap
    assert(out == Map("k" -> ((1L, 2L)), "s" -> ((1L, 2L))))
  }

  test("redactPii: counts and replacements, word boundaries respected") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a@b.nl and c.d+e@f-g.com now"),
      (2L, "call 06-12345678 or 06-87654321"),
      (3L, "not-a-phone 906-12345678 and 06-1234567 (7 digits)"),
      (4L, "plain text, no pii")).toDF("id", "text")
    val out = Privacy.redactPii(df, "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[String]("redacted")))).toMap
    assert(out(1L) == ((2L, 0L, "mail <EMAIL> and <EMAIL> now")))
    assert(out(2L) == ((0L, 2L, "call <PHONE> or <PHONE>")))
    // "906-12345678": no word boundary between "9" and "06" → no match;
    // 7-digit tail → no match
    assert(out(3L) == ((0L, 0L, "not-a-phone 906-12345678 and 06-1234567 (7 digits)")))
    assert(out(4L) == ((0L, 0L, "plain text, no pii")))
  }

  test("luhnAudit: checksum separates card numbers from plain digit runs") {
    import spark.implicits._
    // 4539148803436467 is Luhn-valid; flipping the check digit breaks it;
    // 12345 is too short to be a candidate; a 20-digit run is too long
    val df = Seq(
      (1L, "pay 4539148803436467 now"),
      (2L, "ref 4539148803436468 and 12345"),
      (3L, "long 12345678901234567890 run"),
      (4L, "two 4539148803436467 4539148803436467")).toDF("id", "text")
    val out = Privacy.luhnAudit(df, "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_luhn_valid"),
          r.getAs[Long]("has_pii")))).toMap
    assert(out == Map(
      1L -> ((1L, 1L, 1L)), 2L -> ((1L, 0L, 0L)),
      3L -> ((0L, 0L, 0L)), 4L -> ((2L, 2L, 1L))))
  }
}
