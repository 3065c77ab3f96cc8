package graft.etl

import java.time.{DayOfWeek, LocalDate}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.RawSchemas

/** Per-shop raw→unified adapters (SURVEY.md §2.3 F1–F4, §2.4 T1–T4, §2.6 U5–U6).
  *
  * Each adapter exposes `schema` (for `spark.read.schema(...).json`),
  * `skip` (the shop's skip rules as one pushdown-friendly predicate over the
  * raw columns — filter BEFORE transform, like base.ts:341-357), and
  * `transform` (raw columns → the 32 unified columns). Everything is column
  * expressions inside whole-stage codegen except the three UDF islands
  * (promo parse, unit normalize, AH structured discount).
  *
  * Scale note: these are pure per-row map/filter stages — no shuffle, no
  * driver state; they run at scan parallelism on any cluster size.
  */
object Shops {

  /** JS `a || b` for string columns: empty string falls through. */
  private def orElse(cols: Column*): Column =
    coalesce(cols.map(c => nullif(c, lit(""))): _*)

  /** U5 shared quantity regex: first `(\d+[.,]?\d*)\s*(\w+)` match. */
  private val qtyRe = "(\\d+(?:[.,]\\d+)?)\\s*(\\w+)"

  private def qtyAmount(src: Column): Column = {
    val raw = regexp_extract(src, qtyRe, 1)
    when(raw =!= "", regexp_replace(raw, ",", ".").cast("double")).otherwise(lit(1.0))
  }
  private def qtyUnit(src: Column): Column = {
    val raw = regexp_extract(src, qtyRe, 2)
    when(raw =!= "", Udfs.normalizeUnit(raw)).otherwise(lit("stuk"))
  }

  /** Template finalization (T6, unified-product-template.ts:161-231): JS
    * `||` defaults per field group; fixes column order to the 32-field
    * contract. Input must already contain all 32 columns. */
  def finalizeTemplate(df: DataFrame): DataFrame = {
    def s(n: String) = coalesce(col(n), lit("")).as(n) // string || ''
    df.select(
      s("unified_id"), s("shop_type"), s("title"),
      nullif(coalesce(col("main_category"), lit("")), lit("")).as("main_category"),
      s("brand"), s("image_url"), s("sales_unit_size"),
      coalesce(col("quantity_amount"), lit(0.0)).as("quantity_amount"),
      s("quantity_unit"),
      col("default_quantity_amount"), col("default_quantity_unit"),
      coalesce(col("price_before_bonus"), lit(0.0)).as("price_before_bonus"),
      coalesce(col("current_price"), lit(0.0)).as("current_price"),
      col("unit_price"), col("unit_price_unit"),
      coalesce(col("is_promotion"), lit(false)).as("is_promotion"),
      coalesce(nullif(col("promotion_type"), lit("")), lit("none")).as("promotion_type"),
      coalesce(nullif(col("promotion_mechanism"), lit("")), lit("none")).as("promotion_mechanism"),
      col("promotion_start_date"), col("promotion_end_date"),
      col("parsed_promotion_effective_unit_price"),
      col("parsed_promotion_required_quantity"),
      col("parsed_promotion_total_price"),
      col("parsed_promotion_is_multi_purchase_required"),
      col("normalized_quantity_amount"), col("normalized_quantity_unit"),
      col("conversion_factor"),
      col("price_per_standard_unit"), col("current_price_per_standard_unit"),
      col("discount_absolute"), col("discount_percentage"),
      coalesce(col("is_active"), lit(true)).as("is_active"))
  }

  trait ShopAdapter {
    def shopType: String
    def schema: org.apache.spark.sql.types.StructType
    /** Rows to DROP (skip rules; count them for job stats before filtering). */
    def skip: Column
    def transform(df: DataFrame): DataFrame
    /** read → skip-filter → transform → template. */
    def unified(df: DataFrame): DataFrame = finalizeTemplate(transform(df.filter(!skip)))
  }

  /** AH — F1 (ah.ts:672-695) + T1/T8 (ah.ts:146-623). */
  object Ah extends ShopAdapter {
    val shopType = "AH"
    val schema = RawSchemas.ah

    val skip: Column =
      coalesce(col("isVirtualBundle"), lit(false)) ||
      coalesce(col("orderAvailabilityStatus"), lit("")) =!= "IN_ASSORTMENT" ||
      col("mainCategory") <=> "AH Voordeelshop" ||
      // `!priceBeforeBonus && !currentPrice`: null or 0 both falsy in JS
      (coalesce(col("priceBeforeBonus"), lit(0.0)) === 0.0 &&
        coalesce(col("currentPrice"), lit(0.0)) === 0.0)

    /** Transform-stage validation errors (thrown per-row in the reference →
      * error side-output here, ah.ts:199-262). */
    val transformError: Column = {
      val hasStructuredPricing =
        coalesce(col("isBonus"), lit(false)) &&
        exists(coalesce(col("discountLabels"), array()),
          l => l("price").isNotNull || l("percentage").isNotNull || l("amount").isNotNull)
      val promoMissingPrice =
        coalesce(col("isBonus"), lit(false)) && !hasStructuredPricing &&
          col("priceBeforeBonus").isNull
      val noValidPrice =
        !hasStructuredPricing &&
        coalesce(col("priceBeforeBonus"), lit(0.0)) <= 0 &&
        (col("currentPrice").isNull || col("currentPrice") <= 0)
      promoMissingPrice || noValidPrice
    }

    def transform(df: DataFrame): DataFrame = {
      val pbb = coalesce(col("priceBeforeBonus"), lit(0.0))
      val isPromo = coalesce(col("isBonus"), lit(false))
      val sus = coalesce(nullif(col("salesUnitSize"), lit("")), lit("per stuk"))

      // widest image (ah.ts:176-179): JS reduce keeps prev only when
      // strictly wider, so on ties the LAST max wins — exactly aggregate().
      val widest = when(size(col("images")) > 0,
        expr("aggregate(slice(images, 2, size(images)), images[0], " +
          "(acc, x) -> if(acc.width > x.width, acc, x)).url")).otherwise(lit(""))

      val mech = when(isPromo, coalesce(col("bonusMechanism"), lit(""))).otherwise(lit(""))

      df.filter(!transformError)
        .withColumn("_disc",
          Udfs.ahStructuredDiscount(coalesce(col("discountLabels"), array().cast(
            RawSchemas.ah("discountLabels").dataType)), pbb, col("currentPrice")))
        .withColumn("_cat", Udfs.normalizeCategory(
          col("title"), coalesce(col("mainCategory"), lit("")), lit(shopType)))
        .withColumn("_cp0", {
          // let currentPrice = product.currentPrice || priceBeforeBonus
          val base = when(coalesce(col("currentPrice"), lit(0.0)) =!= 0.0,
            col("currentPrice")).otherwise(pbb)
          val structured = col("_disc")("has_structured") &&
            col("_disc")("effective_price").isNotNull
          when(isPromo && structured, col("_disc")("effective_price"))
            .otherwise(base)
        })
        .withColumn("_cp", when(col("_cp0") <= 0, pbb).otherwise(col("_cp0")))
        .select(
          coalesce(col("webshopId").cast("string"), lit("unknown")).as("unified_id"),
          lit(shopType).as("shop_type"),
          col("title").as("title"),
          col("_cat")("category").as("main_category"),
          coalesce(col("brand"), lit("")).as("brand"),
          widest.as("image_url"),
          sus.as("sales_unit_size"),
          qtyAmount(sus).as("quantity_amount"),
          qtyUnit(sus).as("quantity_unit"),
          lit(1.0).as("default_quantity_amount"),
          qtyUnit(sus).as("default_quantity_unit"),
          pbb.as("price_before_bonus"),
          col("_cp").as("current_price"),
          // U6 (ah.ts:651-668): 'prijs per kg €3.98'
          when(col("unitPriceDescription").isNotNull,
            coalesce(regexp_replace(regexp_extract(col("unitPriceDescription"),
              "(?i)prijs per (\\w+) €(\\d+(?:[.,]\\d+)?)", 2), ",", ".")
              .cast("double"), lit(0.0))).as("unit_price"),
          when(col("unitPriceDescription").isNotNull,
            when(regexp_extract(col("unitPriceDescription"),
              "(?i)prijs per (\\w+) €(\\d+(?:[.,]\\d+)?)", 1) =!= "",
              Udfs.normalizeUnit(regexp_extract(col("unitPriceDescription"),
                "(?i)prijs per (\\w+) €(\\d+(?:[.,]\\d+)?)", 1)))
              .otherwise(lit(""))).as("unit_price_unit"),
          isPromo.as("is_promotion"),
          when(isPromo, coalesce(nullif(col("promotionType"), lit("")), lit("DISCOUNT")))
            .otherwise(lit("")).as("promotion_type"),
          mech.as("promotion_mechanism"),
          when(isPromo, col("bonusStartDate")).as("promotion_start_date"),
          when(isPromo, col("bonusEndDate")).as("promotion_end_date"),
          when(isPromo, col("_cp")).as("parsed_promotion_effective_unit_price"),
          col("_disc")("required_quantity").as("parsed_promotion_required_quantity"),
          col("_disc")("total_price").as("parsed_promotion_total_price"),
          coalesce(col("_disc")("is_multi_purchase_required"), lit(false))
            .as("parsed_promotion_is_multi_purchase_required"),
          qtyAmount(sus).as("normalized_quantity_amount"),
          qtyUnit(sus).as("normalized_quantity_unit"),
          lit(1.0).as("conversion_factor"),
          lit(null).cast("double").as("price_per_standard_unit"),
          lit(null).cast("double").as("current_price_per_standard_unit"),
          when(isPromo && pbb > 0 && col("_cp") < pbb, pbb - col("_cp"))
            .as("discount_absolute"),
          when(isPromo && pbb > 0 && col("_cp") < pbb,
            (pbb - col("_cp")) / pbb * 100).as("discount_percentage"),
          (col("orderAvailabilityStatus") === "IN_ASSORTMENT").as("is_active"))
    }
  }

  /** Jumbo — F2 (jumbo.ts:335-359) + T2 (jumbo.ts:117-273). Prices are cents. */
  object Jumbo extends ShopAdapter {
    val shopType = "JUMBO"
    val schema = RawSchemas.jumbo

    private val p = col("product")

    val skip: Column =
      p.isNull ||
      coalesce(trim(p("title")), lit("")) === "" ||
      coalesce(p("prices")("price"), lit(0L)) <= 0 ||
      p("inAssortment") <=> false ||
      (p("availability").isNotNull && p("availability")("isAvailable") <=> false)

    def transform(df: DataFrame): DataFrame = {
      val pbb = coalesce(p("prices")("price"), lit(0L)) / 100.0
      val mech = when(p("promotions").isNotNull && size(p("promotions")) > 0,
        array_join(flatten(transform_(p("promotions"),
          pr => coalesce(transform_(coalesce(pr("tags"),
            array().cast(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("text",
                  org.apache.spark.sql.types.StringType)))))),
            t => t("text")), array()))), "; ")).otherwise(lit(""))

      val qtySrc = orElse(p("quantity"), p("subtitle"))

      df.withColumn("_mech", mech)
        .withColumn("_parsed",
          when(col("_mech") =!= "", Udfs.parsePromo(col("_mech"), pbb, pbb)))
        .withColumn("_cp0", {
          val fromParse = when(col("_mech") =!= "" &&
              coalesce(col("_parsed")("effective_unit_price"), lit(0.0)) =!= 0.0,
            col("_parsed")("effective_unit_price")).otherwise(pbb)
          when(coalesce(p("prices")("promoPrice"), lit(0L)) > 0,
            p("prices")("promoPrice") / 100.0).otherwise(fromParse)
        })
        .withColumn("_cat", Udfs.normalizeCategory(
          p("title"), coalesce(p("category"), lit("")), lit(shopType)))
        .select(
          coalesce(p("id"), lit("unknown")).as("unified_id"),
          lit(shopType).as("shop_type"),
          p("title").as("title"),
          col("_cat")("category").as("main_category"),
          orElse(p("brand"), element_at(split(p("title"), " "), 1), lit(""))
            .as("brand"),
          coalesce(p("image"), lit("")).as("image_url"),
          coalesce(qtySrc, lit("per stuk")).as("sales_unit_size"),
          when(qtySrc.isNotNull, qtyAmount(qtySrc)).otherwise(lit(1.0))
            .as("quantity_amount"),
          when(qtySrc.isNotNull, qtyUnit(qtySrc)).otherwise(lit("stuk"))
            .as("quantity_unit"),
          coalesce(p("quantityDetails")("defaultAmount").cast("double"), lit(1.0))
            .as("default_quantity_amount"),
          when(p("quantityDetails").isNotNull, lit("stuk"))
            .otherwise(when(qtySrc.isNotNull, qtyUnit(qtySrc)).otherwise(lit("stuk")))
            .as("default_quantity_unit"),
          pbb.as("price_before_bonus"),
          col("_cp0").as("current_price"),
          when(p("prices")("pricePerUnit").isNotNull,
            p("prices")("pricePerUnit")("price") / 100.0).as("unit_price"),
          when(p("prices")("pricePerUnit").isNotNull,
            Udfs.normalizeUnit(coalesce(p("prices")("pricePerUnit")("unit"), lit(""))))
            .as("unit_price_unit"),
          (p("promotions").isNotNull && size(p("promotions")) > 0).as("is_promotion"),
          when(col("_mech") =!= "",
            when(col("_mech").contains("%"), lit("DISCOUNT_PERCENTAGE"))
              .otherwise(lit("DISCOUNT_AMOUNT"))).otherwise(lit("")).as("promotion_type"),
          col("_mech").as("promotion_mechanism"),
          lit(null).cast("string").as("promotion_start_date"),
          lit(null).cast("string").as("promotion_end_date"),
          when(col("_cp0") < pbb, col("_cp0")).as("parsed_promotion_effective_unit_price"),
          when(col("_mech") =!= "", col("_parsed")("required_quantity"))
            .as("parsed_promotion_required_quantity"),
          when(col("_mech") =!= "", col("_parsed")("total_promotion_price"))
            .as("parsed_promotion_total_price"),
          coalesce(when(col("_mech") =!= "",
            coalesce(col("_parsed")("is_multi_purchase_required"), lit(false))),
            lit(false)).as("parsed_promotion_is_multi_purchase_required"),
          when(qtySrc.isNotNull, qtyAmount(qtySrc)).otherwise(lit(1.0))
            .as("normalized_quantity_amount"),
          when(qtySrc.isNotNull, qtyUnit(qtySrc)).otherwise(lit("stuk"))
            .as("normalized_quantity_unit"),
          lit(1.0).as("conversion_factor"),
          lit(null).cast("double").as("price_per_standard_unit"),
          lit(null).cast("double").as("current_price_per_standard_unit"),
          when(col("_cp0") < pbb && pbb > 0, pbb - col("_cp0")).as("discount_absolute"),
          when(col("_cp0") < pbb && pbb > 0, (pbb - col("_cp0")) / pbb * 100)
            .as("discount_percentage"),
          (!(p("availability")("isAvailable") === false) &&
            !(p("inAssortment") === false)).as("is_active"))
    }

    // avoid clash with this file's DataFrame import of functions.transform
    private def transform_(c: Column, f: Column => Column): Column =
      org.apache.spark.sql.functions.transform(c, f)
  }

  /** Aldi — F3 (aldi.ts:421-432) + T3 (aldi.ts:77-226). String prices; the
    * current-ISO-week promo window depends on the run date, so `now` is
    * injected (SURVEY.md §7.4 risk 6). */
  final case class AldiAdapter(now: LocalDate) extends ShopAdapter {
    val shopType = "ALDI"
    val schema = RawSchemas.aldi

    val skip: Column =
      coalesce(col("isNotAvailable"), lit(false)) ||
      coalesce(col("isSoldOut"), lit(false)) ||
      col("mainCategory") <=> "cadeaukaarten"

    def transform(df: DataFrame): DataFrame = {
      // parsePrice (aldi.ts:325-337): price → priceFormatted stripped → 0.01
      val priceParsed = coalesce(
        when(col("price").cast("double") > 0, col("price").cast("double")),
        when(regexp_replace(regexp_replace(col("priceFormatted"), "[^0-9.,]", ""),
          ",", ".").cast("double") > 0,
          regexp_replace(regexp_replace(col("priceFormatted"), "[^0-9.,]", ""),
            ",", ".").cast("double")),
        lit(0.01))
      val oldP = col("oldPrice").cast("double")
      val pbb = when(col("oldPrice").isNotNull, oldP).otherwise(priceParsed)

      // determinePromotions (aldi.ts:339-385)
      val pctOff = round((oldP - priceParsed) / oldP * 100).cast("int")
      val isPromo =
        when(col("oldPrice").isNotNull && col("oldPrice") =!= col("price"), lit(true))
        .when(coalesce(trim(col("priceReduction")), lit("")) =!= "", lit(true))
        .when(coalesce(trim(col("priceInfo")), lit("")) =!= "", lit(true))
        .when(col("mainCategory") === "discount", lit(true))
        .otherwise(lit(false))
      val promoType =
        when(col("oldPrice").isNotNull && col("oldPrice") =!= col("price"),
          lit("PRICE_REDUCTION"))
        .when(coalesce(trim(col("priceReduction")), lit("")) =!= "", lit("PRICE_REDUCTION"))
        .when(coalesce(trim(col("priceInfo")), lit("")) =!= "", lit("PRICE_INFO"))
        .when(col("mainCategory") === "discount", lit("WEEKLY_OFFER"))
        .otherwise(lit(""))
      val mech =
        when(col("oldPrice").isNotNull && col("oldPrice") =!= col("price"),
          when(oldP > 0 && priceParsed > 0 && oldP > priceParsed,
            concat(lit("-"), pctOff.cast("string"), lit("%")))
            .otherwise(concat(lit("Was €"), format_string("%.2f", oldP))))
        .when(coalesce(trim(col("priceReduction")), lit("")) =!= "", col("priceReduction"))
        .when(coalesce(trim(col("priceInfo")), lit("")) =!= "", col("priceInfo"))
        .when(col("mainCategory") === "discount", lit("Weekaanbieding"))
        .otherwise(lit(""))

      // formatPromotionDate (aldi.ts:259-294): ISO passthrough or Unix ms
      val rawDate = col("promotionDetails")("promotionDate")
      val startParsed =
        when(rawDate.rlike("^\\d{4}-\\d{2}-\\d{2}$"), rawDate)
          .when(rawDate.cast("long") > 0,
            date_format(timestamp_millis(rawDate.cast("long")), "yyyy-MM-dd"))

      val monday = now.`with`(DayOfWeek.MONDAY)
      val weekStart = lit(monday.toString)
      val weekEnd = lit(monday.plusDays(6).toString)

      // quantity (aldi.ts:296-323)
      val suMatch = regexp_extract(col("salesUnit"), "(\\d+(?:[.,]\\d+)?)\\s*(\\w+\\.?)", 0)
      val sdValue = regexp_extract(col("shortDescription"),
        "(?i)(\\d+(?:[.,]\\d+)?\\s*(ml|g|kg|l))", 1)
      val sdParts = split(sdValue, " ")
      val qAmt =
        when(col("salesUnit").isNotNull && suMatch =!= "",
          regexp_replace(regexp_extract(col("salesUnit"),
            "(\\d+(?:[.,]\\d+)?)\\s*(\\w+\\.?)", 1), ",", ".").cast("double"))
        .when(sdValue =!= "" && size(sdParts) >= 2,
          regexp_replace(element_at(sdParts, 1), ",", ".").cast("double"))
        .otherwise(lit(1.0))
      val qUnitRaw =
        when(col("salesUnit").isNotNull && suMatch =!= "",
          regexp_extract(col("salesUnit"), "(\\d+(?:[.,]\\d+)?)\\s*(\\w+\\.?)", 2))
        .when(sdValue =!= "" && size(sdParts) >= 2, element_at(sdParts, 2))
      val qUnit = when(qUnitRaw.isNotNull, Udfs.normalizeUnit(qUnitRaw)).otherwise(lit("stuk"))

      val initialCat = orElse(col("mainCategory"),
        when(col("articleId").isNotNull && size(split(col("articleId"), "/")) > 1,
          array_join(slice(split(col("articleId"), "/"), lit(1),
            size(split(col("articleId"), "/")) - 1), "/"))
          .otherwise(lit("Uncategorized")),
        lit("Uncategorized"))

      df.withColumn("_mech", mech)
        .withColumn("_pbb", pbb)
        .withColumn("_price", priceParsed)
        .withColumn("_parsed",
          when(col("_mech") =!= "", Udfs.parsePromo(col("_mech"), col("_pbb"), col("_pbb"))))
        .withColumn("_cp",
          when(col("_mech") =!= "" &&
              coalesce(col("_parsed")("effective_unit_price"), lit(0.0)) =!= 0.0,
            col("_parsed")("effective_unit_price")).otherwise(col("_pbb")))
        .withColumn("_isPromo", isPromo)
        .withColumn("_start", startParsed)
        .withColumn("_cat", Udfs.normalizeCategory(col("title"), initialCat, lit(shopType)))
        .select(
          coalesce(col("articleNumber"), lit("unknown")).as("unified_id"),
          lit(shopType).as("shop_type"),
          col("title").as("title"),
          col("_cat")("category").as("main_category"),
          coalesce(trim(col("brandName")), lit("")).as("brand"),
          coalesce(col("primaryImage")("baseUrl"), lit("")).as("image_url"),
          coalesce(nullif(col("salesUnit"), lit("")),
            concat(qAmt.cast("string"), lit(" "), qUnit)).as("sales_unit_size"),
          qAmt.as("quantity_amount"),
          qUnit.as("quantity_unit"),
          lit(1.0).as("default_quantity_amount"),
          qUnit.as("default_quantity_unit"),
          col("_pbb").as("price_before_bonus"),
          col("_cp").as("current_price"),
          when(col("basePriceValue").isNotNull && col("basePriceValue") =!= 0.0 &&
            coalesce(col("basePriceFormatted"), lit("")) =!= "", col("basePriceValue"))
            .as("unit_price"),
          when(col("basePriceValue").isNotNull && col("basePriceValue") =!= 0.0 &&
            coalesce(col("basePriceFormatted"), lit("")) =!= "" &&
            regexp_extract(col("basePriceFormatted"), "/([a-zA-Z]+)", 1) =!= "",
            Udfs.normalizeUnit(regexp_extract(col("basePriceFormatted"),
              "/([a-zA-Z]+)", 1))).as("unit_price_unit"),
          col("_isPromo").as("is_promotion"),
          promoType.as("promotion_type"),
          col("_mech").as("promotion_mechanism"),
          coalesce(col("_start"),
            when(col("_isPromo") || col("mainCategory") === "discount", weekStart))
            .as("promotion_start_date"),
          when(col("_start").isNull &&
            (col("_isPromo") || col("mainCategory") === "discount"), weekEnd)
            .as("promotion_end_date"),
          when(col("_cp") < col("_pbb"), col("_cp"))
            .as("parsed_promotion_effective_unit_price"),
          when(col("_mech") =!= "", col("_parsed")("required_quantity"))
            .as("parsed_promotion_required_quantity"),
          when(col("_mech") =!= "", col("_parsed")("total_promotion_price"))
            .as("parsed_promotion_total_price"),
          coalesce(when(col("_mech") =!= "",
            coalesce(col("_parsed")("is_multi_purchase_required"), lit(false))),
            lit(false)).as("parsed_promotion_is_multi_purchase_required"),
          qAmt.as("normalized_quantity_amount"),
          qUnit.as("normalized_quantity_unit"),
          lit(1.0).as("conversion_factor"),
          lit(null).cast("double").as("price_per_standard_unit"),
          lit(null).cast("double").as("current_price_per_standard_unit"),
          when(col("_cp") < col("_pbb") && col("_pbb") > 0, col("_pbb") - col("_cp"))
            .as("discount_absolute"),
          when(col("_cp") < col("_pbb") && col("_pbb") > 0,
            (col("_pbb") - col("_cp")) / col("_pbb") * 100).as("discount_percentage"),
          (!coalesce(col("isNotAvailable"), lit(false)) &&
            !coalesce(col("isSoldOut"), lit(false))).as("is_active"))
    }
  }
  /** Fresh adapter per access: the ISO-week promotion window derives from
    * `now`, so a long-running driver must not pin the class-load date (the
    * reference computes the current week per run). Callers needing a fixed
    * clock construct `AldiAdapter(date)` directly (tests do); the
    * constructor takes no default, so wall-clock is opt-in via this
    * accessor only. */
  def Aldi: AldiAdapter = AldiAdapter(LocalDate.now)

  /** Plus — F4 (plus.ts:388-395) + T4 (plus.ts:86-267). String prices,
    * '1900-01-01' sentinel dates, Packging (sic) fallback. */
  object Plus extends ShopAdapter {
    val shopType = "PLUS"
    val schema = RawSchemas.plus

    private val p = col("PLP_Str")

    val skip: Column =
      p.isNull || !coalesce(p("IsAvailable"), lit(false))

    /** Required-field check (plus.ts:269-289) → error side-output. */
    val transformError: Column =
      p("SKU").isNull || coalesce(p("SKU"), lit("")) === "" ||
      p("Name").isNull || coalesce(p("Name"), lit("")) === "" ||
      p("OriginalPrice").isNull || coalesce(p("OriginalPrice"), lit("")) === "" ||
      p("Categories").isNull

    def transform(df: DataFrame): DataFrame = {
      val pbb = coalesce(p("OriginalPrice").cast("double"), lit(0.0))
      val newP = p("NewPrice").cast("double")
      val initialCp0 =
        when(p("NewPrice").isNotNull && newP.isNotNull && newP > 0, newP).otherwise(pbb)
      val initialCp = when(initialCp0 === 0 && pbb > 0, pbb).otherwise(initialCp0)

      // quantity cascade (plus.ts:291-340)
      val subAmtRaw = regexp_extract(p("Product_Subtitle"),
        "(?i)Per\\s+(\\d+(?:[.,]\\d+)?)\\s*(\\w+)", 1)
      val subUnitRaw = regexp_extract(p("Product_Subtitle"),
        "(?i)Per\\s+(\\d+(?:[.,]\\d+)?)\\s*(\\w+)", 2)
      val slugAmtRaw = regexp_extract(p("Slug"), "-(\\d+(?:[.,]\\d+)?)-([a-zA-Z]+)", 1)
      val slugUnitRaw = regexp_extract(p("Slug"), "-(\\d+(?:[.,]\\d+)?)-([a-zA-Z]+)", 2)
      val qAmt =
        when(p("Product_Subtitle").isNotNull && subAmtRaw =!= "",
          regexp_replace(subAmtRaw, ",", ".").cast("double"))
        .when(p("Slug").isNotNull && slugAmtRaw =!= "",
          regexp_replace(slugAmtRaw, ",", ".").cast("double"))
        .otherwise(lit(1.0))
      val qUnit =
        when(p("Product_Subtitle").isNotNull && subAmtRaw =!= "",
          Udfs.normalizeUnit(subUnitRaw))
        .when(p("Slug").isNotNull && slugAmtRaw =!= "", Udfs.normalizeUnit(slugUnitRaw))
        .when(p("Packging").isNotNull, Udfs.normalizeUnit(p("Packging")))
        .otherwise(lit("stuk"))

      // calculateUnitPrice (plus.ts:342-384) on the NORMALIZED unit
      val upRaw =
        when(qUnit === "g", pbb / qAmt * 1000)
        .when(qUnit === "ml", pbb / qAmt * 1000)
        .otherwise(pbb / qAmt)
      val upUnit =
        when(qUnit === "g", lit("kg")).when(qUnit === "ml", lit("l")).otherwise(qUnit)
      val upValid = pbb > 0 && qAmt > 0 && !(qAmt === 1 && qUnit === "stuk")

      val isPromo = p("PromotionLabel").isNotNull &&
        (p("PromotionStartDate").isNull || p("PromotionStartDate") =!= "1900-01-01") &&
        (p("PromotionEndDate").isNull || p("PromotionEndDate") =!= "1900-01-01")
      val mech = when(isPromo, coalesce(p("PromotionLabel"), lit(""))).otherwise(lit(""))

      val initialCat = p("Categories")("List").getItem(0)("Name")

      df.filter(!transformError)
        .withColumn("_mech", mech)
        .withColumn("_pbb", pbb)
        .withColumn("_icp", initialCp)
        .withColumn("_parsed",
          when(col("_mech") =!= "",
            Udfs.parsePromo(col("_mech"), col("_pbb"), col("_icp"))))
        .withColumn("_cp",
          when(col("_mech") =!= "" &&
              coalesce(col("_parsed")("effective_unit_price"), lit(0.0)) =!= 0.0,
            col("_parsed")("effective_unit_price")).otherwise(col("_icp")))
        .withColumn("_cat",
          when(initialCat.isNotNull,
            Udfs.normalizeCategory(p("Name"), initialCat, lit(shopType))("category")))
        .select(
          p("SKU").as("unified_id"),
          lit(shopType).as("shop_type"),
          p("Name").as("title"),
          col("_cat").as("main_category"),
          orElse(p("Brand"), element_at(split(p("Name"), " "), 1)).as("brand"),
          coalesce(p("ImageURL"), lit("")).as("image_url"),
          when(coalesce(trim(p("Product_Subtitle")), lit("")) =!= "",
            regexp_replace(p("Product_Subtitle"), "(?i)^Per\\s+", ""))
            .otherwise(concat(qAmt.cast("string"), lit(" "), qUnit))
            .as("sales_unit_size"),
          qAmt.as("quantity_amount"),
          qUnit.as("quantity_unit"),
          lit(1.0).as("default_quantity_amount"),
          qUnit.as("default_quantity_unit"),
          col("_pbb").as("price_before_bonus"),
          col("_cp").as("current_price"),
          when(upValid, round(upRaw, 2)).as("unit_price"),
          when(upValid, upUnit).as("unit_price_unit"),
          isPromo.as("is_promotion"),
          when(isPromo, lit("DISCOUNT")).otherwise(lit("")).as("promotion_type"),
          col("_mech").as("promotion_mechanism"),
          when(isPromo, p("PromotionStartDate")).as("promotion_start_date"),
          when(isPromo, p("PromotionEndDate")).as("promotion_end_date"),
          when(col("_cp") < col("_pbb"), col("_cp"))
            .as("parsed_promotion_effective_unit_price"),
          when(col("_mech") =!= "", col("_parsed")("required_quantity"))
            .as("parsed_promotion_required_quantity"),
          when(col("_mech") =!= "", col("_parsed")("total_promotion_price"))
            .as("parsed_promotion_total_price"),
          coalesce(when(col("_mech") =!= "",
            coalesce(col("_parsed")("is_multi_purchase_required"), lit(false))),
            lit(false)).as("parsed_promotion_is_multi_purchase_required"),
          qAmt.as("normalized_quantity_amount"),
          qUnit.as("normalized_quantity_unit"),
          lit(1.0).as("conversion_factor"),
          lit(null).cast("double").as("price_per_standard_unit"),
          lit(null).cast("double").as("current_price_per_standard_unit"),
          when(col("_cp") < col("_pbb") && col("_pbb") > 0, col("_pbb") - col("_cp"))
            .as("discount_absolute"),
          when(col("_cp") < col("_pbb") && col("_pbb") > 0,
            (col("_pbb") - col("_cp")) / col("_pbb") * 100).as("discount_percentage"),
          p("IsAvailable").as("is_active"))
    }
  }

  def all: Seq[ShopAdapter] = Seq(Ah, Jumbo, Aldi, Plus)

  /** Kruidvat: scraped upstream but intentionally unimplemented in the
    * reference (database-processor-adapter.ts:151-152) — same explicit error. */
  def forShop(shopType: String): ShopAdapter = shopType.toUpperCase match {
    case "AH" => Ah
    case "JUMBO" => Jumbo
    case "ALDI" => Aldi
    case "PLUS" => Plus
    case "KRUIDVAT" =>
      throw new UnsupportedOperationException("Kruidvat processor not implemented")
    case other => throw new IllegalArgumentException(s"Unknown shop type: $other")
  }
}
