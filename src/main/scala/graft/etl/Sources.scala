package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources (SURVEY.md §2.1).
  *
  * S1 (shop JSON scan) lives in [[Pipeline.readShopJson]]; S4 (scrape
  * ingestion/explode) in [[Pipeline.ingestScrape]]. Here: the JDBC raw-table
  * scan with pushed predicates (S2/S3), the ML-predictions broadcast
  * dimension (S6/C8), and input-file gating (F7).
  */
object Sources {

  /** S2 — raw-table scan with optional predicates
    * (postgres-adapter.ts:47-97). Filters are plain Columns so Catalyst
    * pushes them into the JDBC WHERE clause; the reference's LIMIT/OFFSET
    * pagination was a single-node memory guard and is intentionally dropped
    * (S3): Spark partitions the scan instead — pass `partitionColumn`
    * bounds for parallel reads on a real cluster. */
  def rawProducts(spark: SparkSession, jdbcUrl: String,
      props: java.util.Properties, table: String = "raw.products",
      shopType: Option[String] = None, jobId: Option[String] = None,
      scrapedAfter: Option[java.sql.Timestamp] = None,
      partitioning: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", jdbcUrl)
      .option("dbtable", table)
    props.stringPropertyNames.forEach(k => reader.option(k, props.getProperty(k)))
    val base = partitioning match {
      case Some((col0, lower, upper, n)) => reader
        .option("partitionColumn", col0)
        .option("lowerBound", lower).option("upperBound", upper)
        .option("numPartitions", n).load()
      case None => reader.load()
    }
    Seq(
      shopType.map(col("shop_type") === _),
      jobId.map(col("job_id") === _),
      scrapedAfter.map(col("scraped_at") >= _)
    ).flatten.foldLeft(base)(_ filter _)
  }

  /** S6/C8/J1 — ML category predictions as a broadcast dimension
    * (prediction.ts:40-66: title → {category, confidence}). The offline
    * BERT batch job's output lands as JSON/parquet; at runtime the
    * reference only ever does a dictionary lookup, which in Spark is a
    * broadcast left join on title. */
  def mlPredictions(spark: SparkSession, path: String): DataFrame = {
    val raw = if (path.endsWith(".json")) spark.read.json(path)
              else spark.read.parquet(path)
    mlPredictionsFrom(raw)
  }

  /** Normalize any (title, category, confidence) frame into the dim shape. */
  def mlPredictionsFrom(raw: DataFrame): DataFrame =
    raw.select(col("title"), col("category").as("ml_category"),
      col("confidence").cast("double").as("ml_confidence"))

  /** C6 — join predictions and run the cascade with the ML step active.
    * The dimension side is broadcast: never a shuffle of the product side. */
  def withMlCategory(products: DataFrame, predictions: DataFrame,
      shopType: String): DataFrame = {
    val joined = products.join(broadcast(predictions), Seq("title"), "left")
    joined.withColumn("_cat", Udfs.normalizeCategoryMl(
        col("title"), coalesce(col("main_category"), lit("")), lit(shopType),
        col("ml_category"), col("ml_confidence")))
      .withColumn("main_category", col("_cat")("category"))
      .withColumn("category_mapping_method", col("_cat")("method"))
      .drop("_cat", "ml_category", "ml_confidence")
  }

  /** Schema-on-read field profile of a raw JSON column: which top-level
    * keys actually occur, in how many parseable documents, and each key's
    * coverage in bp — the first report run on ANY new scraper feed,
    * before anyone writes an adapter against fields that exist in 3% of
    * rows. `n_docs` counts parseable JSON objects only (the denominator
    * an adapter cares about); malformed rows are reported separately so
    * feed rot is visible, not averaged away. One key-explode + one
    * combiner-friendly count; key cardinality is schema-sized, so the
    * result is tiny at any corpus scale. */
  def jsonFieldProfile(raw: DataFrame, jsonCol: String): DataFrame = {
    val keys = raw.select(json_object_keys(col(jsonCol)).as("_ks"))
    val totals = keys.agg(
      sum(when(col("_ks").isNotNull, 1L).otherwise(0L)).as("n_docs"),
      sum(when(col("_ks").isNull, 1L).otherwise(0L)).as("n_malformed"))
    keys.select(explode(col("_ks")).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n_present"))
      .crossJoin(broadcast(totals))
      .select(col("key"), col("n_present"), col("n_docs"),
        col("n_malformed"),
        expr("CAST(n_present * 10000 div n_docs AS BIGINT)")
          .as("presence_bp"))
  }

  /** F7 — input-file gating (index.ts:27-48): only shops whose input file
    * exists and is bigger than 2 bytes get processed. */
  def gateInputs(spark: SparkSession, inputs: Map[String, String]): Map[String, String] =
    inputs.filter { case (_, path) =>
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(p) && fs.getFileStatus(p).getLen > 2
    }
}
