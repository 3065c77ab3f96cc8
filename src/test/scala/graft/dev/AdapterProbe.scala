package graft

/** dev: where does q42_aldi_adapter's time go — args: sfDir [reps].
  * Times (a) the synthesized-JSON projection alone, (b) + from_json parse,
  * (c) + localCheckpoint materialization (the query's evalOnce barrier),
  * (d) + Shops.Aldi.unified transform, (e) the full declared query.
  * Storage released between reps like Bench. */
object AdapterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    val k = (col("o_orderkey") % 8).cast("int")
    val cents = ((col("o_orderkey") % 19) + 1) * 20
    def dec(c: org.apache.spark.sql.Column) = concat(
      (c / 100).cast("long").cast("string"), lit("."),
      lpad((c % 100).cast("string"), 2, "0"))
    val json = concat(
      lit("{\"articleNumber\":\"A"), $"o_orderkey".cast("string"), lit("\""),
      lit(",\"title\":\"Aldi Product "), $"o_orderkey".cast("string"), lit("\""),
      lit(",\"brandName\":\"Merk\""),
      lit(",\"salesUnit\":\""),
      when(k === 7, lit("750 ml")).otherwise(lit("500 g")), lit("\""),
      lit(",\"mainCategory\":\""),
      when(k === 2, lit("cadeaukaarten")).when(k === 6, lit("discount"))
        .otherwise(lit("Bakkerij")), lit("\""),
      when(k === 0, lit(",\"isNotAvailable\":true")).otherwise(lit("")),
      when(k === 1, lit(",\"isSoldOut\":true")).otherwise(lit("")),
      lit(",\"price\":\""), when(k === 7, lit("0")).otherwise(dec(cents)), lit("\""),
      when(k === 7, concat(lit(",\"priceFormatted\":\"€"),
        regexp_replace(dec(cents), "\\.", ","), lit("\""))).otherwise(lit("")),
      when(k === 3, concat(lit(",\"oldPrice\":\""), dec(cents * 2), lit("\"")))
        .otherwise(lit("")),
      when(k === 4, lit(",\"priceReduction\":\"- €0.50\"")).otherwise(lit("")),
      when(k === 5, lit(",\"priceInfo\":\"actieprijs\"")).otherwise(lit("")),
      when(k === 7, lit(",\"basePriceValue\":3.32,\"basePriceFormatted\":\"€3.32/l\""))
        .otherwise(lit("")),
      when(k.isin(3, 4, 5, 6),
        lit(",\"promotionDetails\":{\"promotionDate\":\"2024-03-04\"}"))
        .otherwise(lit("")),
      lit(",\"primaryImage\":{\"baseUrl\":\"img.jpg\"}}"))
    def jsonDf = Tables.orders(spark, sfDir).select(json.as("_j"))
    def parsedDf = Tables.orders(spark, sfDir)
      .select(from_json(json, graft.etl.Shops.Aldi.schema).as("j")).select($"j.*")
    def ckptDf = parsedDf.localCheckpoint(eager = false)
    def unifiedDf = graft.etl.Shops.Aldi.unified(ckptDf)
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.queryExecution.toRdd.count(); release()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        release(); t
      }
      println(f"ADAPTER $tag min=${ts.min}%.2f times=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("a_json")(jsonDf)
    time("b_parsed")(parsedDf)
    time("c_ckpt")(ckptDf)
    time("d_unified")(unifiedDf)
    time("e_full")(SparkEntry.queries("q42_aldi_adapter")(spark, sfDir))
    spark.stop()
  }
}
