package graft

import org.apache.spark.sql.functions._
import graft.etl.{Pipeline, Shops}

/** ETL-throughput benchmark: the full per-shop pipeline (skip → transform →
  * calculateFields → quality → dedup) over N synthesized raw Jumbo rows —
  * directly comparable to the reference processor's items/sec counters
  * (BASELINE.md: scrapers sustain 39–73 products/sec; the processor logs
  * items/sec per run on O(10⁴) rows).
  *
  * Prints one JSON line: {"metric":"etl_rows_per_sec", ...}.
  */
object EtlBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ETL_ROWS", "200000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // synthesize raw Jumbo JSON (cents prices, promos on every 5th row)
    val raw = spark.range(n.toLong).select(
      concat(lit("""{"product":{"id":""""), $"id",
        lit("""","title":"Product """), $"id",
        lit(""" merk","category":"zuivel","subtitle":""""),
        ($"id" % 900) + 100, lit(""" g","prices":{"price":"""),
        ($"id" % 2000) + 99,
        when($"id" % 5 === 0,
          lit("""},"promotions":[{"tags":[{"text":"2 voor 3.00"}]}]"""))
          .otherwise(lit("}")),
        lit(""","inAssortment":true}}""")).as("json"))
    val parsed = spark.read.schema(Shops.Jumbo.schema)
      .json(raw.as[String]).cache()
    parsed.count() // materialize input outside the timed section

    Pipeline.process(Shops.Jumbo, parsed).count() // warmup
    val t0 = System.nanoTime()
    val out = Pipeline.process(Shops.Jumbo, parsed).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"etl_rows_per_sec","value":${n / sec}%.0f,"unit":"rows/sec","rows":$n,"out_rows":$out,"sec":$sec%.3f}""")
    spark.stop()
  }
}
