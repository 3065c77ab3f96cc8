package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query gets one untimed warmup run (JIT +
  * codegen + parquet footer caching) and one timed run — the steady-state
  * number is what a long-running cluster job sees; first-query warmup noise
  * would otherwise land on whichever query Map ordering puts first.
  *
  * The printed line reports the total over ALL queries but per-query detail
  * only for a fixed headline set: the harness that consumes this output
  * keeps a bounded tail of the run log, and a 100+-entry JSON line gets
  * truncated past parseability (BENCH_r01/r02 both record "parsed": null
  * for exactly this reason). The full per-query map goes to
  * bench_full.json next to the working dir for local iteration. */
object Bench {
  /** Representative, most-expensive queries — one per major subsystem. */
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_join_agg", "q9_running_window", "q14_topk_per_group",
    "q26_ngram_jaccard", "q27_minhash_lsh", "q29_ann_topk",
    "q40_ah_adapter", "q42_aldi_adapter", "q44_calculate_fields",
    "q66_connected_components", "q83_column_profile",
    "q92_curation_funnel", "q98_corpus_pipeline",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = ordered.map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => }
      val t0 = System.nanoTime()
      // a failing query records -1, not its elapsed time — breakage must be
      // visible in the JSON, not masked as a fast success
      val elapsed =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      name -> elapsed
    }
    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    def jsonMap(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failed = results.count(_._2 < 0)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"),
      s"""{"total":${fmt(total)},"queries":${jsonMap(results)}}""")
    val head = results.filter { case (k, _) => headline.contains(k) }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"failed":$failed,"queries":${jsonMap(head)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
