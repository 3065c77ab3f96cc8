package graft

/** dev: same-box A/B of q162's containment spelling — pure plan (union's
  * two branches rebuilt, AQE exchange reuse expected to dedupe the heavy
  * bucket aggregation) vs materialized pair table (cache() barrier, each
  * branch reads the cached pairs). Round 7 pinned pure-plan as winner;
  * the round-10 verdict's q162 lead (isolated ≈1.8x floor on two boxes)
  * asks whether that still holds. Args: sfDir [reps]. */
object Q162AB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    val docs = graft.queries.TrainingData.corpus(spark, sfDir)
    def q(mat: Boolean) = graft.etl.Similarity
      .containmentTunable(docs, "doc_id", "text", 3, materialize = mat)
      .orderBy(col("contained_id"), col("container_id"))
    def time(tag: String, mat: Boolean): Unit = {
      q(mat).queryExecution.toRdd.count(); release() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = q(mat).queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        release(); (t, n)
      }
      println(f"Q162AB $tag min=${ts.map(_._1).min}%.2f rows=${ts.head._2} " +
        f"times=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    time("pure_plan", mat = false)
    time("materialized", mat = true)
    spark.stop()
  }
}
