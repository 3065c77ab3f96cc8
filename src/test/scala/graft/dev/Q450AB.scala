package graft

import org.apache.spark.sql.functions._

/** dev: same-box A/B of q450's pair-sample placement — post-hoc filter on
  * the finished pair table (round-7 spelling) vs the predicate pushed into
  * the pair engine (ngramJaccardPairsSampled, round 8). Args: sfDir [reps].
  * The box drifts between sessions, so only a same-session A/B can say
  * what the pushdown bought. */
object Q450AB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    val docs = graft.queries.TrainingData.corpus(spark, sfDir)
    val samplePred = (a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =>
      (conv(substring(sha2(concat(a.cast("string"), lit(":"),
        b.cast("string")), 256), 1, 4), 16, 10).cast("long") % 20) === 0
    def oldPairs() = graft.etl.Similarity
      .ngramJaccardPairs(docs, "doc_id", "text", 3)
      .filter(samplePred($"id_a", $"id_b"))
    def newPairs() = graft.etl.Similarity
      .ngramJaccardPairsSampled(docs, "doc_id", "text", 3, samplePred)
    def time(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().queryExecution.toRdd.count(); release() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = mk().queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        release(); (t, n)
      }
      println(f"Q450AB $tag min=${ts.map(_._1).min}%.2f rows=${ts.head._2} " +
        f"times=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    time("old_posthoc_filter", oldPairs)
    time("new_engine_pushdown", newPairs)
    spark.stop()
  }
}
