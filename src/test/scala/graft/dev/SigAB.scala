package graft

import org.apache.spark.sql.functions._

/** dev: A/B the MinHash signature stage — 32-perm crossJoin+groupBy(doc,i)
  * (the q442/q450 spelling) vs one groupBy(doc) with 32 min-aggregate
  * columns unpivoted by stack(). Args: sfDir [reps]. Hash work is
  * identical (32 sha2 per shingle either way); the question is what the
  * 32x row inflation through the shuffle costs. */
object SigAB {
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
    val shingles = docs.select($"doc_id",
      explode(array_distinct(call_function("word_shingles", $"text",
        lit(3)))).as("s"))
    def viaCross() = {
      val perms = spark.range(32).select($"id".cast("int").as("i"))
      shingles.crossJoin(broadcast(perms))
        .groupBy($"doc_id", $"i")
        .agg(min(expr("CAST(conv(substring(sha2(concat(CAST(i AS STRING), " +
          "':', s), 256), 1, 8), 16, 10) AS BIGINT)")).as("mh"))
    }
    def viaStack() = {
      val mins = (0 until 32).map(i =>
        min(expr(s"CAST(conv(substring(sha2(concat('$i', ':', s), 256), " +
          s"1, 8), 16, 10) AS BIGINT)")).as(s"_m$i"))
      val agged = shingles.groupBy($"doc_id").agg(mins.head, mins.tail: _*)
      val stackArgs = (0 until 32).map(i => s"$i, _m$i").mkString(", ")
      agged.select($"doc_id",
        expr(s"stack(32, $stackArgs) AS (i, mh)"))
        .select($"doc_id", $"i".cast("int").as("i"), $"mh")
    }
    def viaLanes() = graft.queries.TrainingData.shaLaneSigs(shingles)
    def time(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().queryExecution.toRdd.count(); release()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = mk().queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        release(); (t, n)
      }
      println(f"SIGAB $tag min=${ts.map(_._1).min}%.2f rows=${ts.head._2} " +
        f"times=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    time("crossjoin_explode_32digests", viaCross)
    time("columnar_stack_32digests", viaStack)
    time("lane_recipe_4digests", viaLanes)
    // cross-check equality
    val a = viaCross(); val b = viaStack()
    val diff = a.unionByName(b).groupBy($"doc_id", $"i", $"mh")
      .agg(count(lit(1)).as("c")).filter($"c" =!= 2).count()
    println(s"SIGAB mismatch_rows=$diff")
    spark.stop()
  }
}
