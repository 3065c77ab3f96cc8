package graft.dev

import org.apache.spark.sql.SparkSession

import graft.{Sessions, Tables}
import graft.etl.Similarity

/** One-off A/B harness for the q27 materialization knobs (VERDICT r06 §1):
  * times `minhashDedupTunable` at sf0.1 under each (cacheShingles,
  * barrierSigs) combination, N repetitions each, and prints the medians.
  * The winning combination is pinned in `minhashDedupPairs`; this main
  * exists so the decision stays re-measurable when the corpus or Spark
  * version changes.
  */
object MaterializationBench {
  private def releaseStorage(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    def run(cache: Boolean, barrier: Boolean): Long =
      Similarity.minhashDedupTunable(docs, "doc_id", "text",
        n = 3, numHashes = 32, bands = 8, threshold = 1.0,
        cacheShingles = cache, barrierSigs = barrier,
        materialize = true).count()

    // warmup (JIT, codegen, parquet footers)
    run(cache = true, barrier = true)
    releaseStorage(spark)

    val combos = Seq((true, true), (true, false), (false, true), (false, false))
    combos.foreach { case (cache, barrier) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = run(cache, barrier)
        val sec = (System.nanoTime() - t0) / 1e9
        releaseStorage(spark)
        System.gc()
        (sec, n)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      println(f"RESULT q27 cache=$cache%-5s barrier=$barrier%-5s median=$med%.3f s rows=${times.head._2}")
    }

    // q26: ngramJaccard with (materialized caches) vs (pure plan)
    def runJ(mat: Boolean): Long = {
      val pairs =
        if (mat) Similarity.ngramJaccardPairs(docs, "doc_id", "text", 3)
        else Similarity.ngramJaccardPlan(docs, "doc_id", "text", 3)
      import org.apache.spark.sql.functions.col
      pairs.filter(col("inter") * 2 >= col("union_size")).count()
    }
    runJ(mat = true); releaseStorage(spark)
    Seq(true, false).foreach { mat =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = runJ(mat)
        val sec = (System.nanoTime() - t0) / 1e9
        releaseStorage(spark)
        System.gc()
        (sec, n)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      println(f"RESULT q26 materialize=$mat%-5s median=$med%.3f s rows=${times.head._2}")
    }

    // q162: containmentPairs (union of two filters over the same pair plan)
    def runC(mat: Boolean): Long =
      Similarity.containmentTunable(docs, "doc_id", "text", 3,
        materialize = mat).count()
    runC(mat = true); releaseStorage(spark)
    Seq(true, false).foreach { mat =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = runC(mat)
        val sec = (System.nanoTime() - t0) / 1e9
        releaseStorage(spark)
        System.gc()
        (sec, n)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      println(f"RESULT q162 materialize=$mat%-5s median=$med%.3f s rows=${times.head._2}")
    }
    spark.stop()
  }
}
