package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dev: same-JVM A/B of globalRank spellings on a big (6M-row lineitem)
  * frame — old zipWithIndex-over-external-Rows vs the checkpoint-pinned
  * monotonically_increasing_id arithmetic. Times the q366-shaped consumer
  * (rank self-join run count). Args: sfDir [reps]. */
object RankAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def oldRank(df: DataFrame, sort: Seq[Column], rankCol: String,
        nParts: Int): DataFrame = {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val sorted = df.repartitionByRange(nParts, sort: _*)
        .sortWithinPartitions(sort: _*)
      val schema = StructType(sorted.schema.fields :+
        StructField(rankCol, LongType, nullable = false))
      val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      }
      df.sparkSession.createDataFrame(rdd, schema)
    }
    def consumer(ranked: DataFrame): DataFrame = {
      val r = ranked.select(col("_k"), col("rank")).localCheckpoint()
      val prev = r.select((col("rank") + 1).as("rank"), col("_k").as("_pk"))
      r.join(prev, Seq("rank"))
        .agg(coalesce(sum(when(col("_k") =!= col("_pk"), 1L).otherwise(0L)),
          lit(0L)).as("chg"))
    }
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey").as("_k"), col("l_orderkey"), col("l_linenumber"))
    val sort = Seq(col("l_orderkey"), col("l_linenumber"))
    def time(tag: String)(mk: => DataFrame): Unit = {
      mk.queryExecution.toRdd.count(); release()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        release(); t
      }
      println(f"RANKAB $tag min=${ts.min}%.2f times=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("old_zipWithIndex")(consumer(oldRank(li, sort, "rank", 64)))
    time("new_midArith")(consumer(graft.etl.Layout.globalRank(li, sort, "rank", 64)))
    time("old_zipWithIndex2")(consumer(oldRank(li, sort, "rank", 64)))
    time("new_midArith2")(consumer(graft.etl.Layout.globalRank(li, sort, "rank", 64)))
    spark.stop()
  }
}
