package graft.dev

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.etl.Similarity

/** Dev probe: where does q382's wall time go — pqEncode, the pair frame,
  * or plan/codegen explosion from projection inlining? */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    val emb = Tables.embeddings(spark, dir)
    // warmup
    emb.count()
    time("pqEncode")(
      Similarity.pqEncode(emb, "vec_id", "embedding").queryExecution.toRdd.count())
    time("pqEncode again")(
      Similarity.pqEncode(emb, "vec_id", "embedding").queryExecution.toRdd.count())
    time("full audit")(
      Similarity.pqAdcAudit(emb, "vec_id", "embedding",
        col("vec_id") % 100 === 0).queryExecution.toRdd.count())
    time("full audit again")(
      Similarity.pqAdcAudit(emb, "vec_id", "embedding",
        col("vec_id") % 100 === 0).queryExecution.toRdd.count())
    spark.stop()
  }
}
