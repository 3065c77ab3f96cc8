package graft.dev
object FullPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val p = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    println(p)
    spark.stop()
  }
}
