package graft
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
