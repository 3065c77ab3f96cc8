package graft

/** Dev helper: print filtered formatted plans for named queries —
  * `runMain graft.PlanDump q243_target_encode,q251_hilbert` (all the
  * round-5 additions when no arg). Used to derive PlanShapeSpec pins. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Seq(
      "q243_target_encode", "q250_mutual_nn", "q251_hilbert",
      "q260_cramers_v", "q261_ols2"))
    for (n <- names) {
      val p = SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println("==== " + n)
      println(p.split("\n").filter(l => l.contains("Join") ||
        l.contains("hilbert") || l.contains("partial_") ||
        l.contains("ReadSchema") || l.contains("Cartesian"))
        .take(12).mkString("\n"))
    }
    spark.stop()
  }
}
