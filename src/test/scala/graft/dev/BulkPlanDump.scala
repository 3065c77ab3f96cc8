package graft

/** dev: dump formatted physical plans for many queries in ONE JVM —
  * args: sfDir outDir suffix q1,q2,...  Writes outDir/<name>_<suffix>.txt. */
object BulkPlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args
    val spark = Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      try {
        val p = SparkEntry.queries(n)(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), p)
        println(s"PLAN_OK $n")
      } catch { case e: Throwable => println(s"PLAN_ERR $n ${e.getMessage}") }
    }
    spark.stop()
  }
}
