// dev tool: dump formatted plans for plan-shape inspection
// run: sbt "Test/runMain graft.ExplainPlans"
package graft

object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("q2_filter", "q3_join_agg", "q26_ngram_jaccard")
    names.foreach { n =>
      println(s"========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
