package graft

/** dev: find queries whose top-level global Sort sits directly over a
  * SHUFFLE-FREE subtree — the shape where RangePartitioner's sample job
  * re-runs the entire pipeline once more before the sort runs it again
  * (no intermediate exchange for AQE to reuse). Reports the query plus
  * cost markers (udf/from_json/regexp/explode counts in the subtree) so
  * only genuinely expensive pipelines get the localCheckpoint barrier.
  * Args: [sfDir] (default sf0.001). */
object NarrowSortScan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    // AQE off so executedPlan is the fully-prepared plan WITH exchanges
    // (under AQE the wrapper's inputPlan predates exchange insertion and
    // everything scans as exchange-free)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    import org.apache.spark.sql.execution._
    def hasExchange(p: SparkPlan): Boolean = {
      var found = false
      p.foreach {
        case _: exchange.ShuffleExchangeLike => found = true
        case _ => ()
      }
      found
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val plan = qe.executedPlan
        // walk: global sorts whose child subtree is exchange-free but
        // contains real compute (not just a scan)
        var hits = List.empty[String]
        def walk(p: SparkPlan): Unit = p match {
          case s: SortExec if s.global =>
            // look THROUGH the sort's own range exchange: the pattern is
            // "no OTHER exchange below it" (the sample job then re-runs
            // the whole pipeline)
            def unwrap(p: SparkPlan): SparkPlan = p match {
              case w: WholeStageCodegenExec => unwrap(w.child)
              case i: InputAdapter => unwrap(i.child)
              case other => other
            }
            // look through the sort's OWN range exchange only
            val below = unwrap(s.child) match {
              case e: exchange.ShuffleExchangeLike => unwrap(e.child)
              case c => c
            }
            if (!hasExchange(below)) {
              val t = below.toString
              def c(m: String) = m + "=" + t.sliding(m.length).count(_ == m)
              hits ::= Seq(c("ScalaUDF"), c("from_json"), c("regexp_"),
                c("simhash"), c("Generate"), c("LocalTableScan"),
                c("Checkpoint")).mkString(",")
            }
            s.child.children.foreach(walk); ()
          case other => other.children.foreach(walk)
        }
        walk(plan match {
          case a: adaptive.AdaptiveSparkPlanExec => a.inputPlan
          case p => p
        })
        hits.foreach(h => println(s"NARROWSORT $name $h"))
      } catch { case e: Throwable =>
        println(s"NARROWSORT_ERR $name ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
