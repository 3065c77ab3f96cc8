package graft.dev

import graft.{Sessions, Tables}

object AnsiProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    import spark.implicits._
    val e = Tables.events(spark, "/root/repo/tmp/sf1.0").select($"user_id")
    println("max user: " + e.agg(org.apache.spark.sql.functions.max($"user_id")).head())
    try {
      val r = graft.etl.Sketches.hllCompare(e, "user_id").collect()
      println("hllCompare OK: " + r.head)
    } catch { case t: Throwable => println("hllCompare THROWS: " + t.getMessage.take(100)) }
    spark.stop()
  }
}
