package graft.dev

import graft.Sessions

object AnsiProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    import spark.implicits._
    val df = Seq(9000001499L).toDF("k")
    try {
      val v = df.selectExpr("(k * 2654435761L) % 4294967296L as h").collect()
      println("expr path ok: " + v.head.getLong(0))
    } catch { case e: Throwable => println("expr path THROWS: " + e.getMessage.take(80)) }
    try {
      val v = df.select(($"k" * 2654435761L % 4294967296L).as("h")).collect()
      println("column path ok: " + v.head.getLong(0))
    } catch { case e: Throwable => println("column path THROWS: " + e.getMessage.take(80)) }
    spark.stop()
  }
}
