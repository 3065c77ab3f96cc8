package graft

/** dev: drive the driver-contract entry() exactly as the driver does. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"ENTRY_ROWS=${rows.length}")
    df.show(20, false)
    spark.stop()
  }
}
