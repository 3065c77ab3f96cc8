package graft.etl

import org.apache.spark.sql.functions._

/** dev: longest_run native expression vs the HOF fold it replaced. */
object LongestRunBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = spark.range(200000).select($"id",
      array_sort(transform(sequence(lit(1), lit(60)),
        i => concat(lit("w"), pmod($"id" * 31 + i, lit(40))))).as("arr"))
      .cache()
    df.count()
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      df.select(sum(c)).collect()
      val t0 = System.nanoTime()
      val s = df.select(sum(c).as("s")).collect().head.getLong(0)
      println(f"LRBENCH $label ${(System.nanoTime() - t0) / 1e9}%.2f sum=$s")
    }
    time("hof", Corpus.topRunLengthHof($"arr"))
    time("native", call_function("longest_run", $"arr"))
    spark.stop()
  }
}
