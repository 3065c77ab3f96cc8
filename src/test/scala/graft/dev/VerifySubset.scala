package graft

import java.nio.file.{Files, Paths}

/** dev: Verify.main for a named subset — args: sfDir outDir q1,q2,...
  * Writes only the listed queries' parquet + a filtered oracle_sql.json so
  * dev/check_oracle.py checks just those. */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val keep = names.split(",").toSet
    val spark = Sessions.local(8)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(k => keep(k._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(8).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(k => keep(k._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
