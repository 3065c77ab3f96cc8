package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults so Verify/Bench/tests agree.
  *
  * Scale notes: `shuffle.partitions` is sized to the local core count here;
  * on a real cluster this is AQE-coalesced anyway (`adaptive.enabled`). The
  * nanosAsLong flag is needed because the synthetic `events` table carries
  * ns-precision timestamps (see [[Tables.events]]).
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // pinned, not defaulted: the production skew posture is AQE runtime
      // splitting (SkewAqeSpec proves it engages and agrees with the
      // manual Skew.saltedJoin fallback); a Spark default flip must not
      // silently change the engine's behavior
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
