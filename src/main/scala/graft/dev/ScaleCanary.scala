package graft.dev

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** Negative control for the 10x scale gate (`dev/scale_diff.py`): a
  * DELIBERATELY quadratic operator — events self-joined on the 5-value
  * event_type enum, so the pair count grows with the SQUARE of the row
  * count — timed at a 1x dir and a ScaleBench 10x dir, written in
  * graft.Bench's JSON shape. scale_diff.py over the two files must flag
  * SUPERLINEAR (~100x wall growth vs the <=6x linear ops read); if it
  * ever stops flagging, the gate itself broke, not the canary.
  *
  * This op must NEVER be promoted into SparkEntry.queries — it exists to
  * be the thing the lint and the sweep are built to catch.
  *
  * Usage: runMain graft.dev.ScaleCanary <1xDir> <NxDir> [suffix]
  *        python3 dev/scale_diff.py [--tier N] canary_<suffix>.json canary_1x.json
  * The optional suffix (default "10x") names the second output file, so
  * the 30x tier writes canary_30x.json from the same binary.
  */
object ScaleCanary {
  def main(args: Array[String]): Unit = {
    val (dir1, dir10) = (args(0), args(1))
    val suffix = if (args.length > 2) args(2) else "10x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(dir: String): Double = {
      val e = Tables.events(spark, dir)
        .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val t0 = System.nanoTime()
      // enum-key self-join: ~n^2/5 pairs, the textbook shape every
      // bucketed/banded pair engine in this repo exists to avoid
      e.as("a").join(e.as("b"), "event_type")
        .filter(abs(col("a.us") - col("b.us")) < 1000000L &&
          col("a.event_id") < col("b.event_id"))
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    run(dir1) // warmup (codegen + footer caching), same policy as Bench
    for ((dir, out) <- Seq((dir1, "canary_1x.json"),
        (dir10, s"canary_$suffix.json"))) {
      val t = run(dir)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        f"""{"total":$t%.3f,"timing":"toRdd","queries":{"canary_quadratic":$t%.3f}}""")
      println(f"[canary] $dir -> $t%.3f s")
    }
    spark.stop()
  }
}
