package graft.etl

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for expensive NARROW pipelines over small
  * inputs.
  *
  * Parquet is splittable only at row-group boundaries, and a table whose
  * file(s) hold fewer row groups than the session has cores runs every
  * scan-adjacent stage — schema-on-read parse, regex transform, per-doc
  * fingerprint kernels, image decode — in that many tasks, serializing
  * the map side however many cores exist (the driver's sf0.1 fixtures are
  * single-row-group files, so un-spread every such pipeline ran ONE-task
  * on local[32]; `spark.sql.files.minPartitionNum` cannot help because
  * byte-range splits of a single row group assign all rows to one split).
  *
  * `spread` inserts one cheap exchange of the RAW input (the narrow
  * pipeline's input is always the small side — raw rows, not the
  * expression-expanded output) ONLY when the planned scan has fewer
  * partitions than half the session's default parallelism. It is
  * scale-adaptive, not a local[32] constant: at production scale any real
  * table yields orders of magnitude more scan partitions than cores and
  * the rule is a no-op — exactly the posture the optimization guide asks
  * for (partitioning derived from input, never a pinned constant).
  * Round-robin repartition keeps Spark's sort-before-repartition
  * determinism (retried tasks reproduce the same row placement).
  */
object Parallelism {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val planned = df.queryExecution.toRdd.getNumPartitions
    if (target <= 1 || planned >= math.max(2, target / 2)) df
    else df.repartition(target)
  }
}
