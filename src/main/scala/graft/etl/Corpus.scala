package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training pipelines: sequence packing,
  * context-window chunking, stratified sampling. All declarative column
  * expressions — the scale levers are the shard/stratum partitionings, so
  * each operator parallelizes by construction and never needs a global
  * ordering or a driver-side loop.
  */
object Corpus {

  /** Pack documents into training-sequence bins of roughly `budget`
    * tokens, the cumulative-sum formulation: docs are sharded (bins never
    * span shards, so packing parallelizes; shard count bounds per-task
    * state), ordered by id within their shard, and assigned bin
    * `⌊(cumsum − tokens) / budget⌋` — i.e. binned by START offset, so a
    * doc that straddles a budget boundary stays in the bin it started in
    * and that bin EXCEEDS the budget by up to that doc's length. Bins are
    * a grouping hint for the tokenizer stage, which owns hard truncation/
    * padding to the context window; a consumer needing a strict ≤ budget
    * guarantee must split the straddling doc itself.
    *
    * In exchange the packing is a pure window expression: one shuffle on
    * the shard key, no stateful scan (strict first-fit needs a
    * reset-on-overflow running state that windows can't express). Output:
    * id, tokens, shard, seq_in_shard (bin within the shard). */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shardCol: Column): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs.withColumn("shard", shardCol)
      .withColumn("_cum", sum(col(tokensCol).cast("long")).over(w))
      .withColumn("seq_in_shard",
        ((col("_cum") - col(tokensCol)) / budget).cast("long"))
      .drop("_cum")
  }

  /** Overlapping context-window chunks (RAG/pretraining shape): one row per
    * (doc, window) with `size`-char chunks every `stride` chars. Pure
    * generator — sequence + posexplode fans out within the partition, no
    * shuffle; empty docs produce no rows. */
  def chunkText(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size > 0, "size and stride must be positive")
    docs
      // Spark's sequence(0, -1, stride) throws where DuckDB's
      // generate_series returns empty — drop empty docs before generating
      .filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol),
        posexplode(sequence(lit(0), length(col(textCol)) - 1, lit(stride))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("start_pos"),
        col(textCol).substr(col("col") + 1, lit(size)).as("chunk"))
      .withColumn("chunk_len", length(col("chunk")))
      .withColumn("chunk_sha", sha2(col("chunk"), 256))
      .drop("chunk")
  }

  /** Stratified sample with deterministic per-stratum fractions
    * (`df.stat.sampleBy`): the training-mix lever — e.g. keep 100% of a
    * rare language, 5% of boilerplate. Seeded, so re-runs of the same
    * pipeline see the same sample; per-row Bernoulli, so it streams —
    * no per-stratum state or shuffle at all. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)
}
