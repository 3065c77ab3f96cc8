package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.etl.Multimodal
import graft.etl.Multimodal.MediaRecord

/** Multimodal ingest on a stream: `Multimodal.extractFeatures` is a
  * mapPartitions over the opaque-payload rows (per-PARTITION codec init,
  * no aggregation state), so the SAME call runs per micro-batch on a
  * readStream — this spec pins batch/stream parity for the real PNG
  * decode path AND the stub fallback, across a micro-batch boundary.
  * This is the 100 TB ingest shape: media lands continuously, features
  * extract inline, and the downstream dedup/ANN ops consume the feature
  * column without knowing whether it arrived by batch or stream. */
class MultimodalStreamingSpec extends SparkSpec {

  test("extractFeatures: streaming append output equals the batch run " +
      "(decoded PNG + stub fallback, cross-batch)") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val png = Multimodal.syntheticPng(8, 6, gray = 120)
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val batch1 = Seq(
      MediaRecord(1L, "image", png, Some(8), Some(6), None),
      MediaRecord(2L, "video", junk, None, None, Some(1000L)))
    val batch2 = Seq(
      MediaRecord(3L, "image", Multimodal.syntheticPng(4, 4, gray = 10),
        Some(4), Some(4), None))

    val input = MemoryStream[MediaRecord]
    val q = Multimodal.extractFeatures(input.toDS())
      .writeStream.format("memory").queryName("mmfeat")
      .outputMode("append").start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("media_id"),
        r.getAs[String]("payload_sha"),
        Option(r.getAs[Integer]("decoded_width")).map(_.toInt),
        r.getAs[Seq[Float]]("feature").take(4))).toSet
    val streamed = key(spark.table("mmfeat").collect())
    val batch = key(Multimodal.extractFeatures(
      (batch1 ++ batch2).toDS()).toDF().collect())
    assert(streamed == batch, "stream and batch features must agree")
    // the PNG really decoded (dimensions present), the junk fell back
    val widths = spark.table("mmfeat").collect()
      .map(r => r.getAs[Long]("media_id") ->
        Option(r.getAs[Integer]("decoded_width"))).toMap
    assert(widths(1L).contains(8) && widths(3L).contains(4) &&
      widths(2L).isEmpty, widths.toString)
  }
}
