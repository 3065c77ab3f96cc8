package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.SketchStreaming.TokenEvent

/** Streaming Misra–Gries state: counters must carry ACROSS micro-batches
  * (a heavy item split over batches still survives) and stay bounded at
  * k−1 per key — the properties that make the sketch a viable unbounded-
  * stream monitor. */
class SketchStreamingSpec extends SparkSpec {
  test("heavy item split across micro-batches survives; state stays bounded") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TokenEvent]
    val q = SketchStreaming.heavyHitterCandidates(input.toDS(), k = 5)
      .writeStream.format("memory").queryName("mg")
      .outputMode("update").start()

    // batch 1: 40 hot + 30 distinct cold; batch 2: 40 more hot + 30 cold.
    // hot freq 80 of 140 > 140/5 — must survive; no batch alone makes it
    // heavy relative to the cold churn pressure applied in both batches
    input.addData(
      (Seq.fill(40)("hot") ++ (1 to 30).map("c1_" + _)).map(TokenEvent("g", _)): _*)
    q.processAllAvailable()
    input.addData(
      (Seq.fill(40)("hot") ++ (1 to 30).map("c2_" + _)).map(TokenEvent("g", _)): _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("mg").as[(String, Long, Seq[String])].collect()
      .filter(_._1 == "g").sortBy(_._2)
    assert(rows.map(_._2).toSeq == Seq(70L, 140L)) // n_seen accumulates
    val last = rows.last._3
    assert(last.contains("hot"))
    assert(last.size <= 4) // k-1 counters, stream length notwithstanding
  }

  test("hllRegisters: streaming complete-mode registers equal the batch build") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val q = graft.etl.Sketches.hllRegisters(input.toDF()
        .withColumnRenamed("value", "user_id"), "user_id")
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").start()
    val b1 = 0L until 400L
    val b2 = 300L until 900L // overlaps b1 — max must absorb, not add
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hllregs").as[(Long, Int)].collect().toMap
    val batch = graft.etl.Sketches.hllRegisters(
        (b1 ++ b2).toDF("user_id"), "user_id")
      .as[(Long, Int)].collect().toMap
    assert(streamed == batch,
      "register-wise max across micro-batches must equal the batch sketch")
    assert(batch.size <= 64)
  }
}
