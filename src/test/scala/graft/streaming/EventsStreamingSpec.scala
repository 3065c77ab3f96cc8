package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming specs driven by MemoryStream micro-batches: windowed agg
  * equals its batch twin; stateful per-user progress accumulates across
  * batches. */
class EventsStreamingSpec extends SparkSpec {

  import EventsStreaming.EventRow

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowed counts: streaming result matches the batch aggregation") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val rows = Seq(
      EventRow(1, ts("2026-01-01 10:00:00"), 1, "click", 1.25),
      EventRow(2, ts("2026-01-01 11:00:00"), 2, "click", 2.50),
      EventRow(3, ts("2026-01-02 09:00:00"), 1, "buy", 10.00))
    input.addData(rows: _*)

    val q = EventsStreaming.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win")
      .select($"window_start".cast("string"), $"event_type", $"n", $"sum_value")
      .collect().map(_.toSeq).toSet
    val batch = rows.toDF()
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(round($"value" * 100).cast("long")) / 100.0).as("sum_value"))
      .select($"window.start".cast("string"), $"event_type", $"n", $"sum_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.size == 2)
  }

  test("transitionsStream: cross-batch transitions match the batch twin") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.TransRow
    val input = MemoryStream[TransRow]
    val batch1 = Seq(
      TransRow(1, ts("2026-01-01 10:00:00"), "view"),
      TransRow(1, ts("2026-01-01 10:05:00"), "click"),
      TransRow(2, ts("2026-01-01 10:00:00"), "view"))
    val batch2 = Seq(
      // user 1's purchase follows the click from the PREVIOUS batch
      TransRow(1, ts("2026-01-01 10:10:00"), "purchase"),
      TransRow(2, ts("2026-01-01 10:20:00"), "click"))

    input.addData(batch1: _*)
    val q = EventsStreaming.transitionsStream(input.toDF())
      .writeStream.format("memory").queryName("trans").outputMode("append").start()
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("trans")
      .groupBy($"prev_type", $"curr_type").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    val batch = graft.etl.Events.transitionCounts(
        (batch1 ++ batch2).toDF(), "user_id", "event_type", "ts")
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set(("view", "click", 2L), ("click", "purchase", 1L)))
  }

  test("stream-static join enriches events with a broadcast dimension") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventsStreaming.EventRow]
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val q = EventsStreaming.enriched(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    input.addData(
      EventsStreaming.EventRow(1, ts("2026-01-01 10:00:00"), 7, "click", 1.0),
      EventsStreaming.EventRow(2, ts("2026-01-01 10:00:01"), 9, "click", 1.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enr").select("user_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(7L -> Some("gold"), 9L -> None))
  }

  test("mergeUpsertSink: each micro-batch runs the batch MERGE path (K2 parity)") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:streamupsert;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute("""CREATE TABLE sprod (
      "shop_type" VARCHAR(16) NOT NULL, "external_id" VARCHAR(32) NOT NULL,
      "title" VARCHAR(128), "current_price" DOUBLE,
      "updated_at" TIMESTAMP, PRIMARY KEY ("shop_type", "external_id"))""")
    conn.close()
    val props = new java.util.Properties()
    props.setProperty("createTableColumnTypes",
      "shop_type VARCHAR(16), external_id VARCHAR(32), title VARCHAR(128)")

    val input = MemoryStream[(String, String, String, Double)]
    val ckpt = java.nio.file.Files.createTempDirectory("merge-sink-ckpt").toString
    val q = EventsStreaming.mergeUpsertSink(
      input.toDF().toDF("shop_type", "external_id", "title", "current_price"),
      url, props, "sprod", Seq("shop_type", "external_id"), ckpt,
      nowExpr = "CURRENT_TIMESTAMP")

    // batch 1 inserts two rows; batch 2 updates one and inserts another
    input.addData(("AH", "1", "First", 1.00), ("AH", "2", "Second", 2.00))
    q.processAllAvailable()
    input.addData(("AH", "1", "First v2", 1.25), ("AH", "3", "Third", 3.00))
    q.processAllAvailable()
    q.stop()

    val conn2 = java.sql.DriverManager.getConnection(url)
    val rs = conn2.createStatement().executeQuery(
      """SELECT "external_id", "title", "current_price" FROM sprod ORDER BY "external_id"""")
    val rows = Iterator.continually(rs).takeWhile(_.next())
      .map(r => (r.getString(1), r.getString(2), r.getDouble(3))).toList
    conn2.close()
    assert(rows == List(("1", "First v2", 1.25), ("2", "Second", 2.0), ("3", "Third", 3.0)))
  }

  test("sessionizedCounts: streaming sessions match the batch sessionize twin") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    // user 7: two events 10 min apart (one session), then a 2h gap (new
    // session); user 8: one event
    val rows = Seq(
      EventRow(1, ts("2026-01-01 10:00:00"), 7, "click", 1.0),
      EventRow(2, ts("2026-01-01 10:10:00"), 7, "click", 1.0),
      EventRow(3, ts("2026-01-01 12:30:00"), 7, "buy", 5.0),
      EventRow(4, ts("2026-01-01 10:05:00"), 8, "click", 1.0))
    input.addData(rows: _*)

    val q = EventsStreaming.sessionizedCounts(input.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("sess")
      .select($"user_id", $"session_start".cast("string"),
        $"session_end".cast("string"), $"n_events")
      .collect().map(_.toSeq).toSet
    val batch = graft.etl.TimeJoins
      .sessionize(rows.toDF(), "user_id", "ts", "30 minutes")
      .select($"user_id", $"session_start".cast("string"),
        $"session_end".cast("string"), $"n_events")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.size == 3)
    assert(streamed.exists { s => s.head == 7L && s.last == 2L })
  }

  test("dedupedStream drops within-watermark duplicates across micro-batches") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val input = MemoryStream[EventRow]
    val q = EventsStreaming.dedupedStream(input.toDF(), "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()

    val a = EventRow(1, ts("2026-01-01 10:00:00"), 7, "click", 1.0)
    val b = EventRow(2, ts("2026-01-01 10:01:00"), 8, "click", 2.0)
    input.addData(a, b)
    q.processAllAvailable()
    // same content again in a later micro-batch, within the watermark
    input.addData(a)
    q.processAllAvailable()
    input.addData(EventRow(3, ts("2026-01-01 10:02:00"), 9, "buy", 3.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup").select($"event_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("purchaseAttribution: stream-stream join honors the 1-hour range") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventRow]
    val purchases = MemoryStream[EventRow]
    val q = EventsStreaming.purchaseAttribution(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr").outputMode("append").start()

    clicks.addData(
      EventRow(1, ts("2026-01-01 09:30:00"), 7, "click", 0.0),  // in range
      EventRow(2, ts("2026-01-01 08:00:00"), 7, "click", 0.0),  // too old
      EventRow(3, ts("2026-01-01 09:45:00"), 8, "click", 0.0))  // other user
    purchases.addData(
      EventRow(10, ts("2026-01-01 10:00:00"), 7, "purchase", 25.0))
    q.processAllAvailable()
    // a click AFTER the purchase must not attribute
    clicks.addData(EventRow(4, ts("2026-01-01 10:30:00"), 7, "click", 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attr")
      .select($"purchase_id", $"click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((10L, 1L)))
  }

  test("userProgress state accumulates across micro-batches") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    // stateful queries otherwise schedule endless state-cleanup no-data
    // batches, so processAllAvailable would never latch
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val input = MemoryStream[EventRow]
    val q = EventsStreaming.userProgress(input.toDF())
      .writeStream.format("memory").queryName("prog").outputMode("update").start()

    input.addData(EventRow(1, ts("2026-01-01 10:00:00"), 7, "click", 1.00))
    q.processAllAvailable()
    input.addData(EventRow(2, ts("2026-01-01 10:01:00"), 7, "click", 2.00))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("prog").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Long]("total_cents")))
    // update mode appends one row per batch; the final state must show both events
    assert(last.contains((7L, 2L, 300L)))
  }

  test("locfStream carries the last observation across micro-batches") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.ObsRow
    val input = MemoryStream[ObsRow]
    val q = EventsStreaming.locfStream(input.toDF())
      .writeStream.format("memory").queryName("locf").outputMode("append").start()

    // batch 1: leading null, an observation, a null to fill within-batch
    input.addData(ObsRow(7, 1, None), ObsRow(7, 2, Some(10L)),
      ObsRow(7, 3, None), ObsRow(9, 1, None))
    q.processAllAvailable()
    // batch 2: null fills from state carried ACROSS the batch boundary
    input.addData(ObsRow(7, 4, None), ObsRow(7, 5, Some(20L)),
      ObsRow(9, 2, Some(1L)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("locf").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("seq"),
        Option(r.getAs[java.lang.Long]("value")).map(_.longValue))).toSet
    assert(out == Set(
      (7L, 1L, None), (7L, 2L, Some(10L)), (7L, 3L, Some(10L)),
      (7L, 4L, Some(10L)), (7L, 5L, Some(20L)),
      (9L, 1L, None), (9L, 2L, Some(1L))))
  }

  test("trailingCountStream: cross-batch window counts match the batch twin") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.PitRow
    val input = MemoryStream[PitRow]
    val q = EventsStreaming.trailingCountStream(input.toDF(), windowUs = 15L)
      .writeStream.format("memory").queryName("pit").outputMode("append").start()

    // batch 1: clicks at 10, 20 and a purchase at 25 → [10,25) = 2
    input.addData(PitRow(1, 900, 10, true), PitRow(1, 901, 20, true),
      PitRow(1, 100, 25, false))
    q.processAllAvailable()
    // batch 2: purchase at 30 counts batch-1 clicks from state ([15,30) =
    // {20}); a click at 30 then a purchase at 31 → [16,31) = {20,30};
    // user 2 with no clicks → 0
    input.addData(PitRow(1, 101, 30, false), PitRow(1, 902, 30, true),
      PitRow(1, 102, 31, false), PitRow(2, 103, 50, false))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("pit").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("trail_cnt")))
      .toMap
    assert(got == Map(100L -> 2L, 101L -> 1L, 102L -> 2L, 103L -> 0L))

    // batch twin on the identical rows
    val all = Seq((1L, 900L, 10L, true), (1L, 901L, 20L, true),
      (1L, 100L, 25L, false), (1L, 101L, 30L, false),
      (1L, 902L, 30L, true), (1L, 102L, 31L, false),
      (2L, 103L, 50L, false)).toDF("k", "id", "t", "c")
    val batch = graft.etl.TimeJoins.trailingCount(
        all.filter(!$"c").select($"k", $"id", $"t"),
        all.filter($"c").select($"k", $"t"), "k", "id", "t", "t", 15L)
      .select($"id", $"trail_cnt").as[(Long, Long)].collect().toMap
    assert(batch == got, "streaming and batch twins must agree")
  }

  test("prefixHitStream: cross-batch cache hits match the batch twin") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.ReqRow
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[ReqRow]
    val q = EventsStreaming.prefixHitStream(input.toDF(), horizonUs = 100L)
      .writeStream.format("memory").queryName("kvhits").outputMode("append")
      .start()

    // batch 1: first occurrence misses; delta 50 hits; same-us smaller-id
    // predecessor hits at distance 0
    input.addData(ReqRow("p", 0L, 1L), ReqRow("p", 50L, 2L),
      ReqRow("q", 50L, 3L), ReqRow("q", 50L, 4L))
    q.processAllAvailable()
    // batch 2: state carries last-seen across the boundary — delta
    // exactly H hits, delta > H misses (but refreshes the entry), and the
    // refreshed entry serves a later request
    input.addData(ReqRow("p", 150L, 5L), ReqRow("q", 200L, 6L),
      ReqRow("q", 260L, 7L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("kvhits").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("hit")).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true,
      5L -> true, 6L -> false, 7L -> true), got)

    // batch twin on the identical rows
    val all = Seq(("p", 0L, 1L), ("p", 50L, 2L), ("q", 50L, 3L),
      ("q", 50L, 4L), ("p", 150L, 5L), ("q", 200L, 6L), ("q", 260L, 7L))
      .toDF("pfx", "us", "id")
    val batch = graft.etl.Inference.prefixHitRate(all, col("pfx"), "us",
        "id", 100L)
      .select($"id", $"hit").as[(Long, Boolean)].collect().toMap
    assert(batch == got, "streaming and batch twins must agree")
  }

  test("rejectionYieldStream: finalized panes match the batch yield table") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = EventsStreaming.rejectionYieldStream(input.toDF(),
        taus = Seq(100L, 300L), windowLen = "1 hour",
        watermark = "1 minute")
      .writeStream.format("memory").queryName("ryield")
      .outputMode("append").start()
    // pane 10:00-11:00, arm 'view': cents {100, 250, 400}
    input.addData(
      EventRow(1, ts("2026-01-01 10:00:00"), 1, "view", 1.00),
      EventRow(2, ts("2026-01-01 10:20:00"), 1, "view", 2.50),
      EventRow(3, ts("2026-01-01 10:40:00"), 1, "view", 4.00))
    q.processAllAvailable()
    // two closing batches finalize the pane (committed-watermark lag)
    input.addData(EventRow(8, ts("2026-01-01 12:30:00"), 1, "view", 1.0))
    q.processAllAvailable()
    input.addData(EventRow(9, ts("2026-01-01 13:30:00"), 1, "view", 1.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ryield")
      .filter($"w_start" === ts("2026-01-01 10:00:00"))
      .select($"tau", $"n_drawn", $"n_kept", $"keep_bp")
      .as[(Long, Long, Long, Long)].collect().toSet
    // tau=100: all three clear (100 >= 100); tau=300: only 400
    assert(got == Set((100L, 3L, 3L, 10000L), (300L, 3L, 1L, 3333L)), got)

    // batch twin over the pane's rows
    val pane = Seq(("view", 100L, 1L), ("view", 250L, 1L),
      ("view", 400L, 1L)).toDF("arm", "c", "k")
    val batch = graft.etl.Preference.rejectionYield(pane, "arm", "c", "k",
        taus = Seq(100L, 300L))
      .select($"tau", $"n_drawn", $"n_kept", $"keep_bp")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch == got, "streaming pane and batch table must agree")
  }

  test("lshCandidateStream: cross-batch bucket pairs match the batch " +
      "self-join; over-cap buckets freeze") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.BandRow
    val input = MemoryStream[BandRow]
    val q = EventsStreaming.lshCandidateStream(input.toDF(), maxBucket = 3)
      .writeStream.format("memory").queryName("lshcand")
      .outputMode("append").start()
    // batch 1: bucket (0, 7) collects ids 1, 2 -> pair (1,2);
    // bucket (1, 9) has a single member -> nothing
    input.addData(BandRow(0, 7L, 1L), BandRow(0, 7L, 2L),
      BandRow(1, 9L, 5L))
    q.processAllAvailable()
    // batch 2: id 3 joins bucket (0,7) across the boundary -> pairs
    // (1,3), (2,3); the bucket is now AT cap (3 members)
    input.addData(BandRow(0, 7L, 3L), BandRow(1, 9L, 6L))
    q.processAllAvailable()
    // batch 3: id 4 would exceed the cap -> frozen, no pairs; a
    // duplicate re-ingest of id 2 is ignored
    input.addData(BandRow(0, 7L, 4L), BandRow(0, 7L, 2L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("lshcand")
      .select($"id_a", $"id_b", $"band").as[(Long, Long, Int)]
      .collect().toSet
    assert(got == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0),
      (5L, 6L, 1)), got)

    // batch twin over the same rows RESTRICTED to the never-over-cap
    // scope (the documented parity boundary): the (band,bucket)
    // self-join on distinct members
    val rows = Seq((0, 7L, 1L), (0, 7L, 2L), (1, 9L, 5L), (0, 7L, 3L),
      (1, 9L, 6L)).toDF("band", "bucket", "id").distinct()
    val batch = rows.as("a").join(rows.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), col("a.band"))
      .as[(Long, Long, Int)].collect().toSet
    assert(batch == got, "streaming and batch candidate sets must agree")
  }

  test("fifoReplayStream: cross-batch Lindley replay matches the batch twin") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.SrvRow
    val input = MemoryStream[SrvRow]
    val q = EventsStreaming.fifoReplayStream(input.toDF())
      .writeStream.format("memory").queryName("fifo").outputMode("append")
      .start()
    // batch 1, key a: r1 arrives at 0 (serves 0-10), r2 at 5 queues
    // behind it (starts 10, waits 5), r3 at 30 finds the server idle
    input.addData(SrvRow("a", 0L, 1L, 10L), SrvRow("a", 5L, 2L, 10L),
      SrvRow("a", 30L, 3L, 5L), SrvRow("b", 0L, 4L, 100L))
    q.processAllAvailable()
    // batch 2: key a's server is idle since 35; key b's request queues
    // behind the 100-us job that started at 0 (waits 100 - 10 = 90)
    input.addData(SrvRow("a", 40L, 5L, 1L), SrvRow("b", 10L, 6L, 20L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("fifo").collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("c_us"), r.getAs[Long]("wait_us"))).toMap
    assert(got == Map(1L -> (10L, 0L), 2L -> (20L, 5L), 3L -> (35L, 0L),
      4L -> (100L, 0L), 5L -> (41L, 0L), 6L -> (120L, 90L)), got)

    // batch twin on the identical rows
    val all = Seq(("a", 0L, 1L, 10L), ("a", 5L, 2L, 10L),
      ("a", 30L, 3L, 5L), ("b", 0L, 4L, 100L), ("a", 40L, 5L, 1L),
      ("b", 10L, 6L, 20L)).toDF("key", "us", "id", "service_us")
    val batch = graft.etl.Inference.fifoReplay(all, Seq("key"), "us",
        "id", "service_us")
      .select($"id", $"c_us", $"wait_us").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(batch == got, "streaming and batch twins must agree")
  }

  test("degradationStream: watermark-closed minute tiers match the batch " +
      "classification at the same mean") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = EventsStreaming.degradationStream(input.toDF(),
        meanPerMinute = 2L, watermark = "1 minute")
      .writeStream.format("memory").queryName("ladder")
      .outputMode("append").start()
    // minute 10:00 has 2 events (full), 10:01 has 3 (degraded, <= 2x),
    // 10:02 has 5 (shed)
    input.addData(
      EventRow(1, ts("2026-01-01 10:00:05"), 1, "view", 1.0),
      EventRow(2, ts("2026-01-01 10:00:40"), 1, "view", 1.0),
      EventRow(3, ts("2026-01-01 10:01:10"), 1, "view", 1.0),
      EventRow(4, ts("2026-01-01 10:01:20"), 1, "view", 1.0),
      EventRow(5, ts("2026-01-01 10:01:30"), 1, "view", 1.0))
    q.processAllAvailable()
    input.addData((0 until 5).map(i =>
      EventRow(10 + i, ts(f"2026-01-01 10:02:${i * 10}%02d"), 1,
        "view", 1.0)): _*)
    q.processAllAvailable()
    // watermark jump closes the three panes under test; each closing
    // BATCH advances the committed watermark one step (a repeated
    // processAllAvailable with no new data creates no batch), so chain
    // two closers — their own panes may or may not have closed when the
    // query stops, which is why the assertion below is exact on the
    // panes under test and rule-based on any closer panes
    input.addData(EventRow(99, ts("2026-01-01 11:00:00"), 1, "view", 1.0))
    q.processAllAvailable()
    input.addData(EventRow(100, ts("2026-01-01 11:30:00"), 1, "view", 1.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ladder")
      .select($"minute_start", $"n_m", $"tier")
      .as[(java.sql.Timestamp, Long, String)].collect()
      .map(t => t._1.toString -> (t._2, t._3)).toMap
    val expected = Map(
      "2026-01-01 10:00:00.0" -> (2L, "full"),
      "2026-01-01 10:01:00.0" -> (3L, "degraded"),
      "2026-01-01 10:02:00.0" -> (5L, "shed"))
    assert(expected.forall { case (k, v) => got.get(k).contains(v) }, got)
    // every emitted pane (including any closed closer pane) matches the
    // batch classification rule at the same mean — the parity claim
    assert(got.values.forall { case (n, tier) =>
      tier == (if (n <= 2) "full" else if (n <= 4) "degraded" else "shed")
    }, got)
  }

  test("clampedBalanceStream: cross-batch balance matches the batch twin") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.BalRow
    val input = MemoryStream[BalRow]
    val q = EventsStreaming.clampedBalanceStream(input.toDF())
      .writeStream.format("memory").queryName("bal").outputMode("append").start()

    // batch 1: +2, -5 (clamps to 0), +4 -> balances 2, 0, 4
    input.addData(BalRow(1, 1, 10, 2), BalRow(1, 2, 11, -5),
      BalRow(1, 3, 12, 4))
    q.processAllAvailable()
    // batch 2: carries balance 4 across the boundary: -6 clamps to 0,
    // +3 -> 3; user 2 starts fresh: -7 clamps to 0
    input.addData(BalRow(1, 4, 13, -6), BalRow(1, 5, 14, 3),
      BalRow(2, 1, 20, -7))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("bal").collect()
      .map(r => ((r.getAs[Long]("user_id"), r.getAs[Long]("event_id")),
        r.getAs[Long]("balance"))).toMap
    assert(got == Map((1L, 10L) -> 2L, (1L, 11L) -> 0L, (1L, 12L) -> 4L,
      (1L, 13L) -> 0L, (1L, 14L) -> 3L, (2L, 20L) -> 0L))

    // batch twin on the identical rows
    val all = Seq((1L, 1L, 10L, 2L), (1L, 2L, 11L, -5L), (1L, 3L, 12L, 4L),
      (1L, 4L, 13L, -6L), (1L, 5L, 14L, 3L), (2L, 1L, 20L, -7L))
      .toDF("user_id", "us", "event_id", "delta")
    val batch = graft.etl.Stats.clampedBalance(
        all, "user_id", Seq("us", "event_id"), "delta")
      .select($"user_id", $"event_id", $"balance")
      .as[(Long, Long, Long)].collect()
      .map { case (u, id, b) => ((u, id), b) }.toMap
    assert(batch == got, "streaming and batch twins must agree")
  }

  test("burstStream: cross-batch baseline matches the batch twin") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.DailyRow
    val input = MemoryStream[DailyRow]
    val q = EventsStreaming.burstStream(input.toDF(), n = 3)
      .writeStream.format("memory").queryName("burst")
      .outputMode("append").start()

    // batch 1: 3 quiet days — all cold-start NULL baselines
    input.addData(DailyRow("g", 1, 10), DailyRow("g", 2, 9),
      DailyRow("g", 3, 11))
    q.processAllAvailable()
    // batch 2: day 4 spikes vs the cross-batch median 10 (16*2 >= 10*3);
    // day 5 is quiet vs median over {9,11,16} = 11 (10*2 < 11*3)
    input.addData(DailyRow("g", 4, 16), DailyRow("g", 5, 10))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("burst").collect()
      .map(r => (r.getAs[Long]("d"),
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getAs[Boolean]("burst")))).toMap
    assert(got == Map(1L -> (None, false), 2L -> (None, false),
      3L -> (None, false), 4L -> (Some(10L), true),
      5L -> (Some(11L), false)))

    // batch twin on the identical daily rows
    val all = Seq(("g", 1L, 10L), ("g", 2L, 9L), ("g", 3L, 11L),
      ("g", 4L, 16L), ("g", 5L, 10L)).toDF("k", "d", "cnt")
    val batch = graft.etl.Series.burstDays(all, "k", "d", "cnt", n = 3)
      .collect()
      .map(r => (r.getAs[Long]("d"),
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getAs[Boolean]("burst")))).toMap
    assert(batch == got, "streaming and batch twins must agree")
  }

  test("debounceStream: cross-batch gap filter matches the batch lag rule") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.DebRow
    val input = MemoryStream[DebRow]
    val q = EventsStreaming.debounceStream(input.toDF(), gapUs = 10L)
      .writeStream.format("memory").queryName("deb").outputMode("append").start()

    // batch 1: first kept; +5 dropped; +15 kept (gap from PREVIOUS event,
    // kept or not)
    input.addData(DebRow(1, "c", 100, 1), DebRow(1, "c", 105, 2),
      DebRow(1, "c", 120, 3))
    q.processAllAvailable()
    // batch 2: 8us after batch-1's last event -> dropped ACROSS the
    // boundary; other type keys are independent
    input.addData(DebRow(1, "c", 128, 4), DebRow(1, "c", 200, 5),
      DebRow(1, "v", 129, 6))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("deb").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("kept")).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> true, 6L -> true))

    // batch twin: the q232 lag-over-all rule on the identical rows
    val all = Seq((1L, "c", 100L, 1L), (1L, "c", 105L, 2L),
      (1L, "c", 120L, 3L), (1L, "c", 128L, 4L), (1L, "c", 200L, 5L),
      (1L, "v", 129L, 6L)).toDF("user_id", "event_type", "us", "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_type").orderBy($"us", $"event_id")
    val batch = all.withColumn("kept",
        coalesce($"us" - lag($"us", 1).over(w) > 10L, lit(true)))
      .select($"event_id", $"kept")
      .as[(Long, Boolean)].collect().toMap
    assert(batch == got, "streaming and batch twins must agree")
  }

  test("tokenBucketStream: refill/cap/deny matches a sequential fold") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.TbRow
    val input = MemoryStream[TbRow]
    // capacity 10, 2 tokens/sec
    val q = EventsStreaming.tokenBucketStream(input.toDF(),
        capacity = 10L, ratePerSec = 2L)
      .writeStream.format("memory").queryName("tb").outputMode("append").start()

    // batch 1 (user 1): full bucket pays 8 (->2); +1s refills 2 (->4),
    // cost 6 denied (4 stays); cost 4 allowed (->0)
    input.addData(TbRow(1, 0L, 1, 8), TbRow(1, 1000000L, 2, 6),
      TbRow(1, 1000000L, 3, 4))
    q.processAllAvailable()
    // batch 2: +100s refills past the cap (clamps to 10), pays 10 (->0);
    // state carried across the boundary
    input.addData(TbRow(1, 101000000L, 4, 10))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tb").collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Boolean]("allowed"), r.getAs[Long]("tokens_after")))).toMap
    assert(got == Map(1L -> ((true, 2L)), 2L -> ((false, 4L)),
      3L -> ((true, 0L)), 4L -> ((true, 0L))))

    // sequential-fold twin over the identical rows (the recurrence has no
    // closed window form — min AND max clamps)
    val rows = Seq((0L, 1L, 8L), (1000000L, 2L, 6L), (1000000L, 3L, 4L),
      (101000000L, 4L, 10L))
    var tokens = 10L; var last = Long.MinValue
    val folded = rows.map { case (us, id, cost) =>
      val refill = if (last == Long.MinValue) 0L else (us - last) * 2L / 1000000L
      tokens = math.min(10L, tokens + refill)
      val ok = tokens >= cost
      if (ok) tokens -= cost
      last = us
      id -> ((ok, tokens))
    }.toMap
    assert(folded == got, "streaming and sequential fold must agree")
  }

  test("asofJoinStream: cross-batch as-of matches the batch twin") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.{AsofProbe, AsofQuote}
    val probes = MemoryStream[AsofProbe]
    val quotes = MemoryStream[AsofQuote]
    val q = EventsStreaming.asofJoinStream(probes.toDF(), quotes.toDF())
      .writeStream.format("memory").queryName("asof").outputMode("append").start()

    // batch 1: probe before any quote (no match); quote at 10; two quotes
    // at us=20 (max pick must win); probe exactly AT a quote time (<=).
    // Quotes are added BEFORE probes: the running query may slice the two
    // adds into separate micro-batches, and quote-then-probe yields the
    // same output either way (equal-us quotes apply first in-batch, and
    // the us<= state guard covers the split-batch case).
    quotes.addData(AsofQuote(1, 10, 7), AsofQuote(1, 20, 3),
      AsofQuote(1, 20, 9), AsofQuote(2, 15, 42))
    probes.addData(AsofProbe(1, 5, 100), AsofProbe(1, 20, 101))
    q.processAllAvailable()
    // batch 2: probes match quotes carried from the PREVIOUS batch; a new
    // quote then supersedes for the later probe
    quotes.addData(AsofQuote(1, 24, 11))
    probes.addData(AsofProbe(1, 25, 102), AsofProbe(2, 30, 200),
      AsofProbe(3, 30, 300))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("asof").collect()
      .map(r => ((r.getAs[Long]("key"), r.getAs[Long]("probe_id")),
        Option(r.getAs[Any]("asof_pick")).map(_.asInstanceOf[Long]))).toMap
    assert(got == Map(
      (1L, 100L) -> None,      // before first quote
      (1L, 101L) -> Some(9L),  // equal-time quote applies; max of the tie
      (1L, 102L) -> Some(11L), // batch-2 quote supersedes batch-1 state
      (2L, 200L) -> Some(42L), // quote carried across the batch boundary
      (3L, 300L) -> None))     // key with no quotes at all

    // batch twin on the identical rows (probe rows keep their columns,
    // quote picks land in asof_pick with the same <=/max-tie semantics)
    val pAll = Seq((1L, 5L, 100L), (1L, 20L, 101L), (1L, 25L, 102L),
      (2L, 30L, 200L), (3L, 30L, 300L)).toDF("key", "us", "probe_id")
    val qAll = Seq((1L, 10L, 7L), (1L, 20L, 3L), (1L, 20L, 9L),
      (2L, 15L, 42L), (1L, 24L, 11L)).toDF("key", "us", "pick")
    val batch = graft.etl.TimeJoins.asofJoin(
        pAll, qAll, "key", "us", "us", "pick")
      .collect()
      .map(r => ((r.getAs[Long]("key"), r.getAs[Long]("probe_id")),
        Option(r.getAs[Any]("asof_pick")).map(_.asInstanceOf[Long]))).toMap
    assert(batch == got, "streaming and batch twins must agree")
  }
  test("sessionAggStream: sessions merge across micro-batches, emit when final") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.EventRow
    val input = MemoryStream[EventRow]
    val q = EventsStreaming.sessionAggStream(input.toDF(),
        gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    input.addData(
      EventRow(1, ts("2026-01-01 10:00:00"), 1, "view", 1.00),
      EventRow(2, ts("2026-01-01 10:00:00"), 2, "view", 2.00))
    q.processAllAvailable()
    // extends user 1's OPEN session across the micro-batch boundary
    input.addData(EventRow(3, ts("2026-01-01 10:20:00"), 1, "click", 0.50))
    q.processAllAvailable()
    // far-future event advances the watermark past every open session;
    // finalized rows emit on the FOLLOWING trigger, so push one more batch
    input.addData(EventRow(4, ts("2026-01-01 13:00:00"), 9, "view", 0.0))
    q.processAllAvailable()
    input.addData(EventRow(5, ts("2026-01-01 13:05:00"), 9, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess")
      .select($"user_id", $"session_start".cast("string"),
        $"session_end".cast("string"), $"n_events", $"cents")
      .collect().map(_.toSeq).toSet
    // user 1: ONE merged session 10:00 -> 10:50, not two
    assert(rows.contains(
      Seq(1L, "2026-01-01 10:00:00", "2026-01-01 10:50:00", 2L, 150L)))
    assert(rows.contains(
      Seq(2L, "2026-01-01 10:00:00", "2026-01-01 10:30:00", 1L, 200L)))
    assert(!rows.exists(_.head == 9L)) // still open -> not emitted yet
  }

  test("dedupStream: first arrival survives, in-horizon duplicates drop, " +
    "post-horizon repeat re-admits") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    val q = EventsStreaming.dedupStream(
        input.toDF().withColumn("content_key", col("event_type")),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    input.addData(
      EventRow(1, ts("2026-01-01 10:00:00"), 1, "alpha", 1.0),
      EventRow(2, ts("2026-01-01 10:01:00"), 2, "alpha", 2.0), // dup, drops
      EventRow(3, ts("2026-01-01 10:02:00"), 3, "beta", 3.0))
    q.processAllAvailable()
    // same key again INSIDE the horizon of the state -> still dropped
    input.addData(EventRow(4, ts("2026-01-01 10:05:00"), 4, "alpha", 4.0))
    q.processAllAvailable()
    // watermark jumps far ahead; alpha's state evicts, a later repeat
    // re-admits (the documented horizon contract). The watermark a batch
    // COMMITS only takes effect on the NEXT trigger, so push one more
    // batch before the repeat — without it the eviction races the repeat
    // and the test flakes with suite-order timing.
    input.addData(EventRow(5, ts("2026-01-01 12:00:00"), 5, "gamma", 5.0))
    q.processAllAvailable()
    input.addData(EventRow(7, ts("2026-01-01 12:00:30"), 7, "delta", 7.0))
    q.processAllAvailable()
    input.addData(EventRow(6, ts("2026-01-01 12:01:00"), 6, "alpha", 6.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup").select($"event_id").as[Long]
      .collect().toSet
    assert(got == Set(1L, 3L, 5L, 6L, 7L), got)
  }

  test("funnelStream: ordered stages, cross-batch completion, and " +
      "event-time abandonment") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.FunnelRow
    val input = MemoryStream[FunnelRow]
    val q = EventsStreaming.funnelStream(input.toDF(),
        stages = Seq("view", "click", "purchase"), gap = "30 minutes",
        watermark = "1 minute")
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    input.addData(
      // u1 runs view->click; the purchase lands in the NEXT batch
      FunnelRow(1, ts("2026-01-01 10:00:00"), "view"),
      FunnelRow(1, ts("2026-01-01 10:01:00"), "click"),
      // u2 clicks FIRST (out of order: must not count), then views
      FunnelRow(2, ts("2026-01-01 10:00:00"), "click"),
      FunnelRow(2, ts("2026-01-01 10:02:00"), "view"),
      // u5 never matches stage 0: must hold NO state and never emit a
      // depth-0 abandoned row, even after the watermark passes its ts
      FunnelRow(5, ts("2026-01-01 10:00:30"), "scroll"))
    q.processAllAvailable()
    input.addData(FunnelRow(1, ts("2026-01-01 10:05:00"), "purchase"))
    q.processAllAvailable()
    // u1 completed last batch; this unrelated follow-up must not re-open
    // state (no later depth-0 abandonment for u1)
    input.addData(FunnelRow(1, ts("2026-01-01 10:06:00"), "scroll"))
    q.processAllAvailable()
    // event time jumps 2h: u2 (idle since 10:02 at depth 1) times out;
    // one extra batch so the committed watermark takes effect
    input.addData(FunnelRow(9, ts("2026-01-01 12:30:00"), "view"))
    q.processAllAvailable()
    input.addData(FunnelRow(9, ts("2026-01-01 12:31:00"), "click"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel")
      .select($"user_id", $"depth", $"completed", $"abandoned")
      .as[(Long, Long, Boolean, Boolean)].collect().toSet
    assert(got == Set((1L, 3L, true, false), (2L, 1L, false, true)), got)
  }

  test("burnRateStream: only panes over the threshold emit, once, " +
      "after the watermark closes them") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRow]
    // 5-minute panes slid by 5 minutes over a 10-minute stretch with a
    // concentrated error burst: pane [10:00,10:05) has 1 error / 3
    // events (3333bp >= 2000bp: alerts), pane [10:05,10:10) has 1/10
    // (1000bp: silent)
    val q = EventsStreaming.burnRateStream(input.toDF(),
        thresholdBp = 2000, windowLen = "5 minutes", slide = "5 minutes",
        watermark = "1 minute")
      .writeStream.format("memory").queryName("burn")
      .outputMode("append").start()
    input.addData(
      EventRow(1, ts("2026-01-01 10:00:10"), 1, "view", 1.0),
      EventRow(2, ts("2026-01-01 10:01:00"), 1, "error", 1.0),
      EventRow(3, ts("2026-01-01 10:04:00"), 1, "view", 1.0))
    q.processAllAvailable()
    input.addData((0 until 10).map(i =>
      EventRow(10 + i, ts(f"2026-01-01 10:05:${i * 5}%02d"), 1,
        if (i == 0) "error" else "view", 1.0)): _*)
    q.processAllAvailable()
    // watermark jump closes both panes (commit lag needs one extra batch,
    // same as the dedup-horizon test)
    input.addData(EventRow(99, ts("2026-01-01 11:00:00"), 1, "view", 1.0))
    q.processAllAvailable()
    input.addData(EventRow(100, ts("2026-01-01 11:05:00"), 1, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("burn")
      .select($"w_start".cast("string"), $"n", $"e")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("2026-01-01 10:00:00", 3L, 1L)), got)
  }

  test("tombstoneStream: cross-batch violations match the batch audit " +
      "for single-request users") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventsStreaming.TombRow
    val day = 86400000000L
    val input = MemoryStream[TombRow]
    val batch1 = Seq(
      TombRow(1L, 0L, 1L, "signup"),            // u1 erasure request
      TombRow(1L, day / 2, 2L, "click"),         // within SLA: clean
      TombRow(2L, 2 * day, 3L, "click"))         // u2 never requests
    val batch2 = Seq(
      TombRow(1L, day + 1, 4L, "click"),         // 1us past deadline
      TombRow(1L, 3 * day, 5L, "view"),          // 2 days past
      TombRow(2L, 5 * day, 6L, "view"))
    input.addData(batch1: _*)
    val q = EventsStreaming.tombstoneStream(input.toDF(), "signup", day)
      .writeStream.format("memory").queryName("tomb")
      .outputMode("append").start()
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tomb")
      .select($"event_id", $"overshoot_us").as[(Long, Long)]
      .collect().toMap
    assert(streamed == Map(4L -> 1L, 5L -> (2L * day)))
    // parity: per-type violation counts and worst overshoot equal the
    // batch audit on the union (every user here has <= 1 request, the
    // documented agreement scope)
    val all = (batch1 ++ batch2)
      .toDF("user_id", "us", "event_id", "event_type")
    val batch = graft.etl.Privacy
      .tombstoneAudit(all, "user_id", "us", "event_type", "signup", day)
      .select($"event_type", $"n_late", $"max_overshoot_us")
      .as[(String, Long, Long)].collect()
      .map { case (t, n, m) => t -> ((n, m)) }.toMap
    val streamedByType = spark.table("tomb")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), max($"overshoot_us").as("m"))
      .as[(String, Long, Long)].collect()
      .map { case (t, n, m) => t -> ((n, m)) }.toMap
    for ((t, (n, m)) <- batch)
      assert(streamedByType.getOrElse(t, (0L, 0L)) ==
        ((n, if (n > 0) m else 0L)), t)
  }

  test("embeddingDriftStream: watermark-closed panes match the batch " +
      "embeddingDrift run on (pane rows ∪ baseline rows)") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext

    // baseline cohort: two groups, dims=4; g3 deliberately absent so a
    // pane group with no baseline must emit NULL drift, never 0
    val baseRows = Seq(
      ("g1", Seq(1.0, 0.0, 0.0, 0.0)), ("g1", Seq(1.0, 0.2, 0.0, 0.0)),
      ("g2", Seq(0.0, 1.0, 0.0, 0.0)), ("g2", Seq(0.0, 1.0, 0.5, 0.0)),
      ("g2", Seq(0.0, 0.8, 0.0, 0.1)))
    val baseDf = baseRows.toDF("grp", "vec")
    val baseline =
      graft.etl.Similarity.embeddingCohortStats(baseDf, "grp", "vec")

    val paneRows = Seq(
      // pane 10:00 g1: mean shifted on dim 2
      EmbRow(ts("2026-01-01 10:00:05"), "g1", Seq(1.0, 0.0, 0.9, 0.0)),
      EmbRow(ts("2026-01-01 10:00:40"), "g1", Seq(1.0, 0.2, 1.1, 0.0)),
      // pane 10:00 g2: single row, slight shift
      EmbRow(ts("2026-01-01 10:00:50"), "g2", Seq(0.0, 1.0, 0.0, 0.4)),
      // pane 10:01 g1: on-baseline (drift ~0)
      EmbRow(ts("2026-01-01 10:01:10"), "g1", Seq(1.0, 0.1, 0.0, 0.0)),
      // pane 10:01 g3: no baseline cohort
      EmbRow(ts("2026-01-01 10:01:20"), "g3", Seq(0.5, 0.5, 0.5, 0.5)))

    val input = MemoryStream[EmbRow]
    val q = EventsStreaming.embeddingDriftStream(input.toDF(), baseline,
        "grp", "vec", pane = "1 minute", watermark = "1 minute")
      .writeStream.format("memory").queryName("edrift")
      .outputMode("append").start()
    input.addData(paneRows: _*)
    q.processAllAvailable()
    // two watermark closers (each closing batch advances the committed
    // watermark one step — the module's established pattern)
    input.addData(EmbRow(ts("2026-01-01 11:00:00"), "g1", Seq(1.0, 0.0, 0.0, 0.0)))
    q.processAllAvailable()
    input.addData(EmbRow(ts("2026-01-01 11:30:00"), "g1", Seq(1.0, 0.0, 0.0, 0.0)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("edrift")
      .select($"pane_start".cast("string"), $"grp", $"n_a", $"n_b",
        $"drift_milli2", $"top_dim", $"top_dim_milli2")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4),
          if (r.isNullAt(5)) null else r.getLong(5),
          if (r.isNullAt(6)) null else r.getLong(6)))).toMap

    // batch twin per pane: embeddingDrift over pane rows (cohort a) ∪
    // baseline rows (cohort b) — the parity claim is EXACT equality of
    // the integer drift outputs
    for (pane <- Seq("2026-01-01 10:00:00", "2026-01-01 10:01:00")) {
      val lo = ts(pane).getTime
      val inPane = paneRows.filter(r =>
        r.ts.getTime >= lo && r.ts.getTime < lo + 60000)
      val union = inPane.map(r => (r.grp, r.vec, true)) ++
        baseRows.map { case (g, v) => (g, v, false) }
      val u = union.zipWithIndex
        .map { case ((g, v, c), i) => (g, v, c, i.toLong) }
        .toDF("grp", "vec", "is_a", "id")
      val batch = graft.etl.Similarity
        .embeddingDrift(u, "grp", "id", "vec", col("is_a"))
        // groups present in this pane AND in the baseline — the exact-
        // parity scope; the no-baseline case (batch: n_b=0, stream: n_b
        // NULL from the left join) is asserted separately below
        .filter($"n_a" > 0 && $"n_b" > 0)
        .select($"grp", $"n_a", $"n_b", $"drift_milli2", $"top_dim",
          $"top_dim_milli2")
        .collect()
      assert(batch.nonEmpty)
      batch.foreach { r =>
        val key = (pane, r.getString(0))
        val want = (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4),
          if (r.isNullAt(5)) null else r.getLong(5))
        assert(got.get(key).contains(want), s"$key want=$want got=${got.get(key)}")
      }
    }
    // the no-baseline group emitted, with NULL drift
    val g3 = got(("2026-01-01 10:01:00", "g3"))
    assert(g3._1 == 1L && g3._2 == -1L && g3._3 == null && g3._4 == null, g3)
    // sanity: the shifted pane really alarms and names the moved dim
    val shifted = got(("2026-01-01 10:00:00", "g1"))
    assert(shifted._3.asInstanceOf[Long] > 100000L, shifted)
    assert(shifted._4 == 2L, shifted)
  }

  test("quantileSketchStream: watermark-closed panes match the batch " +
      "sampleQuantiles run on exactly the pane's rows (same k, salt)") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext

    // k=4 with 12/3 rows per (pane, group) so the sample is REAL (m < n)
    // in pane 10:00 and a census (m = n = 3) in 10:01 — both paths pinned
    val paneRows =
      (1 to 12).map(i => QRow(ts(f"2026-01-01 10:00:${i * 4}%02d"), "svc_a",
        100L + i, (i * 7 % 50).toLong)) ++
      (1 to 3).map(i => QRow(ts(f"2026-01-01 10:01:${i * 8}%02d"), "svc_b",
        200L + i, (i * 13).toLong))

    val input = MemoryStream[QRow]
    val q = EventsStreaming.quantileSketchStream(input.toDF(), "svc", "id",
        "v", k = 4, pane = "1 minute", watermark = "1 minute")
      .writeStream.format("memory").queryName("qsketch")
      .outputMode("append").start()
    input.addData(paneRows: _*)
    q.processAllAvailable()
    input.addData(QRow(ts("2026-01-01 11:00:00"), "svc_a", 900L, 1L))
    q.processAllAvailable()
    input.addData(QRow(ts("2026-01-01 11:30:00"), "svc_a", 901L, 1L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("qsketch")
      .select($"pane_start".cast("string"), $"svc", $"p_ppm", $"n", $"m",
        $"est")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6))).toMap

    for ((pane, svc) <- Seq(("2026-01-01 10:00:00", "svc_a"),
        ("2026-01-01 10:01:00", "svc_b"))) {
      val lo = ts(pane).getTime
      val inPane = paneRows.filter(r =>
        r.ts.getTime >= lo && r.ts.getTime < lo + 60000)
      val batch = graft.etl.Sketches.sampleQuantiles(
          inPane.toDF(), "svc", "v", "id", k = 4)
        .as[(String, Long, Long, Long, Long)].collect()
      assert(batch.nonEmpty)
      batch.foreach { case (_, pPpm, n, m, est) =>
        assert(got.get((pane, svc, pPpm)).contains((n, m, est)),
          s"($pane, $svc, $pPpm): want ($n, $m, $est) " +
            s"got ${got.get((pane, svc, pPpm))}")
      }
    }
    // the real-sample pane really sampled (m = k < n)
    assert(got(("2026-01-01 10:00:00", "svc_a", 500000L))._1 == 12L)
    assert(got(("2026-01-01 10:00:00", "svc_a", 500000L))._2 == 4L)
    // the census pane kept everything (m = n = 3)
    assert(got(("2026-01-01 10:01:00", "svc_b", 500000L))._1 == 3L)
    assert(got(("2026-01-01 10:01:00", "svc_b", 500000L))._2 == 3L)
  }

}

/** Row type for the embedding-drift stream parity spec (top-level: the
  * MemoryStream encoder needs a static product type). */
final case class EmbRow(ts: java.sql.Timestamp, grp: String,
    vec: Seq[Double])

/** Row type for the quantile-sketch stream parity spec. */
final case class QRow(ts: java.sql.Timestamp, svc: String, id: Long,
    v: Long)
