package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Independent pins for the data-contract family: the suite re-derived
  * from plain Scala over sf0.001, and crafted fixtures for the recon
  * buckets / orphan branch and the freshness arithmetic. */
class DataContractSpec extends SparkSpec {

  test("q505: suite counts match a plain-Scala evaluation at sf0.001") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_quantity", $"l_extendedprice", $"l_discount",
        $"l_returnflag", $"l_shipdate", $"l_orderkey").collect()
    val orderKeys = graft.Tables.orders(spark, dir)
      .select($"o_orderkey").as[Long].collect().toSet
    val n = li.length.toLong
    def cnt(f: org.apache.spark.sql.Row => Boolean) = li.count(f).toLong
    val expected = Map(
      "qty_range" -> cnt(r => r.isNullAt(0) || r.getDouble(0) < 1 ||
        r.getDouble(0) > 40),
      "price_positive" -> cnt(r => r.isNullAt(1) || r.getDouble(1) <= 0),
      "discount_cap" -> cnt(r => r.isNullAt(2) || r.getDouble(2) > 0.05),
      "flag_domain" -> cnt(r => r.isNullAt(3) ||
        !Set("A", "N", "R").contains(r.getString(3))),
      "shipdate_present" -> cnt(_.isNullAt(4)),
      "order_fk" -> cnt(r => !orderKeys.contains(r.getLong(5))))
    val got = DataContract.q505ExpectationSuite(spark, dir).collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_fail"),
          r.getAs[Long]("fail_bp"))).toMap
    assert(got.keySet == expected.keySet)
    for ((c, v) <- expected)
      assert(got(c) == ((n, v, v * 10000 / n)), c)
    // the suite genuinely exercises both outcomes on this data
    assert(expected("qty_range") > 0 && expected("flag_domain") == 0)
  }

  test("q506: recon buckets, boundary at exactly 1%, and the orphan branch") {
    import spark.implicits._
    val d = Files.createTempDirectory("datacontract").toString
    val day = new Timestamp(0L)
    // order 1: header 100.00, lines 99.50 -> rel = 50bp  (<1%)
    // order 2: header 100.00, lines 101.00 -> rel = 100bp (1-10% bucket,
    //          the inclusive lower boundary)
    // order 3: header 100.00, lines 160.00 -> rel = 6000bp (>=50%)
    // order 4: header 100.00, NO lines -> missing
    Seq((1L, 1L, "O", 100.0, day, "p"), (2L, 1L, "O", 100.0, day, "p"),
      (3L, 1L, "O", 100.0, day, "p"), (4L, 1L, "O", 100.0, day, "p"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((1L, 1, 99.50), (2L, 1, 50.0), (2L, 2, 51.0), (3L, 1, 160.0))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = DataContract.q506OrderRecon(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_orders") == 4L)
    assert(row.getAs[Long]("n_missing") == 1L)
    assert(row.getAs[Long]("b_lt1pct") == 1L)
    assert(row.getAs[Long]("b_1_10pct") == 1L)
    assert(row.getAs[Long]("b_10_50pct") == 0L)
    assert(row.getAs[Long]("b_ge50pct") == 1L)
    assert(row.getAs[Long]("max_rel_bp") == 6000L)
  }

  test("q507: staleness and coverage on a crafted two-stream fixture") {
    import spark.implicits._
    val d = Files.createTempDirectory("datacontract").toString
    val m = 60000000L
    def tsAt(us: Long) = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    // span minutes 0..9 (10 minutes). stream a: minutes 0,1,9 ->
    // coverage 3000bp, staleness 0. stream b: minutes 0,5 (two events
    // in minute 5) -> coverage 2000bp, staleness 4.
    val ev = Seq(
      (1L, tsAt(0L), 1L, "a", 1.0, "{}"),
      (2L, tsAt(1 * m), 1L, "a", 1.0, "{}"),
      (3L, tsAt(9 * m), 1L, "a", 1.0, "{}"),
      (4L, tsAt(0L), 1L, "b", 1.0, "{}"),
      (5L, tsAt(5 * m), 1L, "b", 1.0, "{}"),
      (6L, tsAt(5 * m + 1), 1L, "b", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = DataContract.q507Freshness(spark, d).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("active_minutes"),
          r.getAs[Long]("span_minutes"), r.getAs[Long]("staleness_min"),
          r.getAs[Long]("coverage_bp"))).toMap
    assert(got == Map(
      "a" -> ((3L, 3L, 10L, 0L, 3000L)),
      "b" -> ((3L, 2L, 10L, 4L, 2000L))))
  }
}
