package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Hand-built truth tables for the retail-governance queries: crafted
  * price histories pin the omnibus violation semantics (reference vs
  * trailing-30d minimum, discount gate) and the churn class boundaries. */
class DomainRetailSpec extends SparkSpec {

  private def tsAtDay(d: Long) = new Timestamp(d * 86400000L)

  private def lineitemDir(rows: Seq[(Long, Long, Long, Double, Double)])
      : String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("domainretail").toString
    rows.map { case (sup, part, d, price, qty) =>
      (sup, part, tsAtDay(d), price, qty)
    }.toDF("l_suppkey", "l_partkey", "l_shipdate", "l_extendedprice",
      "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q509: inflated reference flags; honest reference does not") {
    // part 1: last-day 90 vs ref 120 (d=25) while the 30d min was 80
    //   (d=20) -> discount claimed AND ref > min30 -> VIOLATION (4000c)
    // part 2: last-day 45 vs ref 50 (d=25), min30 = 50 (the d=10 sale
    //   at 60 is also in-window but higher) -> clean discount
    // part 3 (supplier 2): last-day price RISES -> no discount claim,
    //   supplier 2 absent from the output entirely
    val d = lineitemDir(Seq(
      (1L, 1L, 0L, 100.0, 1.0), (1L, 1L, 20L, 80.0, 1.0),
      (1L, 1L, 25L, 120.0, 1.0), (1L, 1L, 26L, 90.0, 1.0),
      (1L, 2L, 10L, 60.0, 1.0), (1L, 2L, 25L, 50.0, 1.0),
      (1L, 2L, 26L, 45.0, 1.0),
      (2L, 3L, 0L, 10.0, 1.0), (2L, 3L, 5L, 12.0, 1.0)))
    val got = Domain.q509OmnibusAudit(spark, d).collect()
      .map(r => r.getAs[Long]("l_suppkey") ->
        (r.getAs[Long]("n_discounted"), r.getAs[Long]("n_violations"),
          r.getAs[Long]("violation_bp"),
          r.getAs[Long]("overstatement_cents"))).toMap
    assert(got == Map(1L -> ((2L, 1L, 5000L, 4000L))))
  }

  test("q509: a reference older than 30 days never enters the audit") {
    // only prior sale is 40 days back -> outside the omnibus window,
    // no reference row, listing drops out
    val d = lineitemDir(Seq(
      (1L, 1L, 0L, 100.0, 1.0), (1L, 1L, 40L, 50.0, 1.0)))
    assert(Domain.q509OmnibusAudit(spark, d).count() == 0L)
  }

  test("q510: new/active/delisted class boundaries") {
    // span 0..40: A lives the whole span (active); B first seen d=30
    //   (> 26 = new third) and last d=35 (active); C last d=5 (delisted)
    val d = lineitemDir(Seq(
      (1L, 1L, 0L, 1.0, 1.0), (1L, 1L, 40L, 1.0, 1.0),
      (1L, 2L, 30L, 1.0, 1.0), (1L, 2L, 35L, 1.0, 1.0),
      (1L, 3L, 0L, 1.0, 1.0), (1L, 3L, 5L, 1.0, 1.0)))
    val got = Domain.q510AssortmentChurn(spark, d).collect()
      .map(r => r.getAs[Long]("l_suppkey") ->
        (r.getAs[Long]("n_listings"), r.getAs[Long]("n_active"),
          r.getAs[Long]("new_bp"), r.getAs[Long]("delisted_bp"))).toMap
    assert(got == Map(1L -> ((3L, 2L, 3333L, 3333L))))
  }
}
