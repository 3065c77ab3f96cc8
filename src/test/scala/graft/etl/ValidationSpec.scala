package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ValidationSpec extends SparkSpec {

  private def unifiedFixture = {
    import spark.implicits._
    val good =
      """{"product":{"id":"1","title":"Good","category":"zuivel","subtitle":"500 g",
        |"image":"http://x/i.jpg","prices":{"price":199,"pricePerUnit":{"price":398,"unit":"kg"}},
        |"inAssortment":true}}""".stripMargin.replace("\n", "")
    Pipeline.process(Shops.Jumbo,
      spark.read.schema(Shops.Jumbo.schema).json(spark.createDataset(Seq(good))))
  }

  test("clean product passes every rule") {
    val v = Validation.validate(unifiedFixture).collect().head
    assert(v.getAs[scala.collection.Seq[String]]("failed_rules").isEmpty)
    assert(v.isNullAt(v.fieldIndex("worst_severity")))
  }

  test("unit-price cross-check: 1.99 for 500g vs 3.98/kg holds, 5.00/kg fails") {
    import spark.implicits._
    val base = unifiedFixture
    val ok = Validation.validate(base).collect().head
    assert(!ok.getAs[scala.collection.Seq[String]]("failed_rules").contains("unit_price_consistency"))
    val bad = Validation.validate(base.withColumn("unit_price", lit(5.0)))
      .collect().head
    assert(bad.getAs[scala.collection.Seq[String]]("failed_rules").contains("unit_price_consistency"))
    assert(bad.getAs[String]("worst_severity") == "info")
  }

  test("broken rows roll up to worst severity and fail the gate") {
    import spark.implicits._
    val broken = unifiedFixture
      .withColumn("price_before_bonus", lit(0.0))   // error rule
      .withColumn("main_category", lit(null).cast("string")) // warning rule
    val v = Validation.validate(broken).collect().head
    val failed = v.getAs[scala.collection.Seq[String]]("failed_rules")
    assert(failed.contains("valid_price"))
    assert(failed.contains("valid_category"))
    assert(v.getAs[String]("worst_severity") == "error")
    intercept[IllegalStateException](Validation.complianceGate(broken))
    Validation.complianceGate(unifiedFixture) // clean batch passes
  }

  test("summary counts per-rule failures") {
    import spark.implicits._
    val mixed = unifiedFixture.unionByName(
      unifiedFixture.withColumn("title", lit("")))
    val s = Validation.summary(mixed).collect().head
    assert(s.getAs[Long]("n_rows") == 2)
    assert(s.getAs[Long]("required_title") == 1)
    assert(s.getAs[Long]("valid_price") == 0)
  }

  test("refIntegrity: orphans counted per ROW, null FKs excluded entirely") {
    import spark.implicits._
    // children: 2 rows → parent 1, 2 rows → orphan key 9, 1 null FK
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = Validation.refIntegrity(child, "fk", parent, "pk", "c->p")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("c->p", 4L, 2L, 2L)),
      "n_child excludes the null, both rows of orphan key 9 count")
  }

  test("fdAudit: violating groups counted with their rows, nulls excluded") {
    import spark.implicits._
    // det A → dep {x, x} holds; det B → {x, y, y} violates (3 rows,
    // card 2); det NULL row is excluded; a NULL dep is not a value, so
    // det C → {NULL, z} has card 1 and holds
    val df = Seq(
      (Some("A"), Some("x")), (Some("A"), Some("x")),
      (Some("B"), Some("x")), (Some("B"), Some("y")), (Some("B"), Some("y")),
      (None, Some("q")),
      (Some("C"), None), (Some("C"), Some("z")))
      .toDF("det", "dep")
    val got = Validation.fdAudit(df, "det", "dep", "t")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("t", 3L, 1L, 3L, 2L)))
  }
  test("keyAudit: true key passes, dup-carrying candidates flagged") {
    import spark.implicits._
    // (a,b) unique; a alone has dups (a=1 twice); nulls group normally
    val df = Seq((Some(1L), 1L), (Some(1L), 2L), (Some(2L), 1L),
      (None, 1L), (None, 2L)).toDF("a", "b")
    val got = Validation.keyAudit(df, Seq(Seq("a", "b"), Seq("a")))
      .orderBy($"candidate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("a", 5L, 3L, 2L, 2L, false),
      ("a,b", 5L, 5L, 0L, 1L, true)))
  }

  test("nullPatternAudit: pairwise co-missingness counts and lift") {
    import spark.implicits._
    val df = Seq[(Option[Int], Option[Int], Option[Int])](
      (None, None, Some(1)), (None, None, None),
      (Some(1), None, Some(1)), (Some(1), Some(1), Some(1)))
      .toDF("a", "b", "c")
    val out = Validation.nullPatternAudit(df, Seq("a", "b", "c"))
      .orderBy($"col_a", $"col_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("a", "b", 4L, 2L, 3L, 2L, 1333333L),
      ("a", "c", 4L, 2L, 1L, 1L, 2000000L),
      ("b", "c", 4L, 3L, 1L, 1L, 1333333L)))
  }

}
