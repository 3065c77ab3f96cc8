package graft

import graft.SparkSpec

/** Smoke + semantics check of the flagship vertical slice. */
class FlagshipSpec extends SparkSpec {

  test("flagship crosses all four shops and yields cheapest-per-unit rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val byCat = rows.map(r => (r.getAs[String]("main_category"),
      r.getAs[String]("normalized_quantity_unit")) -> r).toMap
    // Zuivel per liter: AH 1.19, Jumbo 1.09, Plus 1.79 → Jumbo cheapest
    val zuivel = byCat(("Zuivel, eieren, boter", "l"))
    assert(zuivel.getAs[Double]("cheapest_per_unit") == 1.09)
    assert(zuivel.getAs[String]("cheapest_shop") == "JUMBO")
    assert(zuivel.getAs[Long]("n_products") == 3)
    // Vlees per kg: Jumbo kip 25% korting → 4.12/0.5 = 8.24; Plus fixed 3.99/0.5 = 7.98
    val vlees = byCat(("Vlees, vis", "kg"))
    assert(vlees.getAs[Double]("cheapest_per_unit") == 7.98)
    assert(vlees.getAs[String]("cheapest_shop") == "PLUS")
    // AH skip rule dropped the virtual bundle: no category for it
    assert(rows.length >= 5)
  }

  test("salted aggregation matches plain groupBy") {
    import spark.implicits._
    val df = (1 to 1000).map(i => if (i % 3 == 0) "hot" else s"k$i").toDF("brand")
    val plain = df.groupBy($"brand").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.etl.Skew.saltedCount(df, $"brand", 8)
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("count")).toMap
    assert(salted == plain)
  }

  test("salted join matches plain join") {
    import spark.implicits._
    val fact = (1 to 500).map(i => (if (i % 2 == 0) "A" else s"k$i", i)).toDF("key", "v")
    val dim = Seq(("A", "hot dim"), ("k1", "cold dim")).toDF("key", "d")
    val plain = fact.join(dim, "key").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sortBy(_._2).toSeq
    val salted = graft.etl.Skew.saltedJoin(fact, dim, "key").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sortBy(_._2).toSeq
    assert(salted == plain)
  }
}
