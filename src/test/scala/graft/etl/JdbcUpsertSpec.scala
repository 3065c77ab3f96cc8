package graft.etl

import java.sql.DriverManager
import graft.SparkSpec

/** End-to-end K2/K3 upsert against embedded Derby (ships with Spark):
  * stage via parallel JDBC write, one transactional MERGE — updated rows
  * change in place, new rows insert. */
class JdbcUpsertSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:upsertdb;create=true"

  test("stage + MERGE updates matches and inserts new rows") {
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE products (
      "shop_type" VARCHAR(16) NOT NULL, "external_id" VARCHAR(32) NOT NULL,
      "title" VARCHAR(128), "current_price" DOUBLE,
      "updated_at" TIMESTAMP, PRIMARY KEY ("shop_type", "external_id"))""")
    st.execute("""INSERT INTO products VALUES
      ('AH', '1', 'Old Title', 1.00, CURRENT_TIMESTAMP)""")
    st.close(); conn.close()

    val batch = Seq(
      ("AH", "1", "New Title", 1.25),   // update
      ("AH", "2", "Brand New", 2.50))   // insert
      .toDF("shop_type", "external_id", "title", "current_price")

    // Derby maps StringType to CLOB by default, which can't be compared in
    // the MERGE ON clause — pin VARCHAR types for the staged string columns
    val props = new java.util.Properties()
    props.setProperty("createTableColumnTypes",
      "shop_type VARCHAR(16), external_id VARCHAR(32), title VARCHAR(128)")
    Sinks.jdbcUpsert(batch, url, props, "products",
      Seq("shop_type", "external_id"), nowExpr = "CURRENT_TIMESTAMP")

    val conn2 = DriverManager.getConnection(url)
    val rs = conn2.createStatement()
      .executeQuery("""SELECT "external_id", "title", "current_price"
        FROM products ORDER BY "external_id"""")
    val rows = Iterator.continually(rs)
      .takeWhile(_.next()).map(r => (r.getString(1), r.getString(2), r.getDouble(3))).toList
    conn2.close()
    assert(rows == List(("1", "New Title", 1.25), ("2", "Brand New", 2.5)))
  }
}
