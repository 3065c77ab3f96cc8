package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The longest_run Expression must agree with a JVM reference model and
  * the HOF fold it replaced, under both codegen and interpreted eval. */
class LongestRunSpec extends SparkSpec {

  private def model(xs: Seq[String]): Long = {
    var best = 0L; var run = 0L; var prev: String = null
    xs.foreach { x =>
      if (x == null) { prev = null; run = 0L }
      else {
        run = if (prev != null && x == prev) run + 1 else 1
        if (run > best) best = run
        prev = x
      }
    }
    best
  }

  test("truth table via the SQL registry entry") {
    def lr(sql: String): Any = {
      val r = spark.sql(s"SELECT longest_run($sql) AS v").collect().head
      if (r.isNullAt(0)) null else r.getLong(0)
    }
    assert(lr("array('a','a','b','b','b','a')") == 4L - 1L) // run of b = 3
    assert(lr("array('x')") == 1L)
    assert(lr("CAST(array() AS array<string>)") == 0L)
    assert(lr("array('a', NULL, 'a')") == 1L)       // null breaks the run
    assert(lr("CAST(NULL AS array<string>)") == null)
  }

  test("matches the model and the HOF fold on random arrays, both eval paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Seq("a", "b", "c", null)
    val rows = (1 to 300).map(i =>
      (i.toLong, Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))))
    val df = rows.toDF("id", "arr")
    def run(): Map[Long, (Long, Long)] =
      df.select($"id", call_function("longest_run", $"arr").as("n"),
          graft.etl.Corpus.topRunLengthHof($"arr").as("h"))
        .collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("h")))).toMap
    val codegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interpreted = try run()
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    rows.foreach { case (id, xs) =>
      val m = model(xs)
      assert(codegen(id) == ((m, m)), s"codegen id=$id $xs")
      assert(interpreted(id) == ((m, m)), s"interpreted id=$id $xs")
    }
  }
}
