package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

/** Direct equivalence pins for the two-phase grouped running aggregates
  * (round-9: the enum-lint respells ride these). The single-window
  * spelling is fine AS A TEST ORACLE (tiny fixture, scale irrelevant);
  * the helpers must reproduce it bit-for-bit, including across bucket
  * boundaries — nParts is deliberately small so every group straddles
  * several range buckets. */
class LayoutPrimitivesSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // deterministic pseudo-random longs, 3 groups x 40 rows, duplicate
    // sort values included (i % 7) so within-bucket ordering is exercised
    (0L until 120L).map { i =>
      (Seq("a", "b", "c")((i % 3).toInt), (i * 2654435761L) % 97, i)
    }.toDF("g", "v", "id")
  }

  test("addRunningSums equals the window cumsum and rank, across buckets") {
    import spark.implicits._
    val df = fixture
    val sort = Seq($"v", $"id")
    val got = Layout.addRunningSums(
        Layout.bucketize(df, $"g" +: sort, nParts = 5),
        Seq("g"), sort, Seq(lit(1L) -> "rk", $"v" -> "cum"))
      .select($"id", $"rk", $"cum")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val w = Window.partitionBy($"g").orderBy($"v", $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy($"v", $"id")).cast("long"))
      .withColumn("cum", sum($"v").over(w))
      .select($"id", $"rk", $"cum")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("addPrevMax equals the exclusive window max, NULL on group firsts") {
    import spark.implicits._
    val df = fixture
    val sort = Seq($"v", $"id")
    val got = Layout.addPrevMax(
        Layout.bucketize(df, $"g" +: sort, nParts = 5),
        Seq("g"), sort, $"v", "pm")
      .select($"id", $"pm")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val w = Window.partitionBy($"g").orderBy($"v", $"id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("pm", max($"v").over(w))
      .select($"id", $"pm")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == want)
    assert(want.values.count(_.isEmpty) == 3) // one NULL per group
  }

  test("degenerate bucket counts: nParts = 1 and nParts >> rows") {
    import spark.implicits._
    val df = fixture
    val sort = Seq($"v", $"id")
    for (n <- Seq(1, 300)) {
      val got = Layout.addRunningSums(
          Layout.bucketize(df, $"g" +: sort, nParts = n),
          Seq("g"), sort, Seq($"v" -> "cum"))
        .agg(sum($"cum")).head.getLong(0)
      val w = Window.partitionBy($"g").orderBy($"v", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("cum", sum($"v").over(w))
        .agg(sum($"cum")).head.getLong(0)
      assert(got == want, s"nParts=$n")
    }
  }

  test("the plan carries no enum-only-keyed row-grain window") {
    // the whole point: the helper's windows key on (group, _b) at row
    // grain and on (group) only at BUCKET grain (aggregate below)
    import spark.implicits._
    val df = fixture
    val sort = Seq($"v", $"id")
    val plan = Layout.addRunningSums(
        Layout.bucketize(df, $"g" +: sort, nParts = 5),
        Seq("g"), sort, Seq($"v" -> "cum"))
      .queryExecution.sparkPlan
    val rowGrainEnum = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.nonEmpty &&
            w.partitionSpec.flatMap(_.references.map(_.name)).forall(_ == "g") &&
            !w.child.exists {
              case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
              case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
              case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
              case _ => false
            } => w
    }
    assert(rowGrainEnum.isEmpty, rowGrainEnum.mkString("\n"))
  }
}
