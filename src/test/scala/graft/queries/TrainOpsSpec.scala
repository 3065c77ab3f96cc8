package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Independent-computation pins for the training-ops family. The DuckDB
  * oracles share every formula with the queries, so these re-derive the
  * contracts on a different code path: plain Scala collections / BigInt
  * over the sf0.001 tables (q491/q493/q494), and hand-computed truth
  * tables over fixture parquet directories (q492/q495/q496) where the
  * interesting branches need crafted inputs. */
class TrainOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Writes the given events/documents frames as a loadable sfDir. */
  private def fixtureDir(events: Option[org.apache.spark.sql.DataFrame],
      docs: Option[org.apache.spark.sql.DataFrame]): String = {
    val d = Files.createTempDirectory("trainops").toString
    events.foreach(_.write.mode("overwrite").parquet(s"$d/events.parquet"))
    docs.foreach(_.write.mode("overwrite").parquet(s"$d/documents.parquet"))
    d
  }

  test("q491: expert histogram matches a plain-Scala rehash of sf0.001") {
    import spark.implicits._
    val raw = graft.Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0 && $"event_id" >= 0)
      .select($"user_id", $"event_id").as[(Long, Long)].collect()
    val hist = raw.groupBy { case (u, i) =>
      ((u * 7919 + i * 104729) % 8 + 8) % 8
    }.map { case (e, rows) => e -> rows.length.toLong }
    val tot = hist.values.sum
    val cap = ((tot + 7) / 8) * 5 / 4
    val got = TrainOps.q491MoeBalance(spark, dir).collect()
      .map(r => r.getAs[Long]("expert") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("share_bp"),
          r.getAs[Long]("rel_load_bp"), r.getAs[Long]("dropped_n"))).toMap
    assert(got.keySet == hist.keySet)
    for ((e, n) <- hist) {
      assert(got(e) == ((n, n * 10000 / tot, n * 8 * 10000 / tot,
        math.max(0L, n - cap))), s"expert $e")
    }
  }

  test("q493: reconsumption matches an independent collections replay") {
    import spark.implicits._
    val raw = graft.Tables.documents(spark, dir)
      .filter($"doc_id" >= 0)
      .select($"doc_id", $"source", $"n_chars")
      .as[(Long, String, Long)].collect()
    // independent simulation: per-shard hash-order consumption with
    // batch/checkpoint arithmetic done on Scala collections
    val withBatch = raw.map { case (id, src, nc) =>
      val h = (id * 104729 + 7919) % 1000003
      (h % 8, h, id, src, nc)
    }.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._2, r._3)).zipWithIndex.map { case (r, i) =>
        (r._4, r._5, i.toLong / 16)
      }
    }.toSeq
    val mb = withBatch.map(_._3).max
    val crash = mb * 2 / 3
    val ckpt = (crash / 4) * 4
    val expected = withBatch.groupBy(_._1).map { case (src, rows) =>
      val re = rows.filter(r => r._3 >= ckpt && r._3 <= crash)
      src -> (rows.size.toLong, re.size.toLong,
        re.size.toLong * 10000 / rows.size, re.map(_._2).sum)
    }
    val got = TrainOps.q493RestartReplay(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_reconsumed"),
          r.getAs[Long]("reconsumed_bp"), r.getAs[Long]("extra_chars")))
      .toMap
    assert(got == expected)
    // the replay window is non-degenerate on this data: something is
    // reconsumed, and not everything is
    val reTot = expected.values.map(_._2).sum
    assert(reTot > 0 && reTot < raw.length)
  }

  test("q494: LOO influence matches independent BigInt algebra") {
    import spark.implicits._
    val raw = graft.Tables.documents(spark, dir)
      .select($"source", $"n_chars", $"lang").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars"),
        Option(r.getAs[String]("lang"))))
    val per = raw.groupBy(_._1).map { case (s, rows) =>
      s -> (BigInt(rows.length), rows.map(r => BigInt(r._2)).sum,
        BigInt(rows.count(r => !r._3.contains("en"))))
    }
    val (tn, tc, tne) = per.values
      .foldLeft((BigInt(0), BigInt(0), BigInt(0))) {
        case ((a, b, c), (x, y, z)) => (a + x, b + y, c + z)
      }
    val got = TrainOps.q494LooInfluence(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("len_influence_milli"),
          r.getAs[Long]("nonen_influence_bp"))).toMap
    assert(got.keySet == per.keySet)
    for ((s, (n, sc, sn)) <- per) {
      // BigInt / floors toward zero but every operand here is >= 0
      val lenInf = (tc - sc) * 1000 / (tn - n) - tc * 1000 / tn
      val neInf = (tne - sn) * 10000 / (tn - n) - tne * 10000 / tn
      assert(got(s) == ((n.toLong, lenInf.toLong, neInf.toLong)),
        s"source $s")
    }
  }

  test("q492: cartography regions land on a hand-built truth table") {
    import spark.implicits._
    val ts = new Timestamp(0L)
    // u1 easy (conf 1_000_000, var 0), u2 hard (conf 100_000, var 0),
    // u3 ambiguous (conf 1_000_000, var 1_000_000); corpus means are
    // 700_000 and 333_333 so each lands strictly in its region
    val ev = Seq(
      (1L, ts, 1L, "a", 10.0, "{}"), (2L, ts, 1L, "a", 10.0, "{}"),
      (3L, ts, 2L, "a", 1.0, "{}"), (4L, ts, 2L, "a", 1.0, "{}"),
      (5L, ts, 3L, "a", 0.0, "{}"), (6L, ts, 3L, "a", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = fixtureDir(Some(ev), None)
    val got = TrainOps.q492Cartography(spark, d).collect()
      .map(r => r.getAs[String]("region") ->
        (r.getAs[Long]("n_examples"), r.getAs[Long]("mean_conf_milli"),
          r.getAs[Long]("mean_var_c2"))).toMap
    assert(got == Map(
      "ambiguous" -> ((1L, 1000000L, 1000000L)),
      "easy" -> ((1L, 1000000L, 0L)),
      "hard" -> ((1L, 100000L, 0L))))
  }

  test("q495: GNS numbers match the hand computation") {
    import spark.implicits._
    // batch A (minute 0): c=100,300 -> m=200000; batch B (minute 1):
    // c=400 -> m=400000; g = 800000/3 = 266666
    val ev = Seq(
      (1L, new Timestamp(0L), 1L, "a", 1.0, "{}"),
      (2L, new Timestamp(30000L), 1L, "a", 3.0, "{}"),
      (3L, new Timestamp(60000L), 1L, "a", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = fixtureDir(Some(ev), None)
    val r = TrainOps.q495GnsEstimate(spark, d).collect().head
    assert(r.getAs[Long]("n_batches") == 2L)
    assert(r.getAs[Long]("g_milli") == 266666L)
    // (66666^2 + 133334^2) / 2 and (2*66666^2 + 133334^2) / 3
    assert(r.getAs[Long]("between_var_milli2") == 11111155556L)
    assert(r.getAs[Long]("weighted_var_milli2") == 8888888889L)
    // 8888888889 * 1000 / 266666^2 = 125
    assert(r.getAs[Long]("gns_milli") == 125L)
  }

  test("q496: straggler tax on a crafted two-rank step") {
    import spark.implicits._
    // one step: rank 0 (user 8) does 10 tokens, rank 1 (user 1) does 30;
    // wall = 30*8 = 240, tax = 200/240 in bp = 8333
    val ev = Seq(
      (1L, new Timestamp(0L), 8L, "a", 1.0, """{"k": 10}"""),
      (2L, new Timestamp(1000L), 1L, "a", 1.0, """{"k": 30}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = fixtureDir(Some(ev), None)
    val r = TrainOps.q496StragglerTax(spark, d).collect().head
    assert(r.getAs[Long]("n_steps") == 1L)
    assert(r.getAs[Long]("total_tokens") == 40L)
    assert(r.getAs[Long]("wall_tokens") == 240L)
    assert(r.getAs[Long]("mean_active_milli") == 2000L)
    assert(r.getAs[Long]("straggler_tax_bp") == 8333L)
  }

  test("q492/q496 divisions stay floor-safe (non-negative dividends)") {
    // the family's convention: every div dividend is >= 0 (or a
    // difference of two already-floored values) — spot-check the one
    // derived quantity that COULD go negative, the cartography variance
    // numerator, which is n*sum(x^2) - sum(x)^2 >= 0 by Cauchy-Schwarz
    val xs = Seq(Seq(0L, 2000L), Seq(100L), Seq(5L, 5L, 5L))
    for (v <- xs) {
      val n = BigInt(v.length)
      val s = v.map(BigInt(_)).sum
      val s2 = v.map(x => BigInt(x) * x).sum
      assert(n * s2 - s * s >= 0)
    }
  }
}
