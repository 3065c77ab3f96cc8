package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  private def mortonModel(x: Long, y: Long): Long = {
    var z = 0L
    for (b <- 0 until 16) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("zValue matches the bit-by-bit Morton model, dims reduced mod 2^16") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 500).map(_ =>
      (rnd.nextLong().abs % 1000000L, rnd.nextLong().abs % 1000000L))
    val out = rows.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) =>
      assert(z == mortonModel(x % 65536, y % 65536), s"($x, $y)")
    }
  }

  test("compactionPlan: start-offset bins are contiguous and >= target") {
    import spark.implicits._
    // sizes 60,60,60,100,10 at target 100:
    // prev cumsums 0,60,120,180,280 -> bins 0,0,1,1,2
    val df = Seq(("p", 1L, 60L), ("p", 2L, 60L), ("p", 3L, 60L),
      ("p", 4L, 100L), ("p", 5L, 10L), ("q", 9L, 5L))
      .toDF("part", "id", "sz")
    val out = Layout.compactionPlan(df, "part", "id", "sz", 100L)
      .orderBy($"part", $"bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("p", 0L, 2L, 120L, 1L, 2L),
      ("p", 1L, 2L, 160L, 3L, 4L),
      ("p", 2L, 1L, 10L, 5L, 5L),
      ("q", 0L, 1L, 5L, 9L, 9L)))
    // every bin except each partition's last reaches the target
    out.dropRight(1).groupBy(_._1).foreach { case (_, bins) =>
      bins.dropRight(1).foreach(b => assert(b._4 >= 100L))
    }
  }

  test("zorderBy: disjoint sorted partition ranges over the z key") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 5000).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)).toDF("x", "y")
    val parts = Layout.zorderBy(df, $"x", $"y", numFiles = 8)
      .select(spark_partition_id().as("pid"), $"_zval")
      .as[(Int, Long)].collect().groupBy(_._1)
      .map { case (pid, rows) => (pid, rows.map(_._2).toSeq) }
      .toSeq.sortBy(_._1)
    parts.foreach { case (pid, zs) =>
      assert(zs == zs.sorted, s"partition $pid not sorted")
    }
    // range partitioning: each partition's max ≤ the next one's min
    parts.map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(a.max <= b.min)
      case _ =>
    }
  }

  test("hilbert: order-1 anchors pin the canonical U orientation") {
    // the 2x2 curve visits (0,0) (0,1) (1,1) (1,0)
    assert(graft.plans.Hilbert.xy2d(0, 0, 1) == 0)
    assert(graft.plans.Hilbert.xy2d(0, 1, 1) == 1)
    assert(graft.plans.Hilbert.xy2d(1, 1, 1) == 2)
    assert(graft.plans.Hilbert.xy2d(1, 0, 1) == 3)
  }

  test("hilbert: bijective and edge-adjacent over the full order-4 grid") {
    // every cell of the 16x16 grid gets a distinct d in [0, 256), and
    // consecutive d values are Manhattan-adjacent cells — together these
    // characterize a Hilbert-style curve exactly (plus the anchors above
    // for orientation)
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (graft.plans.Hilbert.xy2d(x, y, 4), (x, y))
    assert(cells.map(_._1).sorted == (0 until 256).map(_.toLong))
    cells.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Seq((x1, y1), (x2, y2)) =>
        assert((x1 - x2).abs + (y1 - y2).abs == 1, s"($x1,$y1)->($x2,$y2)")
      case _ =>
    }
  }

  test("hilbertValue expression agrees with the static model incl. mod") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map(_ =>
      (rnd.nextLong().abs % 1000000L, rnd.nextLong().abs % 1000000L))
    val out = rows.toDF("x", "y")
      .select($"x", $"y", Layout.hilbertValue($"x", $"y", 8).as("h"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, h) =>
      assert(h == graft.plans.Hilbert.xy2d(x, y, 8), s"($x, $y)")
    }
  }

  test("hilbertBy: disjoint sorted partition ranges over the curve key") {
    import spark.implicits._
    val df = (1L to 4000L).map(i => (i, i * 7 % 997)).toDF("x", "y")
    val parts = Layout.hilbertBy(df, $"x", $"y", order = 8, numFiles = 8)
      .select(spark_partition_id().as("p"), col("_hval"))
      .as[(Int, Long)].collect().groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (p, rows) => (p, rows.map(_._2).toSeq) }
    parts.foreach { case (_, vs) => assert(vs == vs.sorted) }
    parts.map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(a.max <= b.min)
      case _ =>
    }
  }
  test("rendezvousReport: loads conserve and only the new node gains") {
    val keys = spark.range(200).toDF("id")
    val out = Layout.rendezvousReport(keys, "id", nodes = 8).collect()
    assert(out.map(_.getAs[Long]("load_before")).sum == 200L)
    assert(out.map(_.getAs[Long]("load_after")).sum == 200L)
    val newNode = out.find(_.getAs[Long]("node") == 8L).get
    // the joining node held nothing before and every key it now holds moved
    assert(newNode.getAs[Long]("load_before") == 0L)
    assert(newNode.getAs[Long]("gained") == newNode.getAs[Long]("load_after"))
    assert(newNode.getAs[Long]("gained") > 0L)
    // HRW minimal disruption: no key moved between old nodes
    assert(out.filter(_.getAs[Long]("node") < 8L)
      .forall(_.getAs[Long]("gained") == 0L))
    // placement is deterministic across runs
    val again = Layout.rendezvousReport(keys, "id", nodes = 8).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet)
  }

  test("globalRank: permutation of 1..n equal to a single-order row_number") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicate-heavy sort key + extra carry column (the carry is what
    // broke the two-branch form: different pruning per branch)
    val rows = (1L to 500L).map(i =>
      (i, rnd.nextInt(20).toLong, s"payload_$i"))
    val df = rows.toDF("id", "k", "carry")
    val got = Layout.globalRank(df, Seq(col("k"), col("id")), "rk",
        nParts = 7)
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> (i + 1L) }.toMap
    assert(got == want)
  }

  test("zonemapAudit: sorted layout prunes, shuffled layout scans all") {
    import spark.implicits._
    // values 0..999 with a scrambled second ordering
    val df = (0L until 1000L).map(i => (i, (i * 541L) % 1000L, i))
      .toDF("v", "scrambled", "id")
    val out = Layout.zonemapAudit(df, Seq(
        "by_v" -> Seq("v", "id"),
        "shuffled" -> Seq("scrambled", "id")),
      "v", Seq((100L, 149L)), nShards = 20).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // sorted layout: 50 target rows live in exactly one 50-row shard
    // (rows 100..149 = shard 2 of 20)
    assert(out("by_v") == (20L, 1L, 500L))
    // multiplicative scramble spreads every value range over all shards
    assert(out("shuffled")._1 == 20L)
    assert(out("shuffled")._2 == 20L)
    assert(out("shuffled")._3 == 10000L)
  }

  test("clusteringFactor: contiguous key scores 10000, interleaved collapses") {
    import spark.implicits._
    // physical order pos 1..8; a: 1,1,2,2,3,3,4,4 (4 runs = 4 distinct)
    // b: alternating x,y,x,y,... (8 runs, 2 distinct)
    val rows = (1 to 8).map(p => (p.toLong, (p + 1) / 2,
      if (p % 2 == 0) "y" else "x")).toDF("pos", "a", "b")
    val fa = Layout.clusteringFactor(rows, Seq($"pos"), "a", nParts = 3)
      .collect().head
    assert(fa.getAs[Long]("n_rows") == 8L)
    assert(fa.getAs[Long]("n_distinct") == 4L)
    assert(fa.getAs[Long]("n_runs") == 4L)
    assert(fa.getAs[Long]("clustering_bp") == 10000L)
    val fb = Layout.clusteringFactor(rows, Seq($"pos"), "b", nParts = 3)
      .collect().head
    assert(fb.getAs[Long]("n_runs") == 8L)
    assert(fb.getAs[Long]("clustering_bp") == 2L * 10000L / 8L)
    // partition-count independence: runs cross shard boundaries correctly
    val fb1 = Layout.clusteringFactor(rows, Seq($"pos"), "b", nParts = 1)
      .collect().head
    assert(fb1.getAs[Long]("n_runs") == 8L)
  }

  test("bloomPlan sizes 1000 keys at 9585 bits, 150 words, k=7") {
    import spark.implicits._
    val df = (1L to 1000L).map(k => ("p", k)).toSeq.toDF("part", "key")
    val out = Layout.bloomPlan(df, "part", "key").collect().head
    assert(out.getAs[Long]("n_keys") == 1000L &&
      out.getAs[Long]("bits") == 9585L &&
      out.getAs[Long]("words64") == 150L &&
      out.getAs[Int]("k_hashes") == 7)
  }

}
