package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Fixtures for the co-occurrence / path-mining additions: the degree-capped
  * bipartite projection, trigram paths, and fingerprint clustering. */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("bipartiteProjection counts co-incident lefts and enforces the cap") {
    // u1 -> {a,b}, u2 -> {a,b,c}, hub -> {a,b,c,d} (degree 4, capped out)
    val e = Seq(
      ("u1", "a"), ("u1", "b"), ("u1", "b"), // dup edge collapses
      ("u2", "a"), ("u2", "b"), ("u2", "c"),
      ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"))
      .toDF("u", "b")
    val out = Graph.bipartiteProjection(e, "u", "b", maxDegree = 3)
      .orderBy($"r_a", $"r_b").collect()
    assert(out.toSeq == Seq(
      Row("a", "b", 2L), Row("a", "c", 1L), Row("b", "c", 1L)))
  }

  test("pathTrigrams slides one window over each user's ordered events") {
    // user 1: A B A B -> ABA, BAB ; user 2: A B (too short)
    val df = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "B"))
      .toDF("u", "ts", "t").withColumn("id", $"ts")
    val out = Events.pathTrigrams(df, "u", "t", "ts", "id")
      .orderBy($"t1", $"t2", $"t3").collect()
    assert(out.toSeq == Seq(Row("A", "B", "A", 1L), Row("B", "A", "B", 1L)))
  }

  test("flattenHierarchy resolves root and depth via pointer doubling") {
    // forest: 0 <- 1 <- 2 <- 3 <- 4 (chain), 9 root alone
    val nodes = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L),
      (9L, 9L)).toDF("id", "parent")
    val out = Graph.flattenHierarchy(nodes, "id", "parent", doublings = 3)
      .orderBy($"id").collect()
    assert(out.toSeq == Seq(
      Row(0L, 0L, 0L), Row(1L, 0L, 1L), Row(2L, 0L, 2L),
      Row(3L, 0L, 3L), Row(4L, 0L, 4L), Row(9L, 9L, 0L)))
  }

  test("flattenHierarchy keeps dangling-parent nodes as fixpoints") {
    // 7's parent 99 is absent (sparse key space / partial extract);
    // 8 chains through 7. Both must survive, rooted at the dangling id.
    val nodes = Seq((0L, 0L), (1L, 0L), (7L, 99L), (8L, 7L))
      .toDF("id", "parent")
    val out = Graph.flattenHierarchy(nodes, "id", "parent", doublings = 4)
      .orderBy($"id").collect()
    assert(out.toSeq == Seq(
      Row(0L, 0L, 0L), Row(1L, 0L, 1L), Row(7L, 99L, 1L), Row(8L, 99L, 2L)))
  }

  test("boundedShortestPaths relaxes to the min weight within the budget") {
    // 0->1 (w5), 0->2 (w1), 2->1 (w1): best 0->1 is 2 via two hops
    val e = Seq((0L, 1L, 5L), (0L, 2L, 1L), (2L, 1L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("node")
    val out = Graph.boundedShortestPaths(seeds, e, "node", "src", "dst",
        "w", maxHops = 2).orderBy($"node").collect()
    assert(out.toSeq == Seq(Row(0L, 0L), Row(1L, 2L), Row(2L, 1L)))
  }

  test("shortestPaths converges past any hop budget, on a sparse graph") {
    // sparse ids; cheapest 0->90 path is the 9-hop unit chain (cost 9),
    // not the 1-hop shortcut (cost 50) — a hop-8 budget would answer 50
    val chain = (0 until 10).map(i => (i * 10L, (i + 1) * 10L, 1L))
    val e = (chain :+ ((0L, 90L, 50L))).toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("node")
    val bounded = Graph.boundedShortestPaths(seeds, e, "node", "src", "dst",
      "w", maxHops = 8).filter($"node" === 90L).head().getLong(1)
    assert(bounded == 50L)
    val out = Graph.shortestPaths(seeds, e, "node", "src", "dst", "w")
      .orderBy($"node").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toMap.apply(90L) == 9L)
    assert(out.length == 11)
  }

  test("shortestPaths throws on hitting the round backstop") {
    val e = Seq((0L, 1L, 1L), (1L, 0L, -3L)).toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("node")
    intercept[IllegalStateException] {
      Graph.shortestPaths(seeds, e, "node", "src", "dst", "w", maxRounds = 5)
    }
  }

  test("sourceOverlap: shared-content pairs, within-source dups ignored") {
    import org.apache.spark.sql.functions.col
    // "x" in s1,s2,s3; "y" in s1,s2; "z" only s1 (twice — no self pair)
    val df = Seq(("s1", "x"), ("s2", "x"), ("s3", "x"),
      ("s1", "y"), ("s2", "y"), ("s1", "z"), ("s1", "z"))
      .toDF("src", "text")
    val out = Dedupe.sourceOverlap(df, "src", col("text"))
      .orderBy($"source_a", $"source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("s1", "s2", 2L), ("s1", "s3", 1L),
      ("s2", "s3", 1L)))
  }

  test("clusterSizeDist: histogram of identity-key cluster sizes + shares") {
    import org.apache.spark.sql.functions.col
    // keys: a,a,a (size 3), b,b (2), c (1), d (1) -> 7 rows
    val df = Seq("a", "a", "a", "b", "b", "c", "d").toDF("k")
    val out = Dedupe.clusterSizeDist(df, col("k"))
      .orderBy($"cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 2L, 2857L), (2L, 1L, 2L, 2857L),
      (3L, 1L, 3L, 4285L)))
  }

  test("goldenRecord survives attributes independently with non-null wins") {
    val df = Seq(
      (1L, Some("A"), None: Option[String]),
      (1L, Some("A"), None),
      (1L, Some("B"), None),
      (1L, None, None),
      (2L, Some("Z2"), Some("X")), (2L, Some("Z1"), Some("X")))
      .toDF("cluster", "brand", "mfgr")
    val out = Dedupe.goldenRecord(df, "cluster", Seq("brand", "mfgr"))
      .orderBy($"cluster").collect()
    // cluster 1: brand A (2 of 3 non-null), mfgr all-null -> null cell
    // cluster 2: brand tie 1-1 -> smaller value Z1
    assert(out.toSeq == Seq(
      Row(1L, 4L, "A", null), Row(2L, 2L, "Z1", "X")))
  }

  test("fingerprintClusters keys on the sorted distinct token set") {
    val df = Seq(
      (1L, "blue lemon"), (2L, "lemon  blue lemon"), // double space -> empty token
      (3L, "lemon"), (4L, "red wine"))
      .toDF("id", "text")
    val out = Dedupe.fingerprintClusters(df, "id", "text").collect()
    assert(out.toSeq == Seq(Row("blue lemon", 2L, 1L, 2L)))
  }
  test("kTruss: pendant edges peel, shared edge counts both triangles") {
    // two triangles sharing edge (2,3), plus pendant (1,5)
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
      .toDF("s", "d")
    // k=3: support >= 1 -> pendant drops, both triangles survive intact
    val k3 = Graph.kTruss(e, "s", "d", k = 3).orderBy($"a", $"b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(k3.toSeq == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L),
      (2L, 4L, 1L), (3L, 4L, 1L)))
    // k=4: only (2,3) has support 2, but alone it spans no triangle ->
    // the second round peels it too; empty truss
    assert(Graph.kTruss(e, "s", "d", k = 4).count() == 0L)
  }

  test("cfNeighbors: squared-cosine normalization and deterministic rank") {
    // items x,y co-occur twice (users 1,2); y,z once (user 2);
    // degrees: x=2, y=3, z=1
    val e = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "y")).toDF("u", "i")
    val out = Graph.cfNeighbors(e, "u", "i", maxDegree = 10, k = 2)
      .orderBy($"item", $"rk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5),
        r.getLong(6)))
    // user 2 holds {x,y,z} so all three pairs exist:
    // cos2(x,y) = 4e6/(2*3) = 666666; (x,z) = 1e6/(2*1) = 500000;
    // (y,z) = 1e6/(3*1) = 333333
    assert(out.toSeq == Seq(
      ("x", "y", 2L, 666666L, 1L), ("x", "z", 1L, 500000L, 2L),
      ("y", "x", 2L, 666666L, 1L), ("y", "z", 1L, 333333L, 2L),
      ("z", "x", 1L, 500000L, 1L), ("z", "y", 1L, 333333L, 2L)))
  }

  test("captureRecapture: Chapman estimate and the missed-mass gap") {
    // overlapping detectors: n1=4, n2=3, m=2 -> N = 5*4 div 3 - 1 = 5
    val over = Seq((1, true, false), (2, true, false), (3, true, true),
      (4, true, true), (5, false, true), (6, false, false))
      .toDF("id", "a", "b")
    val o = Dedupe.captureRecapture(over, $"a", $"b").collect().head
    assert(o.getAs[Long]("n1") == 4L && o.getAs[Long]("n2") == 3L &&
      o.getAs[Long]("m") == 2L)
    assert(o.getAs[Long]("n_hat") == 5L && o.getAs[Long]("est_missed") == 0L)
    // disjoint detectors: m=0 stays finite (Chapman), gap = 8 - 4 = 4
    val dis = Seq((1, true, false), (2, true, false), (3, false, true),
      (4, false, true)).toDF("id", "a", "b")
    val d = Dedupe.captureRecapture(dis, $"a", $"b").collect().head
    assert(d.getAs[Long]("n_hat") == 8L && d.getAs[Long]("est_missed") == 4L)
  }

}
