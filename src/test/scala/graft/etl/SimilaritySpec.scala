package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Text

/** Behavior specs for the dedup/similarity operators that the SQL oracle
  * can't fully exercise: near-dup (not just exact-dup) recall, SimHash
  * locality, LSH banding, winnowing, ANN paths. */
class SimilaritySpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val nearDup = "the quick brown fox jumps over the lazy dog near the river bank tonight"
  private val other = "completely different words about spark query engines and columnar storage"

  test("minhash LSH finds near-dups, not just exact dups") {
    val df = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Similarity.minhashDedupPairs(df, "doc_id", "text",
      n = 3, numHashes = 32, bands = 16, threshold = 0.5).collect()
    assert(pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet == Set((1L, 2L)))
    val p = pairs.head
    // 12 shared shingles of 12 each; one differing trailing word changes 1
    assert(p.getAs[Long]("inter") == 11)
    assert(p.getAs[Long]("union_size") == 13)
  }

  test("ngram jaccard pairs compute exact set intersection/union") {
    val df = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Similarity.ngramJaccardPairs(df, "doc_id", "text", 3).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("inter") == 11)
    assert(pairs.head.getAs[Long]("union_size") == 13)
  }

  test("containmentPairs: asymmetric subset dup found in both directions") {
    import spark.implicits._
    // doc 2 is a strict prefix of doc 1: every one of its shingles is in
    // doc 1, but doc 1 has many more — containment catches what Jaccard
    // misses, and only in the contained→container direction
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val got = Similarity.containmentPairs(df, "doc_id", "text", 3)
      .select($"contained_id", $"container_id", $"inter", $"contained_size")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List((2L, 1L, 8L, 8L)),
      "short doc fully contained; long doc (28 shingles, 8 shared) is not")
  }

  test("simhash: near-dup texts are close in hamming, unrelated far") {
    val a = Text.simhashBits(base)
    val b = Text.simhashBits(nearDup)
    val c = Text.simhashBits(other)
    assert(a.length == 64 && a.forall(ch => ch == '0' || ch == '1'))
    assert(Text.hamming(a, b) < Text.hamming(a, c))
    assert(Text.hamming(a, a) == 0)
  }

  test("simhashPairs banding finds hamming<=3 pairs") {
    val df = docs(1L -> base, 2L -> base, 3L -> other)
    val pairs = Similarity.simhashPairs(df, "doc_id", "text", maxDist = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getAs[Int]("hamming") == 0)
  }

  test("brute-force ANN: self excluded, rank deterministic, k respected") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1), "vec_id", "embedding", 2)
      .collect()
    assert(out.map(_.getAs[Long]("nn_id")).toSeq == Seq(2L, 3L))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
  }

  test("hardNegatives: same-label excluded, dot ties to smaller id") {
    import spark.implicits._
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f)),  // query
      (1L, 0, Array(0.99f, 0.0f)), // same label -> never a negative
      (2L, 1, Array(0.9f, 0.1f)),
      (3L, 1, Array(0.8f, 0.2f)),
      (4L, 2, Array(0.95f, 0.0f)),
      (5L, 1, Array(0.9f, 0.1f))   // dot-ties with 2 -> id order
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.hardNegatives(vecs, vecs.filter($"vec_id" === 0),
        "vec_id", "embedding", "label", k = 3)
      .orderBy($"rank").collect()
    assert(out.map(_.getAs[Long]("neg_id")).toSeq == Seq(4L, 2L, 5L))
    assert(out.map(_.getAs[Long]("dot")).toSeq ==
      Seq(950000L, 900000L, 900000L))
  }

  test("mmrTopK: lambda trades relevance for diversity, pool caps") {
    import spark.implicits._
    // query = id 0 (smallest). id 2 is a near-dup of id 1; id 3 diverse.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),   // rel 900k
      (2L, Array(0.89f, 0.11f)), // rel 890k, dot(2,1)=812k
      (3L, Array(0.1f, 0.9f))    // rel 100k, dot(3,1)=180k
    ).toDF("vec_id", "embedding")
    // lambda=100: pure relevance order
    val pure = Similarity.mmrTopK(vecs, "vec_id", "embedding",
      k = 2, poolSize = 3, lambdaPct = 100).orderBy($"rank").collect()
    assert(pure.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L))
    // lambda=30: round 2 penalizes the near-dup (30*890k-70*812k < 0)
    // below the diverse pick (30*100k-70*180k) -> id 3 wins rank 2
    val div = Similarity.mmrTopK(vecs, "vec_id", "embedding",
      k = 2, poolSize = 3, lambdaPct = 30).orderBy($"rank").collect()
    assert(div.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 3L))
    assert(div(0).isNullAt(div(0).fieldIndex("max_sim")))
    assert(div(1).getAs[Long]("max_sim") == 180000L)
    assert(div(1).getAs[Long]("score") ==
      30L * 100000 - 70L * 180000)
    // poolSize=2 cuts id 3 from the pool entirely
    val cut = Similarity.mmrTopK(vecs, "vec_id", "embedding",
      k = 2, poolSize = 2, lambdaPct = 30).orderBy($"rank").collect()
    assert(cut.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L))
  }

  test("servingDiversity: exact pair mass, singleton NULL, coverage row") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0.3f, 0.3f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f)), (4L, Array(0.0f, 1.0f)),
      (5L, Array(0.2f, 0.0f)), (6L, Array(0.1f, 0.1f)),
      (7L, Array(0.0f, 0.2f)), (8L, Array(0.4f, 0.4f))
    ).toDF("vec_id", "embedding")
    val lists = Seq((1L, 2L), (1L, 3L), (1L, 4L), (9L, 5L))
      .toDF("query_id", "nn_id")
    val out = Similarity.servingDiversity(lists, "query_id", "nn_id",
        emb, "vec_id", "embedding")
      .collect().map(r => r.getAs[String]("list_id") -> r).toMap
    // pairs of list 1: (2,3)=500000, (2,4)=0, (3,4)=500000
    assert(out("1").getAs[Long]("n_items") == 3L)
    assert(out("1").getAs[Long]("n_pairs") == 3L)
    assert(out("1").getAs[Long]("pair_dot_sum") == 1000000L)
    assert(out("9").getAs[Long]("n_items") == 1L)
    assert(out("9").isNullAt(out("9").fieldIndex("pair_dot_sum")))
    // catalog: 4 distinct served of 8 corpus -> 5000 bp, 4 list rows
    assert(out("(catalog)").getAs[Long]("n_items") == 4L)
    assert(out("(catalog)").getAs[Long]("coverage_bp") == 5000L)
  }

  test("LSH-bucket ANN agrees with brute force for same-bucket vectors") {
    import spark.implicits._
    // all positive first-8-dims → same sign bucket → full recall here
    val vecs = (1L to 20L).map(i =>
      (i, Array.tabulate(8)(d => 0.1f + 0.01f * ((i + d) % 7)))).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 1)
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 5)
      .select("rank", "nn_id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val lsh = Similarity.lshBucketTopK(vecs, q, "vec_id", "embedding", 5)
      .select("rank", "nn_id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(bf == lsh)
  }

  test("annRecallAudit: cross-bucket true neighbor lowers recall") {
    import spark.implicits._
    // bits=2 buckets on sign(dim1,dim2). query (1,1) bucket 11;
    // exact top-2 = {b (dot 1.9), a (dot 1.8)}; LSH bucket 11 holds only
    // a -> hits 1 of 2 -> recall 5000 bp
    val vecs = Seq(
      (0L, Array(1.0f, 1.0f)),
      (1L, Array(0.9f, 0.9f)),          // a: same bucket
      (2L, Array(2.0f, -0.1f)),         // b: best dot, bucket 10 -> missed
      (3L, Array(-1.0f, -1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.annRecallAudit(vecs,
        vecs.filter($"vec_id" === 0), "vec_id", "embedding",
        k = 2, bits = 2)
      .collect().head
    assert(out.getAs[Long]("n_exact") == 2L)
    assert(out.getAs[Long]("hits") == 1L)
    assert(out.getAs[Long]("recall_bp") == 5000L)
  }

  test("shingleCapAudit: boilerplate shingle mass above the cap measured") {
    import spark.implicits._
    // shared shingle "a b c" appears in 3 docs; cap 2 -> it is capped
    val df = Seq((1L, "a b c x"), (2L, "a b c y"), (3L, "a b c z"))
      .toDF("doc_id", "text")
    val out = Similarity.shingleCapAudit(df, "doc_id", "text",
        n = 3, cap = 2).collect().head
    // types: "a b c" + {b c x, b c y, b c z} = 4; rows = 3 + 3 = 6
    assert(out.getAs[Long]("n_types") == 4L)
    assert(out.getAs[Long]("n_rows") == 6L)
    assert(out.getAs[Long]("capped_types") == 1L)
    assert(out.getAs[Long]("capped_rows") == 3L)
    assert(out.getAs[Long]("dropped_bp") == 5000L)
  }

  test("simhashRecallAudit: clone pair caught, disjoint docs stay out") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "x y z w q r")).toDF("doc_id", "text")
    val out = Similarity.simhashRecallAudit(df, "doc_id", "text")
      .collect().head
    assert(out.getAs[Long]("n_truth") == 1L)
    assert(out.getAs[Long]("n_detected") == 1L)
    assert(out.getAs[Long]("n_both") == 1L)
    assert(out.getAs[Long]("recall_bp") == 10000L)
    assert(out.getAs[Long]("precision_bp") == 10000L)
  }

  test("shingle frequency cap preserves exact Jaccard for surviving pairs") {
    val df = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val exact = Similarity.ngramJaccardPairs(df, "doc_id", "text", 3, None)
      .select("id_a", "id_b", "inter", "union_size").collect().map(_.toSeq).toSet
    // cap well above any frequency → identical results
    val capped = Similarity.ngramJaccardPairs(df, "doc_id", "text", 3, Some(100))
      .select("id_a", "id_b", "inter", "union_size").collect().map(_.toSeq).toSet
    assert(capped == exact)
    // cap of 1 drops every shared shingle → no candidates at all
    val starved = Similarity.ngramJaccardPairs(df, "doc_id", "text", 3, Some(1))
    assert(starved.count() == 0)
  }

  test("hot-shingle correction: boilerplate still counts toward inter for survivors") {
    // "common legal footer text" shingles appear in all 3 docs → freq 3 >
    // cap 2 → excluded from pair GENERATION; docs 1+2 also share kept
    // "alpha beta gamma" shingles so they survive, and their reported inter
    // must still include the boilerplate shingles (the correction join).
    // Doc 3 shares ONLY boilerplate with 1/2 → missed (documented recall
    // tradeoff).
    val df = docs(
      1L -> "common legal footer text alpha beta gamma one",
      2L -> "common legal footer text alpha beta gamma two",
      3L -> "common legal footer text delta epsilon zeta three")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("id_a", "id_b", "inter", "union_size").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val exact = rows(Similarity.ngramJaccardPairs(df, "doc_id", "text", 3, None))
    val capped = rows(Similarity.ngramJaccardPairs(df, "doc_id", "text", 3, Some(2)))
    assert(exact.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(capped.keySet == Set((1L, 2L)))          // only-boilerplate pairs missed
    assert(capped((1L, 2L)) == exact((1L, 2L)))     // but survivors stay EXACT
  }

  test("changedRows anti-join passes only new or changed rows (J3)") {
    import spark.implicits._
    def batch(rows: (String, String, String, Double, Double, String)*) =
      rows.toDF("shop_type", "unified_id", "title", "current_price",
        "quantity_amount", "quantity_unit")
        .withColumn("brand", org.apache.spark.sql.functions.lit("B"))
    val first = batch(("AH", "1", "Melk", 1.19, 1.0, "l"),
      ("AH", "2", "Brood", 2.09, 1.0, "stuk"))
    val existing = Pipeline.changedRows(first, batch().withColumn("content_hash", lit("")))
      .select("shop_type", "unified_id", "content_hash")
    // second batch: row 1 unchanged, row 2 price changed, row 3 new
    val second = batch(("AH", "1", "Melk", 1.19, 1.0, "l"),
      ("AH", "2", "Brood", 2.19, 1.0, "stuk"),
      ("AH", "3", "Kaas", 5.49, 1.0, "stuk"))
    val changed = Pipeline.changedRows(second, existing)
      .select("unified_id").collect().map(_.getString(0)).sorted.toSeq
    assert(changed == Seq("2", "3"))
  }

  test("IVF ANN: full probe equals brute force; partial probe returns k rows") {
    import spark.implicits._
    val vecs = (1L to 40L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" <= 2)
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 5)
      .select("query_id", "rank", "nn_id").collect().map(_.toSeq).toSet
    val full = Similarity.ivfTopK(vecs, q, "vec_id", "embedding", 5, nlist = 8, nprobe = 8)
      .select("query_id", "rank", "nn_id").collect().map(_.toSeq).toSet
    assert(full == bf)
    val partial = Similarity.ivfTopK(vecs, q, "vec_id", "embedding", 5, nlist = 8, nprobe = 2)
      .collect()
    assert(partial.length <= 10 && partial.nonEmpty)
  }

  test("winnowing fingerprints: dup texts share all fingerprints") {
    val fa = Text.winnow(base)
    val fb = Text.winnow(base)
    val fc = Text.winnow(other)
    assert(fa == fb)
    assert(fa.intersect(fc).isEmpty || fa.intersect(fc).size < fa.size / 2)
    assert(fa.nonEmpty)
  }

  test("winnowOverlapPairs: shared span found, unrelated docs silent") {
    import spark.implicits._
    val span = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, "unique preamble one %s unique tail alpha".format(span)),
      (2L, "different opening here %s and a different ending".format(span)),
      (3L, "totally unrelated content with nothing in common zzz qqq"))
      .toDF("doc_id", "text")
    val out = Similarity.winnowOverlapPairs(docs, "doc_id", "text",
      k = 8, window = 4, minShared = 2)
    val rows = out.collect()
    assert(rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet == Set((1L, 2L)))
    val r = rows.head
    // overlap_bp floored against the smaller fingerprint set
    val expBp = r.getAs[Long]("shared") * 10000 /
      math.min(r.getAs[Long]("n_fp_a"), r.getAs[Long]("n_fp_b"))
    assert(r.getAs[Long]("overlap_bp") == expBp)
    assert(r.getAs[Long]("shared") >= 2)
  }

  test("winnowOverlapPairs: matches a hand-built set intersection") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghijklmnopqrst"), (2L, "abcdefghijklmnopqrst"),
      (3L, "abcdefghijk")).toDF("doc_id", "text")
    // identical docs share ALL fingerprints; prefix doc shares some
    val fa = Text.winnow("abcdefghijklmnopqrst", 5, 4).toSet
    val fc = Text.winnow("abcdefghijk", 5, 4).toSet
    val out = Similarity.winnowOverlapPairs(docs, "doc_id", "text",
        k = 5, window = 4, minShared = 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("shared")).toMap
    assert(out((1L, 2L)) == fa.size)
    assert(out.get((1L, 3L)) == (if (fa.intersect(fc).nonEmpty)
      Some(fa.intersect(fc).size.toLong) else None))
  }

  test("retrievalMetrics: positions, misses, floored ppm arithmetic") {
    import spark.implicits._
    // truth top-1s: q1→a, q2→b, q3→c, q4→d
    val truth = Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"),
      (4L, 1L, "d")).toDF("query_id", "rank", "nn_id")
    // approx: q1 has a at pos 1; q2 has b at pos 3; q3 misses c entirely;
    // q4 has d at pos 7
    val approx = Seq((1L, 1L, "a"), (1L, 2L, "x"), (2L, 1L, "x"),
      (2L, 2L, "y"), (2L, 3L, "b"), (3L, 1L, "z"), (4L, 7L, "d"))
      .toDF("query_id", "rank", "nn_id")
    val r = Similarity.retrievalMetrics(approx, truth, k = 10)
      .collect().head
    assert(r.getAs[Long]("n_queries") == 4L)
    assert(r.getAs[Long]("hits_at_1") == 1L)
    assert(r.getAs[Long]("hits_at_k") == 3L)
    assert(r.getAs[Long]("n_missed") == 1L)
    // rr_ppm: 1000000 + 333333 + 0 + 142857 = 1476190; /4 = 369047
    assert(r.getAs[Long]("mrr_ppm") == 369047L)
  }

  test("signProject: hand-checked projection, norms exact, matrix stable") {
    import spark.implicits._
    val m = Similarity.signMatrix(2, 4)
    // matrix is a pure function — same call, same entries
    assert(Similarity.signMatrix(2, 4).map(_.toSeq).toSeq ==
      m.map(_.toSeq).toSeq)
    assert(m.flatten.forall(v => v == 1 || v == -1))
    val emb = Seq((1L, Array(0.5f, -0.25f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.signProject(emb, "vec_id", "embedding", 4, 2)
      .collect().head
    val q = Seq(500L, -250L, 1000L, 0L)
    val exp = (0 until 2).map(i =>
      (0 until 4).map(j => q(j) * m(i)(j)).sum)
    assert(r.getAs[Long]("p0") == exp(0) && r.getAs[Long]("p1") == exp(1))
    assert(r.getAs[Long]("n2_in") == q.map(x => x * x).sum)
    assert(r.getAs[Long]("n2_out") == exp.map(x => x * x).sum)
  }

  test("embeddingLeak: cross-split pairs only, threshold respected") {
    import spark.implicits._
    val train = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f)))   // near-dup of train 1 — must NOT pair
      .toDF("vec_id", "embedding")
    val test = Seq(
      (10L, Array(0.95f, 0.05f, 0f, 0f)), // leaks against 1 and 3
      (11L, Array(-1f, -1f, -1f, -1f)))   // same-sign bucket as nothing useful
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingLeak(train, test, "vec_id", "embedding",
        minCosine = 0.9)
      .collect().map(r => (r.getAs[Long]("test_id"), r.getAs[Long]("train_id")))
      .toSet
    assert(out == Set((10L, 1L), (10L, 3L)))
    // exact integer dot carried alongside the float cosine
    val r = Similarity.embeddingLeak(train, test, "vec_id", "embedding", 0.9)
      .filter($"train_id" === 1L).collect().head
    assert(r.getAs[Long]("dot") == 950L * 1000L + 50L * 0L)
  }

  test("hammingDupPairs: banded recall is exact for maxDist < bands") {
    import spark.implicits._
    val base = 0x00FF00FF00FF00FFL
    val hashes = Seq(
      (1L, base),
      (2L, base ^ 7L),                        // 3 flips, one band
      (3L, base ^ (1L | (1L << 16) | (1L << 32))), // 3 flips, 3 bands
      (4L, base ^ 0x1FL),                     // 5 flips → outside
      (5L, ~base))                            // far away
      .toDF("id", "h")
    val out = Similarity.hammingDupPairs(hashes, "id", "h",
        bits = 64, bands = 4, maxDist = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("hamming")).toMap
    // pairs among {1,2,3}: all within 3 of base; 2-3 differ by up to 6
    assert(out((1L, 2L)) == 3L)
    assert(out((1L, 3L)) == 3L)  // flips spread across 3 bands still found
    assert(!out.contains((1L, 4L)) && !out.contains((1L, 5L)))
    // brute-force parity on the full candidate set
    val brute = (for {
      a <- hashes.collect(); b <- hashes.collect()
      ia = a.getLong(0); ib = b.getLong(0)
      if ia < ib
      d = java.lang.Long.bitCount(a.getLong(1) ^ b.getLong(1))
      if d <= 3
    } yield (ia, ib) -> d.toLong).toMap
    assert(out == brute)
  }

  test("hammingDupPairs: guardrails reject unsound band configs") {
    import spark.implicits._
    val df = Seq((1L, 5L)).toDF("id", "h")
    intercept[IllegalArgumentException](
      Similarity.hammingDupPairs(df, "id", "h", bits = 64, bands = 4,
        maxDist = 4)) // recall not guaranteed
    intercept[IllegalArgumentException](
      Similarity.hammingDupPairs(df, "id", "h", bits = 56, bands = 5,
        maxDist = 3)) // bands must divide bits
  }

  test("language id: marker tokens dominate, ties alphabetical") {
    assert(Text.languageId("the cat and the dog of a house")._1 == "en")
    assert(Text.languageId("de kat en het huis van een boom")._1 == "nl")
    assert(Text.languageId("xyz qqq zzz")._1 == "de") // 0 hits everywhere → first
    assert(Text.languageId("der hund und die katze")._1 == "de")
  }

  test("bpe-ish token count splits letter/digit/punct runs") {
    assert(Text.bpeishTokenCount("ab 12 c!d") == 5) // ab, 12, c, !, d
    assert(Text.bpeishTokenCount("") == 0)
    assert(Text.bpeishTokenCount("hello-world42") == 4)
  }

  test("kruidvat stays explicitly unimplemented; unknown shops rejected") {
    intercept[UnsupportedOperationException](Shops.forShop("KRUIDVAT"))
    intercept[UnsupportedOperationException](Shops.forShop("kruidvat"))
    intercept[IllegalArgumentException](Shops.forShop("LIDL"))
    assert(Shops.forShop("ah") == Shops.Ah)
  }

  test("ingestScrape explodes products, drops session fields, hashes content") {
    import spark.implicits._
    val results = spark.read.json(spark.createDataset(Seq(
      """{"auction":"x","products":[{"id":1,"name":"a","auctionId":"s1"},{"id":2,"name":"b","auctionId":"s1"}]}""")))
    val out = Pipeline.ingestScrape(results).collect()
    assert(out.length == 2)
    val hashes = out.map(_.getAs[String]("content_hash"))
    assert(hashes.distinct.length == 2)
    assert(hashes.forall(_.length == 64))
    // session field dropped before hashing: same products with a different
    // auctionId hash identically
    val results2 = spark.read.json(spark.createDataset(Seq(
      """{"auction":"y","products":[{"id":1,"name":"a","auctionId":"s2"},{"id":2,"name":"b","auctionId":"s2"}]}""")))
    val hashes2 = Pipeline.ingestScrape(results2).collect().map(_.getAs[String]("content_hash"))
    assert(hashes.toSet == hashes2.toSet)
  }

  test("video frame sampling explodes deterministic offsets") {
    import spark.implicits._
    val media = Seq((1L, "video", Array[Byte](1, 2), Some(2500L)))
      .toDF("media_id", "media_type", "payload", "duration_ms")
    val frames = Multimodal.sampleFrames(media).select("frame_ts_ms")
      .collect().map(_.getLong(0)).toSeq
    assert(frames == Seq(0L, 1000L, 2000L))
  }

  test("connectedComponents: multi-hop merge, bridged clusters, isolated node") {
    import spark.implicits._
    // {1,2,3} chained, {10,11} chained, bridge 3-10 merges them; 20 isolated
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (3L, 10L))
      .toDF("src", "dst")
    val out = Similarity.connectedComponents(nodes, edges, "id", "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L))
  }

  test("connectedComponents: diameter-long chain converges (propagation depth)") {
    import spark.implicits._
    val n = 12L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Similarity.connectedComponents(nodes, edges, "id", "src", "dst")
      .collect().map(r => r.getLong(1)).distinct
    assert(out.toSeq == Seq(0L), "one chain must collapse to component 0")
  }

  test("connectedComponents: a chain past the propagation rail completes " +
    "via the star-contraction fallback") {
    import spark.implicits._
    // diameter 7 with maxIter=3: propagation alone CANNOT finish (the
    // throwing connectedComponentsRounds proves it below); the public
    // entry point escalates to star contraction and still returns the
    // fully-converged labeling
    val n = 8L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Similarity.connectedComponents(nodes, edges, "id", "src",
        "dst", maxIter = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (0L until n).map(_ -> 0L).toMap, out)
    // the raw rounds primitive keeps the fail-loud contract — a
    // half-propagated labeling can never escape as a result
    val e = intercept[IllegalStateException] {
      Similarity.connectedComponentsRounds(nodes, edges, "id", "src",
        "dst", maxIter = 3)
    }
    assert(e.getMessage.contains("did not converge"))
    // and star's own rail still throws when ITS budget is absurd
    val e2 = intercept[IllegalStateException] {
      Similarity.connectedComponentsStar(nodes, edges, "id", "src",
        "dst", maxIter = 1)
    }
    assert(e2.getMessage.toLowerCase.contains("converge"), e2.getMessage)
  }

  test("connectedComponents: edge endpoints outside the node set are ignored") {
    import spark.implicits._
    // edges reference 99 (absent from nodes) on both sides; it must neither
    // appear in the output nor bridge 1 and 2 into one component
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((99L, 1L), (2L, 99L)).toDF("src", "dst")
    val out = Similarity.connectedComponents(nodes, edges, "id", "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
  }

  test("connectedComponentsStar: parity with propagation on bridged/clique/chain graphs") {
    import spark.implicits._
    // bridged chains + isolated (the propagation fixture), a 4-clique,
    // and a chain with shuffled ids — star contraction must produce the
    // identical (node, component) labeling on each
    val fixtures = Seq(
      (Seq(1L, 2L, 3L, 10L, 11L, 20L),
        Seq((2L, 1L), (2L, 3L), (10L, 11L), (3L, 10L))),
      (Seq(5L, 6L, 7L, 8L),
        Seq((5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L))),
      (Seq(4L, 9L, 2L, 7L, 5L),
        Seq((4L, 9L), (9L, 2L), (2L, 7L), (7L, 5L))))
    fixtures.foreach { case (ns, es) =>
      val nodes = ns.toDF("id")
      val edges = es.toDF("src", "dst")
      val prop = Similarity.connectedComponents(nodes, edges, "id", "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Similarity.connectedComponentsStar(nodes, edges, "id", "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == prop, s"star/propagation disagree on nodes=$ns")
    }
  }

  test("connectedComponentsStar: isolated nodes and out-of-set endpoints") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((99L, 1L), (2L, 99L)).toDF("src", "dst")
    val out = Similarity.connectedComponentsStar(nodes, edges, "id", "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("connectedComponentsStar: log-diameter rounds where propagation pays full diameter") {
    import spark.implicits._
    // 17-node chain, diameter 16: propagation needs one round per hop
    // (16 label-moving rounds + 1 to observe the fixed point); star
    // contraction halves tree heights per alternation, so it must land
    // in O(log d) — the concrete bound here is generous (8) and the
    // real observed count is ~4-5
    val n = 17L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val (propOut, propRounds) = Similarity.connectedComponentsRounds(
      nodes, edges, "id", "src", "dst", maxIter = 20)
    val (starOut, starRounds) = Similarity.connectedComponentsStarRounds(
      nodes, edges, "id", "src", "dst")
    assert(propOut.collect().map(_.getLong(1)).distinct.toSeq == Seq(0L))
    assert(starOut.collect().map(_.getLong(1)).distinct.toSeq == Seq(0L))
    assert(propRounds >= (n - 1).toInt,
      s"propagation on a ${n - 1}-hop chain must pay the diameter, got $propRounds")
    assert(starRounds <= 8,
      s"star contraction must converge in O(log d) rounds, got $starRounds")
  }

  test("lshBandPlan: S-curve endpoints, monotone, knee near (1/b)^(1/r)") {
    val plan = Similarity.lshBandPlan(spark, bands = 8, rowsPerBand = 4,
        stepBp = 250)
      .orderBy(col("s_bp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(plan.head == (0L, 0L) && plan.last == (10000L, 10000L))
    assert(plan.sliding(2).forall(p => p(0)._2 <= p(1)._2), "must be monotone")
    // the 50%-collision knee for b=8, r=4 sits at s = (1-(1/2)^(1/8))^(1/4)
    // ~ 0.546; the grid points around it must straddle 5000 bp
    val at5250 = plan.find(_._1 == 5250L).get._2
    val at5750 = plan.find(_._1 == 5750L).get._2
    assert(at5250 < 5000L && at5750 > 5000L,
      s"knee misplaced: p(0.525)=$at5250, p(0.575)=$at5750")
  }

  test("simhashRecallAudit: sampled run audits the hash-selected subset only") {
    import spark.implicits._
    val df = docs(1L -> base, 2L -> nearDup, 3L -> other,
      4L -> (base + " extra"), 5L -> other)
    val full = Similarity.simhashRecallAudit(df, "doc_id", "text")
      .collect().head
    val sampled = Similarity.simhashRecallAudit(df, "doc_id", "text",
      sampleOneIn = Some(2)).collect().head
    // the sample is a strict subset, so neither side can grow
    assert(sampled.getAs[Long]("n_truth") <= full.getAs[Long]("n_truth"))
    assert(sampled.getAs[Long]("n_detected") <= full.getAs[Long]("n_detected"))
  }

  test("soundexBlockedPairs: phonetic blocks, lev refine, junk-block cap") {
    import spark.implicits._
    val names = Seq(
      (1L, "Smith"), (2L, "Smyth"), // S530 block, dist 1
      (3L, "Robert"), (4L, "Rupert"), // R163 block, dist 2 → refined away
      (5L, "Johnson"), // alone in its block → no pair
      (6L, "Lee"), (7L, "Leigh"), (8L, "Lea")) // L000/L200: Lee+Lea pair
      .toDF("id", "name")
    val got = Similarity.soundexBlockedPairs(names, "id", "name", maxDist = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p == ((3L, 4L))), "Robert/Rupert must fail the lev refine")
    assert(got.forall { case (a, b) => a < b })
    // cap drops an oversized block entirely
    val capped = Similarity.soundexBlockedPairs(names, "id", "name",
      maxDist = 1, maxBlock = 1)
    assert(capped.isEmpty)
  }

  test("stub codec: deterministic features, batch-shaped") {
    val media = Multimodal.mediaFromText(
      docs(7L -> "hello", 8L -> "world"), "doc_id", "text")
    // text bytes are not a decodable image -> ImageCodec falls back to stub
    val out = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(7L, 8L))
    assert(out.head.n_bytes == 5)
    assert(out.head.feature.length == 8)
    assert(out.head.decoded_width.isEmpty && out.head.decoded_height.isEmpty)
    // determinism: same payload → same features
    val out2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(out.head.feature.toSeq == out2.head.feature.toSeq)
    assert(out.head.payload_sha.length == 64)
  }

  test("ImageCodec decodes real PNGs: dims match the encoder, luma grid real") {
    import spark.implicits._
    // flat-gray 11x5 at gray 100, plus a 16x16 two-tone (left black,
    // right white) to pin the grid's row-major x-orientation
    val flat = Multimodal.syntheticPng(11, 5, 100)
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val twoTone = bos.toByteArray
    val media = Seq(
        Multimodal.MediaRecord(1L, "image", flat, Some(11), Some(5), None),
        Multimodal.MediaRecord(2L, "image", twoTone, Some(16), Some(16), None))
      .toDS()
    val out = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f = out(0)
    assert(f.decoded_width.contains(11) && f.decoded_height.contains(5))
    assert(f.feature.length == 64)
    assert(f.feature.forall(v => math.abs(v - 100f / 255f) < 1e-6))
    val t = out(1)
    assert(t.decoded_width.contains(16) && t.decoded_height.contains(16))
    // every row: first 4 cells sample x in {0,2,4,6} (black), last 4
    // sample x in {8,10,12,14} (white)
    for (i <- 0 until 8; j <- 0 until 8) {
      val expected = if (j < 4) 0f else 1f
      assert(t.feature(i * 8 + j) == expected,
        s"cell ($i,$j) = ${t.feature(i * 8 + j)}")
    }
    // sha is over the ENCODED payload, not pixels
    assert(f.payload_sha.length == 64 && f.n_bytes == flat.length.toLong)
  }

  test("dhash of decoded gradient PNGs matches the analytic pixel model") {
    val sq = spark
    import sq.implicits._
    // full encode→ImageIO decode→8x8 sample→dhash path vs the closed-form
    // model: sampled luma(i,j) = (7*(j*w/8) + 3*(i*h/8) + id) mod 251
    def model(id: Long): Long = {
      val (w, h) = (8 + id % 9, 8 + id % 5)
      def luma(i: Int, j: Int) = (7L * (j * w / 8) + 3L * (i * h / 8) + id) % 251
      (for { i <- 0 until 8; j <- 0 until 7
             if luma(i, j + 1) > luma(i, j) } yield 1L << (i * 7 + j)).sum
    }
    // ids large enough that 7x+3y+id crosses the mod-251 wrap inside the
    // sampled grid — without a wrap every gradient is monotone and every
    // hash is the all-ones degenerate value
    val ids = (190L to 210L)
    val media = Multimodal.mediaFromSyntheticGradientImages(
      ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.extractFeatures(media).toDF()
      .select($"media_id", Multimodal.dhash($"feature").as("dh"))
      .as[(Long, Long)].collect().toMap
    ids.foreach(id => assert(got(id) == model(id), s"id=$id"))
    // wrap-around seeds produce non-trivial hashes (not all-ones)
    assert(got.values.toSet.size > 1)
  }

  test("mutualNnPairs keeps only reciprocal best matches") {
    val sq = spark
    import sq.implicits._
    // same sign bucket for 1-3; dots: d(1,2)=106.9M > d(1,3)=56.5M >
    // d(2,3)=56.45M -> 3's best is 1, but 1's best is 2 and vice versa:
    // only (1,2) is mutual. 4 sits alone in the negative-first-dim bucket.
    val emb = Seq(
      (1L, Seq(10f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
      (2L, Seq(10f, 1f, 1f, 1f, 1f, 1f, 1f, 0.9f)),
      (3L, Seq(5f, 1f, 1f, 1f, 1f, 1f, 1f, 0.5f)),
      (4L, Seq(-1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mutualNnPairs(emb, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 106900000L)))
  }
  test("dimProfile: exact per-dim stats, dead-dimension flag") {
    val sq = spark
    import sq.implicits._
    // quantized columns: dim0 = (1,1,1) dead; dim1 = (5,1,3) var 4
    val emb = Seq((1L, Array(0.001f, 0.005f)), (2L, Array(0.001f, 0.001f)),
      (3L, Array(0.001f, 0.003f))).toDF("vec_id", "embedding")
    val out = Similarity.dimProfile(emb, "embedding")
      .orderBy(org.apache.spark.sql.functions.col("dim")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4))).toSeq == Seq(
      (0L, 3L, 3L, 0L, true), (1L, 3L, 9L, 4L, false)))
  }

  test("AudioCodec: WAV square wave round-trips with exact RMS envelope") {
    val sq = spark
    import sq.implicits._
    val wav = Multimodal.syntheticWav(nFrames = 800, period = 4, amp = 2000)
    assert(wav.length == 44 + 2 * 800) // canonical RIFF header
    val rec = Multimodal.MediaRecord(7L, "audio", wav, None, None, Some(100L))
    val out = Multimodal.AudioCodec.decodeBatch(Iterator(rec)).next()
    assert(out.sample_rate.contains(8000) && out.channels.contains(1))
    assert(out.n_frames.contains(800L) && out.duration_ms.contains(100L))
    // every sample is +-2000 -> every RMS bucket is exactly 2000/32768
    assert(out.feature.length == 8)
    out.feature.foreach(f => assert(math.round(f * 32768) == 2000L))
    // an undecodable payload degrades to stub features, null metadata
    val bad = Multimodal.MediaRecord(8L, "audio",
      "not a wav".getBytes("UTF-8"), None, None, None)
    val fb = Multimodal.AudioCodec.decodeBatch(Iterator(bad)).next()
    assert(fb.sample_rate.isEmpty && fb.n_frames.isEmpty)
    assert(fb.feature.length == 8)
    // distributed round trip through the Dataset seam
    val media = Multimodal.mediaFromSyntheticAudio(
      Seq(0L, 21L, 47L).toDF("id"), "id")
    val rows = Multimodal.extractAudioFeatures(media)
      .collect().sortBy(_.media_id)
    assert(rows.map(_.n_frames.get).toSeq ==
      Seq(0L, 21L, 47L).map(id => 800L + id % 5 * 160))
    assert(rows.map(_.duration_ms.get).toSeq ==
      Seq(0L, 21L, 47L).map(id => (800L + id % 5 * 160) * 1000 / 8000))
    rows.foreach { r =>
      val amp = 1000L + r.media_id % 20 * 500
      assert(math.round(r.feature(0) * 32768) == amp)
      assert(math.round(r.feature(7) * 32768) == amp)
    }
  }

  test("audioClipStats: clip count, peak, exact DC incl. partial cycle") {
    val sq = spark
    import sq.implicits._
    // 8 frames, period 3, amp 9000: + + - + + - + + -> 6 pos, 2 neg
    // -> dc = 9000*4; all 8 samples clip at threshold 8000.
    // amp 500 clips nothing; garbage payload reports NULLs.
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio",
        Multimodal.syntheticWav(8, 3, 9000), None, None, Some(1L)),
      Multimodal.MediaRecord(2L, "audio",
        Multimodal.syntheticWav(8, 2, 500), None, None, Some(1L)),
      Multimodal.MediaRecord(3L, "audio",
        Array[Byte](1, 2, 3), None, None, Some(1L))).toDS()
    val got = Multimodal.audioClipStats(media, clipThreshold = 8000)
      .collect().map(r => r.media_id -> r).toMap
    assert(got(1L) == Multimodal.AudioClipStats(1L, Some(8L), Some(8L),
      Some(9000L), Some(36000L)))
    assert(got(2L) == Multimodal.AudioClipStats(2L, Some(8L), Some(0L),
      Some(500L), Some(0L)))
    assert(got(3L) == Multimodal.AudioClipStats(3L, None, None, None, None))
  }

  test("audioZcr: sign changes, longest run, exact energy, NULL garbage") {
    val sq = spark
    import sq.implicits._
    // 8 frames, period 3, amp 9000: + + - + + - + + -> changes at
    // i=2,3,5,6 (4 total), runs 2,1,2,1,2 (longest 2), zcr=4e6/7.
    // period 2 alternates every frame: 7 changes, runs all 1, zcr=1e6.
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio",
        Multimodal.syntheticWav(8, 3, 9000), None, None, Some(1L)),
      Multimodal.MediaRecord(2L, "audio",
        Multimodal.syntheticWav(8, 2, 500), None, None, Some(1L)),
      Multimodal.MediaRecord(3L, "audio",
        Array[Byte](1, 2, 3), None, None, Some(1L))).toDS()
    val got = Multimodal.audioZcr(media)
      .collect().map(r => r.media_id -> r).toMap
    assert(got(1L) == Multimodal.AudioZcrStats(1L, Some(8L), Some(4L),
      Some(4000000L / 7), Some(2L), Some(8L * 9000 * 9000)))
    assert(got(2L) == Multimodal.AudioZcrStats(2L, Some(8L), Some(7L),
      Some(1000000L), Some(1L), Some(8L * 500 * 500)))
    assert(got(3L) ==
      Multimodal.AudioZcrStats(3L, None, None, None, None, None))
  }

  test("resizeDecode: pinned nearest-neighbor resample matches the model") {
    val sq = spark
    import sq.implicits._
    // gradient pixel luma(x,y) = (7x + 3y + id) mod 251; resample maps
    // (i,j) -> (j*w/4, i*h/4); verify sum + corners for several ids
    val ids = Seq(7L, 190L, 200L)
    def dims(id: Long) = ((8 + id % 9).toInt, (8 + id % 5).toInt)
    def luma(id: Long, x: Int, y: Int) = (7L * x + 3L * y + id) % 251
    val media = Multimodal.mediaFromSyntheticGradientImages(
      ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.resizeDecode(media, 4, 4)
      .collect().map(r => r.media_id -> r).toMap
    ids.foreach { id =>
      val (w, h) = dims(id)
      val cells = for { i <- 0 until 4; j <- 0 until 4 }
        yield luma(id, j * w / 4, i * h / 4)
      val r = got(id)
      assert(r.src_w.contains(w.toLong) && r.src_h.contains(h.toLong))
      assert(r.luma_sum.contains(cells.sum), s"id=$id")
      assert(r.luma00.contains(luma(id, 0, 0)))
      assert(r.luma_last.contains(luma(id, 3 * w / 4, 3 * h / 4)))
    }
  }

  test("vadSegments run-lengths decoded envelopes per the id's bit pattern") {
    val sq = spark
    import sq.implicits._
    // pattern 1+id%255 sets which 1/8-blocks carry signal; the analytic
    // model below reads the same bits, so every segment statistic is exact
    val ids = Seq(0L, 4L, 6L, 84L, 169L, 254L)
    def model(id: Long): (Long, Long, Long, Long) = {
      val bits = (0 until 8).map(b => ((1 + id % 255) >> b) & 1L)
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0
      while (i < 8) {
        if (bits(i) == 1L) {
          val start = i
          while (i < 8 && bits(i) == 1L) i += 1
          runs += ((start, i - start))
        } else i += 1
      }
      (bits.sum, runs.size.toLong, runs.map(_._2).max.toLong,
        runs.map(_._1).min.toLong)
    }
    val media = Multimodal.mediaFromSyntheticVadAudio(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.vadSegments(Multimodal.extractAudioFeatures(media).toDF())
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    ids.foreach(id => assert(got(id) == model(id), s"id=$id pattern=${1 + id % 255}"))
  }

  test("pqEncode: per-subspace argmin, tie to low code, exact distortion") {
    val sq = spark
    import sq.implicits._
    // seeds (first 2 by id): v1 -> sub-codebooks s0 {(1000,0),(0,1000)},
    // s1 {(0,0),(0,1000)}. v3 picks (0,1) -> code 1, distortion
    // 20000+10000; v4 is all-zero: s0 ties both at 1e6 -> code 0 wins.
    val emb = Seq(
      (1L, Seq(1.0f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1.0f, 0f, 1.0f)),
      (3L, Seq(0.9f, 0.1f, 0f, 0.9f)),
      (4L, Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(emb, "vec_id", "embedding", m = 2, ks = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> ((0L, 0L)), 2L -> ((17L, 0L)),
      3L -> ((1L, 30000L)), 4L -> ((0L, 1000000L))))
  }

  test("classMeanConfusion: mislabeled point lands off-diagonal") {
    val sq = spark
    import sq.implicits._
    // class 1 = {(1,0),(1,0)}; class 2 = {(0,1),(0.9,0)} — the last point
    // is 'mislabeled': nearer class 1's mean (score 10000 vs 452500)
    val emb = Seq((1L, 1, Seq(1.0f, 0f)), (2L, 1, Seq(1.0f, 0f)),
      (3L, 2, Seq(0f, 1.0f)), (4L, 2, Seq(0.9f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.classMeanConfusion(emb, "vec_id", "embedding", "label")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L, 1L), (2L, 1L, 1L, 0L), (2L, 2L, 1L, 1L)))
  }

  test("rankBiasedOverlap: hand-computed depths, swap discount, zero-overlap spine") {
    val sq = spark
    import sq.implicits._
    // k=3 weights: w1=1e11, w2=9e10, w3=8.1e10.
    // q1 identical lists -> X_d = d, rbo = 271e9 (the k=3 ceiling).
    // q2 top-2 swapped  -> X=(0,2,3), rbo = 9e10 + 8.1e10 = 171e9.
    // q3 disjoint       -> restored by the spine as (0, 0).
    val a = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 20L), (2L, 2, 21L), (2L, 3, 22L),
      (3L, 1, 30L), (3L, 2, 31L), (3L, 3, 32L))
      .toDF("query_id", "rank", "nn_id")
    val b = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 21L), (2L, 2, 20L), (2L, 3, 22L),
      (3L, 1, 40L), (3L, 2, 41L), (3L, 3, 42L))
      .toDF("query_id", "rank", "nn_id")
    val got = Similarity.rankBiasedOverlap(a, b, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 271000000000L), (2L, 3L, 171000000000L),
      (3L, 0L, 0L)))
  }

  test("knnHubness: in-degree histogram with antihub and singleton-bucket rows") {
    val sq = spark
    import sq.implicits._
    // bits=2 buckets on the first two dims' signs: v1-v3 share (+,+);
    // v4's (-,+) bucket is a singleton -> unreachable antihub. k=1 dots:
    // v1<->v2 (92e6) beat v1-v3 (12e6) and v2-v3 (11e6), v3 -> v1.
    // in-degrees: v1=2, v2=1, v3=0, v4=0.
    val emb = Seq((1L, Seq(1f, 1f, 10f)), (2L, Seq(1f, 1f, 9f)),
      (3L, Seq(1f, 1f, 1f)), (4L, Seq(-1f, 1f, 5f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.knnHubness(emb, "vec_id", "embedding", k = 1, bits = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("kCenterGreedy: farthest-point picks and shrinking radii") {
    val sq = spark
    import sq.implicits._
    // seed v1=(0,0); v2=(10,0) is farthest (1e8), then v3=(5,0) (25e6),
    // leaving v4=(0,1) at 1e6 — radii certify the 2-approx each round
    val emb = Seq((1L, Seq(0f, 0f)), (2L, Seq(10f, 0f)),
      (3L, Seq(5f, 0f)), (4L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val got = Similarity.kCenterGreedy(emb, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 100000000L), (2L, 2L, 25000000L),
      (3L, 3L, 1000000L)))
  }

  test("embeddingMmd: exact squared mean displacement per group") {
    val sq = spark
    import sq.implicits._
    // g1 = {(1,0),(1,0)}, g2 = {(0,1)}: S_all = (2000,1000), N = 3
    // g1: t = (2000, -2000) -> 8e6 div 36 = 222222
    // g2: t = (-2000, 2000) -> 8e6 div 9  = 888888
    val emb = Seq((1L, "g1", Seq(1.0f, 0f)), (2L, "g1", Seq(1.0f, 0f)),
      (3L, "g2", Seq(0f, 1.0f))).toDF("vec_id", "grp", "embedding")
    val got = Similarity.embeddingMmd(emb, "grp", "embedding")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map("g1" -> ((2L, 222222L)), "g2" -> ((1L, 888888L))))
  }

  test("pqAdcAudit: ADC winner vs exact winner, integer regret") {
    val sq = spark
    import sq.implicits._
    // same codebook as the pqEncode spec. Query v3 = (.9,.1,0,.9):
    // ADC(v1)=-800000+0, ADC(v2)=800000-800000=0, ADC(v4)=-800000+0
    // -> ADC tie v1/v4 breaks to v1; exact dots 9e5 / 1e6 / 0 -> true v2.
    val emb = Seq(
      (1L, Seq(1.0f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1.0f, 0f, 1.0f)),
      (3L, Seq(0.9f, 0.1f, 0f, 0.9f)),
      (4L, Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.pqAdcAudit(emb, "vec_id", "embedding",
      col("vec_id") === 3, m = 2, ks = 2).collect().head
    assert(out.getAs[Long]("query_id") == 3L)
    assert(out.getAs[Long]("true_nn") == 2L &&
      out.getAs[Long]("true_dot") == 1000000L)
    assert(out.getAs[Long]("adc_nn") == 1L &&
      out.getAs[Long]("adc_dot") == 900000L)
    assert(out.getAs[Long]("hit") == 0L &&
      out.getAs[Long]("regret") == 100000L)
  }

  test("arBuckets: exact ratio argmin, crop retention, tie to list order") {
    val sq = spark
    import sq.implicits._
    // (8,8) and (12,9) are exact bucket ratios (kept 10000);
    // (4,9) is nearest 9:16 (scores 720/1152/396/1728/153), taller than
    // the bucket -> kept = 4*16*1e4 div 81 = 7901;
    // (7,6) ties 1:1 and 4:3 at score 144 -> list order picks 1:1,
    // wider -> kept = 6*1e4 div 7 = 8571
    val feats = Seq((1L, 8, 8), (2L, 12, 9), (3L, 4, 9), (4L, 7, 6))
      .toDF("media_id", "decoded_width", "decoded_height")
    val got = Multimodal.arBuckets(feats)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      "1:1" -> ((2L, 18571L, 8571L)),
      "4:3" -> ((1L, 10000L, 10000L)),
      "9:16" -> ((1L, 7901L, 7901L))))
  }

  test("vadSegments reports all-silent media as zero segments, first=-1") {
    val sq = spark
    import sq.implicits._
    // hand-built feature rows (envelope already decoded): one silent row
    val feats = Seq(
      (1L, Seq.fill(8)(0.0f)),
      (2L, Seq(0.0f, 0.5f, 0.5f, 0.0f, 0.0f, 0.5f, 0.0f, 0.0f)))
      .toDF("media_id", "feature")
    val got = Multimodal.vadSegments(feats)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, 0L, 0L, -1L), (2L, 3L, 2L, 2L, 1L)))
  }

  test("matryoshkaRecall: truncation flips the winner, full dim recovers") {
    import spark.implicits._
    // query 0 = (1,1); full-dim top1 = c (dot 2); first-dim top1 = a (dot 2)
    val emb = Seq(
      (0L, Seq(1.0f, 1.0f)), (1L, Seq(2.0f, -5.0f)),
      (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0)
    val out = Similarity.matryoshkaRecall(emb, q, "vec_id", "embedding",
        k = 1, dims = Seq(1, 2))
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("recall_bp")).toMap
    assert(out == Map(1 -> 0L, 2 -> 10000L))
  }

  test("embeddingDrift: identical cohorts read 0; a 1-milli-unit shift " +
      "in one dim reads exactly 1, and names the dim") {
    import spark.implicits._
    // group 1: cohorts identical -> drift 0; group 2: cohort B shifted
    // +0.001 (= 1 milli-unit) on dim 1 only -> drift_milli2 = 1, top 1
    val emb = Seq(
      (1L, 10L, Seq(0.5f, 0.25f)), (1L, 11L, Seq(0.5f, 0.25f)),
      (2L, 20L, Seq(0.1f, 0.2f)), (2L, 21L, Seq(0.1f, 0.201f)),
      // group 3: only cohort A present -> NULL drift, never a fake 0
      (3L, 30L, Seq(1.0f, 1.0f)))
      .toDF("label", "vec_id", "embedding")
    val got = Similarity.embeddingDrift(emb, "label", "vec_id",
        "embedding", cohort = col("vec_id") % 2 === 0)
      .collect().map(r => r.getAs[Long]("label") -> (
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        Option(r.getAs[java.lang.Long]("drift_milli2")).map(_.toLong),
        r.getAs[Long]("top_dim"))).toMap
    assert(got(1L) == (1L, 1L, Some(0L), 0L), got(1L))
    assert(got(2L) == (1L, 1L, Some(1L), 1L), got(2L))
    assert(got(3L)._3.isEmpty, got(3L))
  }

  test("embeddingDriftAgainst: the baseline pane reads drift 0 against " +
      "itself; a shifted pane agrees exactly with the two-cohort op") {
    import spark.implicits._
    val emb = Seq(
      // pane 0 = baseline cohort (two rows); pane 1 shifted on dim 1
      (0L, "g", Seq(0.5f, 0.25f)), (0L, "g", Seq(0.5f, 0.25f)),
      (1L, "g", Seq(0.5f, 0.251f)), (1L, "g", Seq(0.5f, 0.251f)),
      // a pane whose group has no baseline -> NULL drift, never fake 0
      (1L, "h", Seq(1.0f, 1.0f)))
      .toDF("pane", "grp", "vec")
    val baseline = Similarity.embeddingCohortStats(
      emb.filter($"pane" === 0), "grp", "vec")
    val got = Similarity
      .embeddingDriftAgainst(emb, "pane", "grp", "vec", baseline)
      .collect().map(r => (r.getAs[Long]("pane"), r.getAs[String]("grp")) -> (
        Option(r.getAs[java.lang.Long]("drift_milli2")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("top_dim")).map(_.toLong))).toMap
    assert(got((0L, "g")) == (Some(0L), Some(0L)), got((0L, "g")))
    assert(got((1L, "g")) == (Some(1L), Some(1L)), got((1L, "g")))
    assert(got((1L, "h")) == (None, None), got((1L, "h")))
    // exact agreement with the two-cohort op on (pane-1 rows ∪ baseline)
    val two = Similarity.embeddingDrift(
        Seq((10L, Seq(0.5f, 0.251f)), (11L, Seq(0.5f, 0.251f)),
          (20L, Seq(0.5f, 0.25f)), (21L, Seq(0.5f, 0.25f)))
          .toDF("vec_id", "vec").withColumn("grp", lit("g")),
        "grp", "vec_id", "vec", cohort = col("vec_id") < 20)
      .collect().head
    assert(two.getAs[Long]("drift_milli2") == 1L)
    assert(two.getAs[Long]("top_dim") == 1L)
  }

}
