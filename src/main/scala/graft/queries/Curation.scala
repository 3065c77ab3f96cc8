package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.{Graph, Series, Sketches, Vocab}
import graft.queries.SortBarrier._

/** Round-3 additions to the training-data-pipeline surface: sketch-backed
  * exact heavy hitters, URL parsing, dataset-level boilerplate detection,
  * integer PageRank, exact-integer time-series smoothing/anomaly flags, and
  * the vocabulary/feature-encoding side of tokenization.
  *
  * Exactness pattern throughout: sketches and hashes only ever produce
  * CANDIDATES or BUCKETS; the emitted numbers are exact integer counts, so
  * the DuckDB oracle re-derives every row bit-for-bit.
  */
object Curation {

  /** DuckDB-side token list — must match [[graft.etl.Corpus.tokensOf]]. */
  private val toksSql =
    """list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')"""

  // ------------------------------------------------ q110 heavy hitters

  /** Bigrams above 1/800 of all bigram occurrences, via per-partition
    * Misra–Gries candidates + exact recount ([[Sketches.heavyHitters]]).
    * k=800 puts the threshold just above the mean bigram frequency of the
    * synthetic corpus, so the answer is a proper nonempty subset at every
    * SF — the sketch must both keep and prune. */
  def q110HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = graft.etl.Corpus.tokensOf($"text")
    val items = Tables.documents(spark, dir)
      .select(explode(graft.etl.Corpus.bigramsOf(toks)).as("item"))
      .as[String]
    Sketches.heavyHitters(items, k = 800).orderBy($"item")
  }

  // ---------------------------------------------------- q111 url parse

  /** parse_url (native codegen expression) against URLs synthesized from
    * customer columns; the oracle re-derives host/path/query-param from
    * the same construction, so the test pins Spark's parser output. */
  def q111UrlParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val url = concat(lit("https://shop-"), $"c_custkey" % 20,
      lit(".example.com/seg/"), lower($"c_mktsegment"),
      lit("/item?cust="), $"c_custkey", lit("&nat="), $"c_nationkey")
    Tables.customer(spark, dir).select(url.as("url"))
      .select(expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'nat')").as("nat"))
      .groupBy($"host")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct($"nat").as("n_nations"),
        min($"path").as("first_path"))
      .orderBy($"host")
  }

  // -------------------------------------------------- q112 boilerplate

  /** Cross-document boilerplate: trigrams present in > |docs|/25 distinct
    * documents, per-doc flagged-position counts
    * ([[Vocab.boilerplateNgrams]]). */
  def q112Boilerplate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Vocab.boilerplateNgrams(Tables.documents(spark, dir),
        "doc_id", "text", n = 3, freqDiv = 25)
      .orderBy($"doc_id")
  }

  // ----------------------------------------------------- q113 pagerank

  /** 3-iteration integer PageRank ([[Graph.pageRankInt]]) on a synthetic
    * out-degree-2 graph over m = (max key + 1)/50 nodes (edges v→(v+1)%m
    * and v→(13v+3)%m — same node-count recipe as q101 so density stays
    * constant with SF). m rides along as an inline broadcast scalar
    * (one-row agg crossJoin, no driver .head() job); it feeds only
    * projections, so nothing pushdown-relevant is lost. */
  def q113Pagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (nodes, edges) = q113Graph(spark, dir)
    Graph.pageRankInt(nodes, edges, "node", "src", "dst", iterations = 3)
      .orderBy($"node")
  }

  /** Shared builder for the q113 synthetic graph (also q252, q257):
    * nodes = residues mod m, out-degree-2 edges, with m = (max key+1)/50
    * as an inline broadcast scalar. */
  private def q113Graph(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val mdf = broadcast(orders.agg(
      expr("(max(o_orderkey) + 1) div 50").as("_m")))
    val nodesM = orders.crossJoin(mdf)
      .select(($"o_orderkey" % $"_m").as("node"), $"_m").distinct()
    val edges = nodesM
      .select($"node".as("src"), (($"node" + 1) % $"_m").as("dst"))
      .unionAll(nodesM.select($"node".as("src"),
        (($"node" * 13 + 3) % $"_m").as("dst")))
    (nodesM.drop("_m"), edges)
  }

  /** 2-iteration integer HITS ([[Graph.hitsInt]]) on the q113 synthetic
    * graph: hubs and authorities with the max-rescaled integer norm step,
    * every value a floor-division-exact long. */
  def q252Hits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (nodes, edges) = q113Graph(spark, dir)
    Graph.hitsInt(nodes, edges, "node", "src", "dst", iterations = 2)
      .orderBy($"node")
  }

  /** 2-round seed-clamped label propagation ([[Graph.labelPropagation]])
    * on the q113 synthetic graph: every 10th node is seeded with class
    * node%4; everyone else takes the neighbor-mode label (min on ties),
    * null if still unreached. */
  def q257LabelProp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (nodes0, edges) = q113Graph(spark, dir)
    val nodes = nodes0
      .withColumn("lbl", when($"node" % 10 === 0, $"node" % 4))
    Graph.labelPropagation(nodes, edges, "node", "lbl", "src", "dst",
        rounds = 2)
      .orderBy($"node")
  }

  // -------------------------------------------------------- q456 ppr

  /** 2-iteration personalized PageRank
    * ([[Graph.personalizedPageRankInt]]) on the q113 synthetic graph,
    * seeded at every node ≡ 0 (mod 10): the random-walk-with-restart
    * proximity scorer — "related to THESE nodes" — next to q113's global
    * importance. Restart mass 20%, every step integer-exact, same
    * join/agg/checkpoint shape per iteration as the PageRank sibling. */
  def q456Ppr2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (nodes, edges) = q113Graph(spark, dir)
    Graph.personalizedPageRankInt(nodes, edges, "node", "src", "dst",
        seedCol = col("node") % 10 === 0, iterations = 2, restartPct = 20)
      .orderBy($"node")
  }

  // -------------------------------------------------------- q114 ewma

  /** Dyadic-weight truncated EWMA over each user's event values
    * ([[Series.ewmaDyadic]]): integer numerator + present-weight sum. */
  def q114Ewma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_id", $"user_id",
      Series.cents($"value").as("cents"), $"ts")
    Series.ewmaDyadic(e, "user_id", Seq("ts", "event_id"), "cents",
        halfLives = 8)
      .select($"event_id", $"user_id", $"ewma_num", $"weight_sum")
      .orderBy($"event_id")
  }

  // ----------------------------------------------------- q115 anomaly

  /** Rolling 3-sigma anomaly flags over the previous 16 events per user
    * ([[Series.rollingAnomaly]]), the whole test in integers. */
  def q115Anomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_id", $"user_id",
      Series.cents($"value").as("cents"), $"ts")
    Series.rollingAnomaly(e, "user_id", Seq("ts", "event_id"), "cents",
        n = 16, sigmas = 3)
      .select($"event_id", $"baseline_n", $"anomaly")
      .orderBy($"event_id")
  }

  // ------------------------------------------------ q375 DSIR weights

  /** DSIR importance-resampling weights ([[Vocab.dsirWeights]]): score
    * every document by the floored log importance ratio of its hashed
    * unigram features under the target slice (here the `en` corpus)
    * vs the raw pool — the data-selection scoring pass of Xie et al.
    * 2023, with the bucket-stats table O(buckets) and broadcast. */
  def q375DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Vocab.dsirWeights(Tables.documents(spark, dir), "doc_id", "text",
        $"lang" === "en", buckets = 64)
      .orderBy($"doc_id")
  }

  // ------------------------------------------------ q390 epoch plan

  /** Token-budget epoch plan ([[graft.etl.Corpus.epochPlan]]): a skewed
    * 4-source target mix (including one source that does not exist in
    * the corpus → NULL epochs) against a 10M-token budget — the
    * oversampling sign-off table for a pretraining dataloader. */
  def q390EpochPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Corpus.epochPlan(Tables.documents(spark, dir), "source",
        "text",
        Seq("src0" -> 4000, "src1" -> 3000, "src2" -> 2000,
          "srcX" -> 1000),
        budgetTokens = 10000000L)
      .orderBy($"source")
  }

  // ------------------------------------------------ q391 window waste

  /** Context-window waste audit ([[graft.etl.Corpus.windowWaste]]) at
    * W = 64: truncation loss vs chunk-padding burn per source — the
    * policy-decision numbers before a corpus ships to packing (q64). */
  def q391WindowWaste(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Corpus.windowWaste(Tables.documents(spark, dir), "source",
        "text", window = 64)
      .orderBy($"source")
  }

  // ------------------------------------------------ q116 feature hash

  /** Hashing-trick bag-of-words ([[Vocab.featureHash]]), 64 buckets via
    * the repo's standard sha256-hex-prefix cross-engine hash. */
  def q116FeatureHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Vocab.featureHash(Tables.documents(spark, dir), "doc_id", "text",
        buckets = 64)
      .orderBy($"doc_id", $"bucket")
  }

  // ------------------------------------------------ q117 vocab encode

  /** Documents encoded as (doc, pos, token_id) against the global
    * frequency-ranked vocabulary ([[Vocab.encode]]). */
  def q117VocabEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Vocab.encode(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy($"doc_id", $"pos")
  }

  // ------------------------------------------------- q118 pmi bigrams

  /** Top-50 bigrams by pre-scaled integer PMI ratio
    * ([[Vocab.pmiBigrams]]); deterministic (score, bigram) tiebreak. */
  def q118PmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Vocab.pmiBigrams(Tables.documents(spark, dir), "doc_id", "text",
        minCount = 5, scale = 100)
      .orderBy($"pmi_scaled".desc, $"xy")
      .limit(50)
  }

  // ---------------------------------------------- q119 decontaminate

  /** Benchmark decontamination: flag training documents sharing any
    * 4-gram with the eval split (doc_id % 97 == 0 — eval sets are small
    * by construction, so their gram set broadcasts). The distinct
    * (doc, gram) pass and the per-doc count are the only shuffles; the
    * overlap join never shuffles the corpus. */
  def q119Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Vocab.decontaminate(Tables.documents(spark, dir), "doc_id", "text",
        evalPred = $"doc_id" % 97 === 0, n = 4)
      .orderBy($"doc_id")
  }

  // ------------------------------------------------- q120 bpe pairs

  /** One BPE-training merge round: adjacent character-pair frequencies
    * weighted by word frequency, top-20. The pair explosion runs over
    * the DISTINCT-WORD table (vocabulary-sized), not the corpus — the
    * corpus-sized work is one combiner-friendly word count. */
  def q120BpePairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select(explode(graft.etl.Corpus.tokensOf($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("freq"))
    // length-1 words have no pairs; the filter also keeps sequence()
    // ascending (sequence(1,0) would DESCEND, not return empty)
    words.filter(length($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"), $"freq")
      .groupBy($"pair").agg(sum($"freq").as("cnt"))
      .orderBy($"cnt".desc, $"pair").limit(20)
  }

  // ------------------------------------------- q359/q360 URL hygiene

  /** Deterministic messy-URL synthesis from customer rows — mixed-case
    * scheme/host, optional trailing slash, tracking parameters, and
    * fragments keyed off c_custkey residues, so the canonicalizer has
    * every noise class to strip. Shared by q359 and q360; the oracle SQL
    * rebuilds the identical strings. */
  private def messyUrls(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir).select(concat(
      when($"c_custkey" % 3 === 0, lit("HTTPS://")).otherwise(lit("https://")),
      when($"c_custkey" % 6 < 3, lit("Shop-")).otherwise(lit("shop-")),
      ($"c_custkey" % 20).cast("string"),
      lit(".Example.com/seg/"), lower($"c_mktsegment"),
      when($"c_custkey" % 2 === 0, lit("/")).otherwise(lit("")),
      lit("?id="), ($"c_custkey" % 100).cast("string"),
      when($"c_custkey" % 4 === 0, lit("&utm_source=mail&utm_campaign=x"))
        .otherwise(lit("")),
      when($"c_custkey" % 7 === 0, lit("&ref=feed")).otherwise(lit("")),
      when($"c_custkey" % 5 === 0, lit("#frag")).otherwise(lit("")))
      .as("url"))
  }

  /** DuckDB twin of [[messyUrls]] — must build byte-identical strings. */
  private val messyUrlsSql: String =
    "SELECT (CASE WHEN c_custkey % 3 = 0 THEN 'HTTPS://' " +
    "ELSE 'https://' END) || " +
    "(CASE WHEN c_custkey % 6 < 3 THEN 'Shop-' ELSE 'shop-' END) || " +
    "CAST(c_custkey % 20 AS VARCHAR) || " +
    "'.Example.com/seg/' || lower(c_mktsegment) || " +
    "(CASE WHEN c_custkey % 2 = 0 THEN '/' ELSE '' END) || " +
    "'?id=' || CAST(c_custkey % 100 AS VARCHAR) || " +
    "(CASE WHEN c_custkey % 4 = 0 THEN '&utm_source=mail&utm_campaign=x' " +
    "ELSE '' END) || " +
    "(CASE WHEN c_custkey % 7 = 0 THEN '&ref=feed' ELSE '' END) || " +
    "(CASE WHEN c_custkey % 5 = 0 THEN '#frag' ELSE '' END) AS url " +
    "FROM customer"

  /** URL canonicalization dedup audit ([[graft.etl.Web.urlDedupAudit]]):
    * per host, raw URLs vs distinct canonical pages and the crawl-noise
    * share in bp — how much of the crawl is case/tracking/fragment noise
    * rather than content. */
  def q359UrlCanonical(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Web.urlDedupAudit(messyUrls(spark, dir), "url")
      .orderBy($"host")
  }

  /** Domain blocklist audit ([[graft.etl.Web.blocklistAudit]]): hosts
    * matched against a registrable-domain list via their bounded
    * dot-suffix chains; each host counts only under its most specific
    * entry, and zero-match entries still report. */
  def q360DomainBlocklist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hosts = messyUrls(spark, dir).select(
      regexp_extract(lower($"url"),
        "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1).as("host"))
    graft.etl.Web.blocklistAudit(hosts, "host", Seq(
        "example.com", "shop-3.example.com", "shop-7.example.com",
        "blocked.net"))
      .orderBy($"entry")
  }

  // --------------------------------------- q373 fellegi-sunter

  /** Fellegi–Sunter weight estimation
    * ([[graft.etl.Linkage.fellegiSunter]]) over a deterministic labeled
    * pair sample from customers: a third of pairs labeled matches;
    * per-field agreement flags synthesized at distinct m/u rates by key
    * residues (name ≈90/5%, segment ≈70/20%, phone ≈99/1%), so each
    * field earns a visibly different weight — the calibration table an
    * ER pipeline feeds into its match scorer. */
  def q373FellegiSunter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = $"c_custkey"
    val isM = k % 3 === 0
    val pairs = Tables.customer(spark, dir).select(
      isM.as("is_match"),
      when(isM, k % 10 =!= 0).otherwise(k % 20 === 0).as("name_agree"),
      when(isM, k % 10 < 7).otherwise(k % 5 === 0).as("segment_agree"),
      when(isM, k % 100 =!= 0).otherwise(k % 100 === 50).as("phone_agree"))
    graft.etl.Linkage.fellegiSunter(pairs, $"is_match",
        Seq("name_agree", "segment_agree", "phone_agree"))
      .orderBy($"field")
  }

  // ------------------------------------------------ q368 nucleus

  /** Nucleus (top-p) mass coverage per language
    * ([[graft.etl.Corpus.nucleusFilter]], p=0.8): the smallest
    * char-mass-desc prefix of docs covering 80% of each language's
    * characters — the "which docs carry the corpus" truncation. */
  def q368Nucleus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Corpus.nucleusFilter(
        Tables.documents(spark, dir).select($"lang", $"doc_id", $"n_chars"),
        "lang", "doc_id", "n_chars", pBp = 8000)
      .orderBy($"lang", $"rank")
  }

  // ------------------------------------------------ q367 host cap

  /** Per-host crawl budget ([[graft.etl.Web.hostCap]], 25/host): the
    * deterministic sha-ordered keep set over the messy-URL corpus —
    * hosts over budget are uniformly downsampled, small hosts keep
    * everything, and the selection is rerun-stable. */
  def q367HostCap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Web.hostCap(messyUrls(spark, dir), "url", perHost = 25)
      .orderBy($"host", $"rk")
  }

  // ------------------------------------------------ q365 bpe apply

  /** Tokenizer-fit report ([[graft.etl.Vocab.bpeApply]]): the q358-trained
    * 4-round merge list applied back over the corpus — per doc, word/
    * token/char masses under the learned segmentation. Trains then
    * encodes in one query so the oracle can re-derive the merges and the
    * apply from the same CTE chain; the collected merge list is
    * vocabulary-sized driver data (4 rows here). */
  def q365BpeApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val merges = Vocab.bpeTrain(docs, "text", rounds = 4)
      .orderBy($"round").collect()
      .map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b"))).toSeq
    Vocab.bpeApply(docs, "doc_id", "text", merges).orderBy($"doc_id")
  }

  // ------------------------------------------- q361 line-level dedup

  /** Deterministic multi-line composite docs: each document's own text
    * plus the texts of docs `doc_id % 97` and `doc_id % 13` as extra
    * lines — the residue-shared lines are boilerplate by construction
    * (the mod-13 line recurs in ~n/13 docs, the mod-97 line in ~n/97),
    * giving [[graft.etl.Corpus.lineDedup]] a full frequency spectrum.
    * Inner joins: composites whose residue doc is absent drop out, in
    * both engines alike. */
  private def compositeDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).select($"doc_id", $"text")
    val b = d.select($"doc_id".as("_bid"), $"text".as("_bt"))
      .filter($"_bid" < 97)
    val c = d.select($"doc_id".as("_cid"), $"text".as("_ct"))
      .filter($"_cid" < 13)
    d.join(broadcast(b), $"doc_id" % 97 === $"_bid")
      .join(broadcast(c), $"doc_id" % 13 === $"_cid")
      .select($"doc_id", concat_ws("\n", $"text", $"_bt", $"_ct").as("text"))
  }

  private val compositeDocsSql: String =
    "SELECT a.doc_id, a.text || chr(10) || b.text || chr(10) || c.text " +
    "AS text FROM documents a " +
    "JOIN documents b ON b.doc_id = a.doc_id % 97 " +
    "JOIN documents c ON c.doc_id = a.doc_id % 13"

  /** CCNet-style line-level boilerplate scrub
    * ([[graft.etl.Corpus.lineDedup]], maxDf=10): per composite doc, the
    * non-empty line count, survivors after dropping corpus-wide frequent
    * lines, retained chars, and the sha256 of the reassembled text —
    * digest-compared so the oracle proves byte-exact reassembly. */
  def q361LineDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Corpus.lineDedup(compositeDocs(spark, dir), "doc_id", "text",
      maxDf = 10).orderBy($"doc_id")
  }

  // ------------------------------------------------- q358 bpe trainer

  /** Iterative BPE merge training ([[graft.etl.Vocab.bpeTrain]]): four
    * rounds of globally-most-frequent adjacent-pair merges over the
    * corpus vocabulary, each row reporting the merged pair, its weighted
    * count, and the corpus token count the merged vocabulary implies —
    * the loop q120's single counting round feeds. Corpus-sized work is
    * one word-count shuffle; the rounds run on the vocabulary table. */
  def q358BpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Vocab.bpeTrain(Tables.documents(spark, dir), "text",
        rounds = 4)
      .orderBy($"round")
  }

  /** Unrolled DuckDB twin of [[graft.etl.Vocab.bpeTrain]]: one
    * (pairs → top-1 → replace) CTE block per round, all MATERIALIZED
    * (DuckDB inlines CTEs otherwise — round N would re-expand every
    * prior round). The empty-pair edge degrades identically: an empty
    * top-1 makes the next round's cross join empty, so rows are simply
    * absent, matching the operator's early stop. */
  /** The w0 + per-round merge CTE chain shared by the q358 trainer oracle
    * and the q365 apply oracle. */
  private def bpeMergeCtes(rounds: Int): String = bpeBaseCte + (1 to rounds).map { r =>
      s"""
      |p$r AS MATERIALIZED (
      |  SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b,
      |         freq
      |  FROM (SELECT unnest(list_transform(generate_series(1, len(s) - 1),
      |            i -> s[i] || ' ' || s[i + 1])) AS pair, freq
      |        FROM (SELECT string_split(trim(rep), ' ') AS s, freq
      |              FROM w${r - 1}))),
      |t$r AS MATERIALIZED (
      |  SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
      |  FROM p$r GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1),
      |w$r AS MATERIALIZED (
      |  SELECT replace(rep, ' ' || t.a || ' ' || t.b || ' ',
      |           ' ' || t.a || t.b || ' ') AS rep, freq
      |  FROM w${r - 1}, t$r t)""".stripMargin
    }.mkString(",", ",", "")

  private def bpeBaseCte: String = s"""
      |WITH w0 AS MATERIALIZED (
      |  SELECT ' ' || array_to_string(list_transform(
      |           generate_series(1, length(w)), i -> substring(w, i, 1)),
      |           ' ') || ' ' AS rep,
      |         CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest($toksSql) AS w FROM documents) GROUP BY 1)""".stripMargin

  private def bpeOracleSql(rounds: Int): String = {
    val rows = (1 to rounds).map { r =>
      s"""
      |SELECT CAST($r AS BIGINT) AS round, a AS sym_a, b AS sym_b,
      |  cnt AS pair_n,
      |  (SELECT CAST(sum(freq * len(string_split(trim(rep), ' ')))
      |     AS BIGINT) FROM w$r) AS corpus_tokens
      |FROM t$r""".stripMargin
    }.mkString("\nUNION ALL")
    bpeMergeCtes(rounds) + rows + "\nORDER BY round"
  }

  /** Per-doc tokenizer-fit oracle: re-derives the same merges, then folds
    * them over each word occurrence (scalar subselects against the tN
    * CTEs — each holds exactly one row). */
  private def bpeApplyOracleSql(rounds: Int): String = {
    val rep = (1 to rounds).foldLeft("rep") { (acc, r) =>
      s"replace($acc, ' ' || (SELECT a FROM t$r) || ' ' || " +
        s"(SELECT b FROM t$r) || ' ', ' ' || (SELECT a FROM t$r) || " +
        s"(SELECT b FROM t$r) || ' ')"
    }
    bpeMergeCtes(rounds) + s""",
      |occ AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
      |r0 AS (SELECT doc_id, length(w) AS nc,
      |         ' ' || array_to_string(list_transform(
      |           generate_series(1, length(w)), i -> substring(w, i, 1)),
      |           ' ') || ' ' AS rep
      |       FROM occ),
      |enc AS (SELECT doc_id, nc,
      |          len(string_split(trim($rep), ' ')) AS ntok
      |        FROM r0)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
      |  CAST(sum(nc) AS BIGINT) AS n_chars
      |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------- q121 winsorized stats

  /** Interquartile-winsorized sums per order priority
    * ([[graft.etl.Analytics.winsorizedStats]]) over exact integer cents. */
  def q121Winsorized(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select($"o_orderpriority",
      Series.cents($"o_totalprice").as("cents"))
    graft.etl.Analytics.winsorizedStats(o, "o_orderpriority", "cents")
      .orderBy($"o_orderpriority")
  }

  // ----------------------------------------------------- q122 mode

  /** Per-event-type modal value (ties to smallest,
    * [[graft.etl.Analytics.modePerGroup]]). */
  def q122Mode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_type",
      Series.cents($"value").as("cents"))
    graft.etl.Analytics.modePerGroup(e, "event_type", "cents")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q123 bitmap distinct

  /** Distinct users per event type via 64-bit bitmap aggregation
    * ([[Sketches.bitmapDistinct]]) — bit-identical to count(DISTINCT). */
  def q123BitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sketches.bitmapDistinct(Tables.events(spark, dir),
        "event_type", "user_id")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q166 count-min audit

  /** Count-min sketch audit ([[Sketches.countMinEstimates]]): a 4×256
    * counter grid over the corpus unigram stream, with every token above
    * 1/500 of all occurrences carrying its exact count, the CMS
    * estimate (min over its 4 cells), and the collision overestimate.
    * The grid is a config-sized GROUP BY — map-side combine builds it,
    * it broadcasts, and merging shards is cell-wise addition. */
  def q166Cms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = Tables.documents(spark, dir)
      .select(explode(graft.etl.Corpus.tokensOf($"text")).as("item"))
    Sketches.countMinEstimates(items, "item").orderBy($"item")
  }

  // ---------------------------------------------- q168 HLL registers

  /** HyperLogLog audit ([[Sketches.hllCompare]]): 64 registers over the
    * distinct-user domain of the events stream, integer harmonic-sum
    * estimate vs the exact distinct count, signed error in bp. The
    * register build is the mergeable-sketch shape — one (bucket, max ρ)
    * GROUP BY, 64 rows out at any scale. */
  def q168Hll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sketches.hllCompare(Tables.events(spark, dir).select($"user_id"),
      "user_id")
  }

  // ------------------------------- q190 HLL as a native UDAF

  /** Per-event-type HLL registers via the native
    * [[graft.plans.HllRegsAgg]] `TypedImperativeAggregate` — the
    * mergeable-sketch shape done the way Spark means it: each task folds
    * its partition into a 64-byte buffer, buffers merge register-wise
    * (order-independent → deterministic), 64 bytes per group cross the
    * shuffle. q168 derives the same registers declaratively; this gates
    * the imperative partial-aggregate path against the same oracle. */
  def q190HllAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(expr("hll_regs(user_id, 6)").as("_regs"))
      .select($"event_type", posexplode($"_regs"))
      .select($"event_type", $"pos".cast("long").as("bucket"),
        $"col".cast("long").as("rho"))
      .orderBy($"event_type", $"bucket")
  }

  // ----------------------------------------- q296 sketch rollup

  /** Sketch REAGGREGATION — the property that justifies keeping HLL
    * registers in a rollup table at all: per-week `hll_regs` registers
    * merge to 4-week periods by register-wise max (order-independent,
    * loss-free — the merged registers are BIT-IDENTICAL to building one
    * sketch over the whole period), then each period's estimate is
    * audited against the exact distinct count. 64 bytes per (week)
    * crosses the shuffle instead of the user set. */
  def q296SketchRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weekly = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0)
      .select($"user_id",
        expr("CAST(datediff(to_date(ts), DATE'1970-01-01') AS LONG) div 7")
          .as("wk"))
    val merged = weekly.groupBy($"wk")
      .agg(expr("hll_regs(user_id, 6)").as("r"))
      .select(expr("wk div 4").as("mon"), posexplode($"r"))
      .select($"mon", $"pos".cast("long").as("bucket"),
        $"col".cast("long").as("rho"))
      .groupBy($"mon", $"bucket").agg(max($"rho").as("rho"))
    val est = merged.groupBy($"mon")
      .agg(sum(expr("shiftleft(1L, 27 - CAST(rho AS INT))")).as("harm"))
      .select($"mon",
        expr("(7090L * 64 * 64 * shiftleft(1L, 27)) div (10000L * harm)")
          .as("hll_est"))
    val exact = weekly.select(expr("wk div 4").as("mon"), $"user_id")
      .groupBy($"mon")
      .agg(countDistinct($"user_id").as("exact_distinct"))
    exact.join(est, Seq("mon"))
      .select($"mon", $"exact_distinct", $"hll_est",
        expr("abs(hll_est - exact_distinct) * 10000 div exact_distinct")
          .as("abs_err_bp"))
      .orderBy($"mon")
  }

  // ------------------------------------ q172 histogram quantile audit

  /** Equi-width histogram quantile estimates vs exact order statistics
    * ([[Sketches.histogramQuantiles]]): p50/p90/p99 of order value cents
    * per priority class, from a 256-bin mergeable counter row — the
    * quantile member of the sketch-audit family (q166 counts, q168
    * distinct). */
  def q172HistQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderpriority",
        graft.etl.Series.cents($"o_totalprice").as("price_c"), $"o_orderkey")
    Sketches.histogramQuantiles(o, "o_orderpriority", "price_c",
        "o_orderkey")
      .orderBy($"o_orderpriority", $"q_bp")
  }

  // ------------------------------------------------------- q199 KMV

  /** K-minimum-values distinct audit ([[Sketches.kmvCompare]]) of
    * l_partkey per l_returnflag, k = 64 — the order-statistic distinct
    * estimator beside HLL (q168) and the exact bitmap (q123); bottom-k
    * fold is the bounded TopKAgg buffer, one shuffle. */
  def q199Kmv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sketches.kmvCompare(
        Tables.lineitem(spark, dir).select($"l_returnflag", $"l_partkey"),
        "l_returnflag", "l_partkey", k = 64)
      .withColumnRenamed("g", "l_returnflag")
      .orderBy($"l_returnflag")
  }

  // ------------------------ q521–q523 sample-quantile sketch family

  /** One-pass mergeable sample-quantile sketch
    * ([[Sketches.sampleQuantiles]], k = 256): p50/p90/p99 of event value
    * cents per event type from a bottom-k-by-hash uniform sample — the
    * quantile sketch whose construction an SQL oracle can replay exactly
    * (deterministic salted sha256 ranks), unlike KLL/GK compaction.
    * Where q172's histogram needs a min/max pre-pass plus a full second
    * scan, this is ONE aggregation with a ≤k-row buffer — the shape for
    * quantiles of 10⁹-row groups inline with the rest of the job. */
  def q521SampleQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sketches.sampleQuantiles(
        Tables.events(spark, dir).select($"event_type",
          graft.etl.Series.cents($"value").as("cents"), $"event_id"),
        "event_type", "cents", "event_id")
      .withColumnRenamed("g", "event_type")
      .orderBy($"event_type", $"p_ppm")
  }

  /** The sketch's MERGE path made observable
    * ([[Sketches.sampleQuantilesMerged]]): partial sketches per
    * (event type, event_id mod 8 shard), re-aggregated through the same
    * bounded buffer — the motion of folding per-day/per-shard sketches
    * without re-reading rows. The oracle is the ONE-LEVEL sketch: equal
    * output IS the merge-invariance proof (bottom-k of a union = bottom-k
    * of merged bottom-ks under the deterministic (hash, id) order). */
  def q522SketchMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sketches.sampleQuantilesMerged(
        Tables.events(spark, dir).select($"event_type",
          graft.etl.Series.cents($"value").as("cents"), $"event_id"),
        "event_type", pmod($"event_id", lit(8)), "cents", "event_id")
      .withColumnRenamed("g", "event_type")
      .orderBy($"event_type", $"p_ppm")
  }

  /** Rank-error audit of the sample-quantile sketch
    * ([[Sketches.sampleQuantileAudit]]) — the estimator-audit member
    * (q166 counts, q168 distinct, q172 histogram): per (event type, p),
    * the estimate's exact rank in the population and |rank − p| in ppm,
    * which the O(1/√k) sample bound says stays ~O(60k ppm) at k = 256. */
  def q523QuantileRankAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sketches.sampleQuantileAudit(
        Tables.events(spark, dir).select($"event_type",
          graft.etl.Series.cents($"value").as("cents"), $"event_id"),
        "event_type", "cents", "event_id")
      .withColumnRenamed("g", "event_type")
      .orderBy($"event_type", $"p_ppm")
  }

  // ------------------------------------ q225 fingerprint clusters

  /** Key-collision clustering over document token sets
    * ([[graft.etl.Dedupe.fingerprintClusters]]): the OpenRefine
    * fingerprint method — sorted distinct tokens as the cluster key, so
    * word order and repetition don't split clusters. The cheap exact
    * stage a curation pipeline runs BEFORE the fuzzy near-dup passes
    * (q26/q27): pure codegen array ops, one shuffle. */
  def q225FingerprintClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Dedupe.fingerprintClusters(
        graft.Tables.documents(spark, dir), "doc_id", "text")
      .orderBy($"fp")
  }

  // --------------------------------------- q227 golden record

  /** Master-data survivorship ([[graft.etl.Dedupe.goldenRecord]]):
    * consolidate each 10-part cluster into one golden record — per
    * attribute, the most frequent non-null value (smaller-value
    * tiebreak), attributes surviving independently. Brand/container get
    * deterministic null injections so the non-null policy is actually
    * exercised. */
  def q227GoldenRecord(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = graft.Tables.part(spark, dir).select(
      expr("p_partkey div 10").as("cluster"),
      when($"p_partkey" % 7 === 0, lit(null)).otherwise($"p_brand")
        .as("p_brand"),
      when($"p_partkey" % 5 === 0, lit(null)).otherwise($"p_type")
        .as("p_type"),
      $"p_size")
    graft.etl.Dedupe.goldenRecord(base, "cluster",
        Seq("p_brand", "p_type", "p_size"))
      .orderBy($"cluster")
  }

  // ------------------------------------ q237 linkage scoring

  /** Record-linkage pair scoring (Fellegi–Sunter with fixed integer
    * agreement weights): candidate part pairs from (brand, first
    * name-word) blocking, scored +12 type match, +6 size within 1,
    * +3 price within €5; pairs ≥ 15 survive (type must agree plus one
    * corroborating field). The probabilistic-linkage shape with the
    * weights frozen so the decision is exactly reproducible; block
    * self-join only — never all-pairs. */
  /** Jaro–Winkler record linkage over (brand, container) blocks — the
    * native `jaro_winkler` codegen expression
    * ([[graft.plans.JaroWinkler]]): exact integer ×10⁶ similarity (no
    * double anywhere, so no cross-engine floor/round flips), name pairs
    * above 0.80. Blocking bounds the pair fan-out exactly like q237's
    * feature-score linkage; this is the string-similarity scorer
    * Spark's built-ins lack (Levenshtein is the only native one). */
  def q349JaroLinkage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = graft.Tables.part(spark, dir)
      .select($"p_partkey", $"p_brand", expr("p_size div 10").as("szb"),
        $"p_name")
    val a = p.toDF("a_id", "blk_b", "blk_c", "a_name")
    val b = p.toDF("b_id", "blk_b2", "blk_c2", "b_name")
    a.join(b, $"blk_b" === $"blk_b2" && $"blk_c" === $"blk_c2" &&
        $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        call_function("jaro_winkler", $"a_name", $"b_name").as("jw_x1m"))
      .filter($"jw_x1m" >= 800000L)
      .sortedOnce($"a_id", $"b_id")
  }

  /** Full Damerau–Levenshtein vs plain Levenshtein on deterministic
    * typo'd names (chars 2/3 swapped) — the native
    * `damerau_levenshtein` codegen expression
    * ([[graft.plans.DamerauLevenshtein]]): the adjacent transposition
    * that costs 2 under Spark's built-in Levenshtein costs 1 under DL,
    * and `gain` exposes exactly where the typo-realistic metric wins.
    * Pure per-row projection, both distances integer-exact. */
  def q350DamerauTypos(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val typo = concat(substring($"p_name", 1, 1), substring($"p_name", 3, 1),
      substring($"p_name", 2, 1), expr("substring(p_name, 4)"))
    graft.Tables.part(spark, dir)
      .select($"p_partkey", $"p_name", typo.as("typo"))
      .select($"p_partkey",
        call_function("damerau_levenshtein", $"p_name", $"typo").as("dl"),
        levenshtein($"p_name", $"typo").as("lev"))
      .withColumn("gain", $"lev" - $"dl")
      .orderBy($"p_partkey")
  }

  /** Blocked fuzzy best-match resolution
    * ([[graft.etl.Linkage.fuzzyBestMatch]]): every third part name gets a
    * deterministic adjacent-swap typo and must link back to an original
    * within its brand block at edit distance ≤ 3, distance ties broken by
    * the exact-integer Jaro–Winkler then id. The composition query for
    * this round's linkage pieces — the bounded-Levenshtein rewrite and
    * both native string expressions all fire inside it. */
  def q351FuzzyResolve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = graft.Tables.part(spark, dir)
    val typo = concat(substring($"p_name", 1, 1), substring($"p_name", 3, 1),
      substring($"p_name", 2, 1), expr("substring(p_name, 4)"))
    val probes = parts.filter($"p_partkey" % 3 === 0)
      .select($"p_partkey".as("probe_id"), $"p_brand", typo.as("probe_name"))
    graft.etl.Linkage.fuzzyBestMatch(probes, parts, "p_brand",
        "probe_id", "probe_name", "p_partkey", "p_name", maxDist = 3)
      .orderBy($"left_id")
  }

  /** Blocking-quality audit ([[graft.etl.Linkage.blockingAudit]]) of the
    * q351 brand-block scheme against its planted typo truth: the
    * reduction ratio the blocks buy and the completeness ceiling they
    * impose (typos never change the brand here, so completeness must be
    * a full 10000 bp — the audit proves it rather than assumes it). */
  def q352BlockingAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = graft.Tables.part(spark, dir)
    val probes = parts.filter($"p_partkey" % 3 === 0)
      .select($"p_partkey".as("probe_id"), $"p_brand")
    val truth = probes.select($"probe_id", $"probe_id".as("p_partkey"))
    graft.etl.Linkage.blockingAudit(probes, parts, "p_brand",
      "probe_id", "p_partkey", truth)
  }

  /** Blocking-key profiler ([[graft.etl.Linkage.blockKeyProfile]]) over
    * four candidate part keys: the exact self-join pair volume, block
    * granularity, and hot-block share each scheme would commit to —
    * measured BEFORE any pairs exist. Orders the q351/q352 design
    * decision (brand vs type vs size-band vs first name word). */
  def q353BlockProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Linkage.blockKeyProfile(graft.Tables.part(spark, dir), Seq(
        "brand" -> $"p_brand",
        "type" -> $"p_type",
        "size_band" -> expr("CAST(p_size div 10 AS STRING)"),
        "first_word" -> substring_index($"p_name", " ", 1)))
      .orderBy($"block_key")
  }

  /** Sorted-neighborhood window profile
    * ([[graft.etl.Linkage.sortedNeighborhoodPairs]]): part names in
    * lexical order, candidate pairs within 10 positions, rolled up per
    * rank gap — candidates, matches within Levenshtein 2 (rides the
    * banded LevThresholdRewrite), match density in bp. The decay of
    * match_bp over gap is the number that justifies (or shrinks) the
    * window width before an SN dedup commits to it. The ordering comes
    * from the range-partitioned [[graft.etl.Layout.globalRank]] — no
    * single-partition window — and the sliding window is a bucketed
    * equi-join, O(n·w) total. */
  def q354SortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Linkage.sortedNeighborhoodPairs(
        graft.Tables.part(spark, dir).select($"p_partkey", $"p_name"),
        "p_partkey", Seq("p_name"), w = 10, carry = Seq("p_name"))
      .groupBy($"gap")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(levenshtein($"a_p_name", $"b_p_name") <= 2, 1L)
          .otherwise(0L)).as("n_match"))
      .select($"gap", $"n_pairs", $"n_match",
        expr("CAST(n_match * 10000 div n_pairs AS BIGINT)").as("match_bp"))
      .orderBy($"gap")
  }

  /** Pairwise audience-overlap estimates from KMV sketches
    * ([[graft.etl.Sketches.kmvIntersect]]): per event type keep the 64
    * smallest distinct user-id hashes; every pair of types gets
    * Jaccard, union and intersection estimates from the merged sketch —
    * the sketch answer to q192's exact overlap, one bounded-buffer
    * shuffle instead of a pairwise distinct join. */
  def q357KmvIntersect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Sketches.kmvIntersect(
        graft.Tables.events(spark, dir), "event_type", "user_id", k = 64)
      .orderBy($"g1", $"g2")
  }

  def q237LinkageScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = graft.Tables.part(spark, dir).select(
      $"p_partkey".as("id"), $"p_brand".as("blk_brand"),
      substring_index($"p_name", " ", 1).as("blk_word"),
      $"p_type", $"p_size",
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"))
    val a = p.toDF(p.columns.map(c => s"a_$c"): _*)
    val b = p.toDF(p.columns.map(c => s"b_$c"): _*)
    a.join(b, $"a_blk_brand" === $"b_blk_brand" &&
        $"a_blk_word" === $"b_blk_word" && $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        (when($"a_p_type" === $"b_p_type", 12L).otherwise(0L) +
         when(abs($"a_p_size" - $"b_p_size") <= 1, 6L).otherwise(0L) +
         when(abs($"a_cents" - $"b_cents") <= 500L, 3L).otherwise(0L))
          .as("score"))
      .filter($"score" >= 15)
      .orderBy($"a_id", $"b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q456_ppr2" -> q456Ppr2 _,
    "q237_linkage_score" -> q237LinkageScore _,
    "q349_jaro_linkage" -> q349JaroLinkage _,
    "q350_damerau_typos" -> q350DamerauTypos _,
    "q351_fuzzy_resolve" -> q351FuzzyResolve _,
    "q352_blocking_audit" -> q352BlockingAudit _,
    "q353_block_profile" -> q353BlockProfile _,
    "q354_sorted_neighborhood" -> q354SortedNeighborhood _,
    "q357_kmv_intersect" -> q357KmvIntersect _,
    "q227_golden_record" -> q227GoldenRecord _,
    "q225_fingerprint_clusters" -> q225FingerprintClusters _,
    "q199_kmv" -> q199Kmv _,
    "q521_sample_quantiles" -> q521SampleQuantiles _,
    "q522_sketch_merge" -> q522SketchMerge _,
    "q523_quantile_rank_audit" -> q523QuantileRankAudit _,
    "q166_cms" -> q166Cms _,
    "q168_hll" -> q168Hll _,
    "q190_hll_agg" -> q190HllAgg _,
    "q296_sketch_rollup" -> q296SketchRollup _,
    "q172_hist_quantiles" -> q172HistQuantiles _,
    "q119_decontaminate" -> q119Decontaminate _,
    "q120_bpe_pairs" -> q120BpePairs _,
    "q358_bpe_train" -> q358BpeTrain _,
    "q359_url_canonical" -> q359UrlCanonical _,
    "q360_domain_blocklist" -> q360DomainBlocklist _,
    "q361_line_dedup" -> q361LineDedup _,
    "q365_bpe_apply" -> q365BpeApply _,
    "q367_host_cap" -> q367HostCap _,
    "q368_nucleus" -> q368Nucleus _,
    "q373_fellegi_sunter" -> q373FellegiSunter _,
    "q121_winsorized" -> q121Winsorized _,
    "q122_mode" -> q122Mode _,
    "q123_bitmap_distinct" -> q123BitmapDistinct _,
    "q110_heavy_hitters" -> q110HeavyHitters _,
    "q111_url_parse" -> q111UrlParse _,
    "q112_boilerplate" -> q112Boilerplate _,
    "q113_pagerank" -> q113Pagerank _,
    "q252_hits" -> q252Hits _,
    "q257_label_prop" -> q257LabelProp _,
    "q114_ewma" -> q114Ewma _,
    "q115_anomaly" -> q115Anomaly _,
    "q116_feature_hash" -> q116FeatureHash _,
    "q390_epoch_plan" -> q390EpochPlan _,
    "q391_window_waste" -> q391WindowWaste _,
    "q375_dsir_weights" -> q375DsirWeights _,
    "q117_vocab_encode" -> q117VocabEncode _,
    "q118_pmi_bigrams" -> q118PmiBigrams _)

  val oracleSql: Map[String, String] = Map(
    "q456_ppr2" -> """
      |WITH mm AS (SELECT (max(o_orderkey) + 1) // 50 AS m FROM orders),
      |nodes AS (SELECT DISTINCT o_orderkey % m AS node FROM orders, mm),
      |sd AS (SELECT node,
      |         CASE WHEN node % 10 = 0 THEN 1 ELSE 0 END AS seed
      |       FROM nodes),
      |e AS (SELECT node AS src, (node + 1) % m AS dst FROM nodes, mm
      |      UNION ALL
      |      SELECT node, (node * 13 + 3) % m FROM nodes, mm),
      |d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
      |r0 AS (SELECT node, seed, seed * 1099511627776 AS r FROM sd),
      |s1 AS (SELECT e.dst, sum(r0.r // d.outdeg) AS s
      |       FROM e JOIN d USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
      |r1 AS (SELECT n.node, n.seed,
      |         (n.seed * 20 * 1099511627776) // 100
      |           + (coalesce(s.s, 0) * 80) // 100 AS r
      |       FROM sd n LEFT JOIN s1 s ON s.dst = n.node),
      |s2 AS (SELECT e.dst, sum(r1.r // d.outdeg) AS s
      |       FROM e JOIN d USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
      |r2 AS (SELECT n.node, n.seed,
      |         (n.seed * 20 * 1099511627776) // 100
      |           + (coalesce(s.s, 0) * 80) // 100 AS r
      |       FROM sd n LEFT JOIN s2 s ON s.dst = n.node)
      |SELECT node, CAST(seed AS BIGINT) AS seed, CAST(r AS BIGINT) AS rank
      |FROM r2 ORDER BY node""".stripMargin,
    "q354_sorted_neighborhood" -> """
      |WITH r AS (
      |  SELECT p_partkey AS id, p_name AS nm,
      |    row_number() OVER (ORDER BY p_name, p_partkey) AS rk
      |  FROM part),
      |pairs AS (
      |  SELECT CAST(b.rk - a.rk AS BIGINT) AS gap,
      |    CASE WHEN levenshtein(a.nm, b.nm) <= 2 THEN 1 ELSE 0 END AS m
      |  FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk < 10)
      |SELECT gap, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(m) AS BIGINT) AS n_match,
      |  CAST(sum(m) * 10000 // count(*) AS BIGINT) AS match_bp
      |FROM pairs GROUP BY gap ORDER BY gap""".stripMargin,
    "q357_kmv_intersect" -> """
      |WITH h0 AS (SELECT DISTINCT event_type AS g,
      |              ((user_id % 2147483648) * 2654435761) % 4294967296 AS h
      |            FROM events WHERE user_id IS NOT NULL AND user_id >= 0),
      |h1 AS (SELECT g, xor(h, h // 65536) AS h FROM h0),
      |h2 AS (SELECT g, (h * 2146121005) % 4294967296 AS h FROM h1),
      |hh AS (SELECT DISTINCT g, xor(h, h // 8192) AS h FROM h2),
      |sk AS (SELECT g, h FROM (
      |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      |    FROM hh) WHERE rn <= 64),
      |gs AS (SELECT DISTINCT g FROM sk),
      |pairs AS (SELECT a.g AS g1, b.g AS g2 FROM gs a JOIN gs b ON a.g < b.g),
      |m AS (SELECT DISTINCT g1, g2, h FROM (
      |    SELECT p.g1, p.g2, s.h FROM pairs p JOIN sk s ON s.g = p.g1
      |    UNION ALL
      |    SELECT p.g1, p.g2, s.h FROM pairs p JOIN sk s ON s.g = p.g2)),
      |tm AS (SELECT g1, g2, h FROM (
      |    SELECT g1, g2, h,
      |      row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn
      |    FROM m) WHERE rn <= 64),
      |fl AS (SELECT t.g1, t.g2, t.h,
      |         CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
      |              THEN 1 ELSE 0 END AS c
      |       FROM tm t
      |       LEFT JOIN sk a ON a.g = t.g1 AND a.h = t.h
      |       LEFT JOIN sk b ON b.g = t.g2 AND b.h = t.h),
      |agg AS (SELECT g1, g2, CAST(count(*) AS BIGINT) AS n_k,
      |          max(h) AS theta, CAST(sum(c) AS BIGINT) AS n_common
      |        FROM fl GROUP BY 1, 2),
      |u AS (SELECT g1, g2, n_k, n_common,
      |        CAST(CASE WHEN n_k < 64 THEN n_k
      |             ELSE (63 * 4294967296) // theta END AS BIGINT) AS union_est
      |      FROM agg)
      |SELECT g1, g2, n_k, n_common,
      |  CAST(n_common * 10000 // n_k AS BIGINT) AS jaccard_bp,
      |  union_est,
      |  CAST(n_common * union_est // n_k AS BIGINT) AS inter_est
      |FROM u ORDER BY g1, g2""".stripMargin,
    "q353_block_profile" -> """
      |WITH ks AS (
      |  SELECT 'brand' AS block_key, p_brand AS k FROM part
      |  UNION ALL
      |  SELECT 'type', p_type FROM part
      |  UNION ALL
      |  SELECT 'size_band', CAST(p_size // 10 AS VARCHAR) FROM part
      |  UNION ALL
      |  SELECT 'first_word', split_part(p_name, ' ', 1) FROM part),
      |g AS (
      |  SELECT block_key, k, CAST(count(*) AS BIGINT) AS n
      |  FROM ks WHERE k IS NOT NULL GROUP BY 1, 2)
      |SELECT block_key, CAST(sum(n) AS BIGINT) AS n_rows,
      |  CAST(count(*) AS BIGINT) AS n_blocks,
      |  CAST(max(n) AS BIGINT) AS max_block,
      |  CAST(sum(CAST(n AS HUGEINT) * (n - 1) // 2) AS BIGINT)
      |    AS pair_volume,
      |  CAST(max(n) * 10000 // NULLIF(sum(n), 0) AS BIGINT)
      |    AS top_share_bp
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q352_blocking_audit" -> """
      |WITH probes AS (
      |  SELECT p_partkey AS probe_id, p_brand FROM part
      |  WHERE p_partkey % 3 = 0),
      |pk AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS nl
      |  FROM probes GROUP BY 1),
      |rk AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS nr
      |  FROM part GROUP BY 1),
      |cand AS (SELECT CAST(coalesce(sum(CAST(nl AS HUGEINT) * nr), 0)
      |  AS BIGINT) AS n_candidates FROM pk JOIN rk USING (p_brand)),
      |tot AS (SELECT
      |  CAST((SELECT count(*) FROM probes) AS BIGINT) AS nl,
      |  CAST((SELECT count(*) FROM part) AS BIGINT) AS nr),
      |co AS (SELECT
      |  CAST((SELECT count(*) FROM probes) AS BIGINT) AS n_truth,
      |  CAST((SELECT count(*) FROM probes pr
      |        JOIN part p ON p.p_partkey = pr.probe_id
      |        WHERE p.p_brand = pr.p_brand) AS BIGINT) AS n_colocated)
      |SELECT n_candidates, CAST(nl * nr AS BIGINT) AS n_all_pairs,
      |  CAST((CAST(nl AS HUGEINT) * nr - n_candidates) * 10000
      |    // NULLIF(CAST(nl AS HUGEINT) * nr, 0) AS BIGINT)
      |    AS reduction_bp,
      |  n_truth, n_colocated,
      |  CAST(n_colocated * 10000 // NULLIF(n_truth, 0) AS BIGINT)
      |    AS completeness_bp
      |FROM cand, tot, co""".stripMargin,
    "q351_fuzzy_resolve" -> """
      |WITH probes AS (
      |  SELECT p_partkey AS probe_id, p_brand,
      |    substr(p_name, 1, 1) || substr(p_name, 3, 1) ||
      |    substr(p_name, 2, 1) || substr(p_name, 4) AS probe_name
      |  FROM part WHERE p_partkey % 3 = 0),
      |cand AS (
      |  SELECT pr.probe_id, p.p_partkey AS right_id,
      |    levenshtein(pr.probe_name, p.p_name) AS dist,
      |    CAST(round(jaro_winkler_similarity(pr.probe_name, p.p_name)
      |      * 1000000) AS BIGINT) AS jw
      |  FROM probes pr JOIN part p ON p.p_brand = pr.p_brand
      |  WHERE levenshtein(pr.probe_name, p.p_name) <= 3),
      |best AS (
      |  SELECT probe_id AS left_id, right_id, dist, jw,
      |    row_number() OVER (PARTITION BY probe_id
      |      ORDER BY dist, jw DESC, right_id) AS rk
      |  FROM cand)
      |SELECT left_id, right_id, CAST(dist AS INT) AS dist, jw AS jw_x1m
      |FROM best WHERE rk = 1 ORDER BY left_id""".stripMargin,
    "q350_damerau_typos" -> """
      |WITH t AS (
      |  SELECT p_partkey, p_name,
      |    substr(p_name, 1, 1) || substr(p_name, 3, 1) ||
      |    substr(p_name, 2, 1) || substr(p_name, 4) AS typo
      |  FROM part)
      |SELECT p_partkey,
      |  CAST(damerau_levenshtein(p_name, typo) AS INT) AS dl,
      |  CAST(levenshtein(p_name, typo) AS INT) AS lev,
      |  CAST(levenshtein(p_name, typo) - damerau_levenshtein(p_name, typo)
      |    AS INT) AS gain
      |FROM t ORDER BY p_partkey""".stripMargin,
    "q349_jaro_linkage" -> """
      |SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
      |  CAST(round(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000)
      |    AS BIGINT) AS jw_x1m
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_size // 10 = b.p_size // 10
      |  AND a.p_partkey < b.p_partkey
      |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000)
      |  >= 800000
      |ORDER BY a_id, b_id""".stripMargin,
    "q237_linkage_score" -> """
      |WITH p AS (
      |  SELECT p_partkey AS id, p_brand,
      |    split_part(p_name, ' ', 1) AS w1, p_type, p_size,
      |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      |  FROM part)
      |SELECT a.id AS a_id, b.id AS b_id,
      |  CAST(CASE WHEN a.p_type = b.p_type THEN 12 ELSE 0 END
      |    + CASE WHEN abs(a.p_size - b.p_size) <= 1 THEN 6 ELSE 0 END
      |    + CASE WHEN abs(a.cents - b.cents) <= 500 THEN 3 ELSE 0 END
      |    AS BIGINT) AS score
      |FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.w1 = b.w1
      |  AND a.id < b.id
      |WHERE CASE WHEN a.p_type = b.p_type THEN 12 ELSE 0 END
      |    + CASE WHEN abs(a.p_size - b.p_size) <= 1 THEN 6 ELSE 0 END
      |    + CASE WHEN abs(a.cents - b.cents) <= 500 THEN 3 ELSE 0 END
      |    >= 15
      |ORDER BY a_id, b_id""".stripMargin,
    "q227_golden_record" -> """
      |WITH base AS (
      |  SELECT CAST(p_partkey // 10 AS BIGINT) AS cluster,
      |    CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_brand END AS b,
      |    CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_type END AS t,
      |    p_size AS z
      |  FROM part),
      |mem AS (SELECT cluster, count(*) AS n_members FROM base GROUP BY 1),
      |pb AS (SELECT cluster, b FROM (
      |  SELECT cluster, b, row_number() OVER (PARTITION BY cluster
      |    ORDER BY count(*) DESC, b) AS rn
      |  FROM base WHERE b IS NOT NULL GROUP BY cluster, b) WHERE rn = 1),
      |pt AS (SELECT cluster, t FROM (
      |  SELECT cluster, t, row_number() OVER (PARTITION BY cluster
      |    ORDER BY count(*) DESC, t) AS rn
      |  FROM base WHERE t IS NOT NULL GROUP BY cluster, t) WHERE rn = 1),
      |pz AS (SELECT cluster, z FROM (
      |  SELECT cluster, z, row_number() OVER (PARTITION BY cluster
      |    ORDER BY count(*) DESC, z) AS rn
      |  FROM base WHERE z IS NOT NULL GROUP BY cluster, z) WHERE rn = 1)
      |SELECT mem.cluster, n_members, b AS p_brand, t AS p_type,
      |  z AS p_size
      |FROM mem
      |LEFT JOIN pb ON pb.cluster = mem.cluster
      |LEFT JOIN pt ON pt.cluster = mem.cluster
      |LEFT JOIN pz ON pz.cluster = mem.cluster
      |ORDER BY mem.cluster""".stripMargin,
    "q225_fingerprint_clusters" -> """
      |WITH k AS (
      |  SELECT doc_id,
      |    array_to_string(list_sort(list_distinct(
      |      list_filter(string_split(lower(text), ' '), x -> x <> ''))),
      |      ' ') AS fp
      |  FROM documents)
      |SELECT fp, count(*) AS n,
      |  min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM k GROUP BY fp HAVING count(*) >= 2 ORDER BY fp""".stripMargin,
    "q199_kmv" -> """
      |WITH h0 AS (SELECT DISTINCT l_returnflag AS g,
      |              ((l_partkey % 2147483648) * 2654435761) % 4294967296 AS h
      |            FROM lineitem
      |            WHERE l_partkey IS NOT NULL AND l_partkey >= 0),
      |h1 AS (SELECT g, xor(h, h // 65536) AS h FROM h0),
      |h2 AS (SELECT g, (h * 2146121005) % 4294967296 AS h FROM h1),
      |k AS (SELECT DISTINCT g, xor(h, h // 8192) AS h FROM h2),
      |r AS (SELECT g, h,
      |        row_number() OVER (PARTITION BY g ORDER BY h) AS rn,
      |        count(*) OVER (PARTITION BY g) AS nd
      |      FROM k),
      |a AS (SELECT g, CAST(max(nd) AS BIGINT) AS exact_distinct,
      |        CAST(max(CASE WHEN rn = least(nd, 64) THEN h END) AS BIGINT)
      |          AS hk
      |      FROM r GROUP BY 1)
      |SELECT g AS l_returnflag, exact_distinct,
      |  CASE WHEN exact_distinct < 64 THEN exact_distinct
      |       ELSE (63 * 4294967296) // hk END AS kmv_est,
      |  ((CASE WHEN exact_distinct < 64 THEN exact_distinct
      |         ELSE (63 * 4294967296) // hk END) - exact_distinct)
      |    * 10000 // exact_distinct AS err_bp
      |FROM a ORDER BY 1""".stripMargin,
    "q521_sample_quantiles" -> """
      |WITH h AS (
      |  SELECT event_type, CAST(round(value * 1e2) AS BIGINT) AS cents,
      |    ('0x' || substring(sha256('sq:' || CAST(event_id AS VARCHAR)),
      |      1, 15))::BIGINT AS hk,
      |    event_id
      |  FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL
      |    AND event_id IS NOT NULL),
      |s AS (
      |  SELECT event_type, cents,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY hk, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM h),
      |samp AS (
      |  SELECT event_type, n, cents,
      |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS vr,
      |    count(*) OVER (PARTITION BY event_type) AS m
      |  FROM s WHERE rn <= 256),
      |ps AS (SELECT p_ppm
      |       FROM (VALUES (500000), (900000), (990000)) t(p_ppm))
      |SELECT event_type, CAST(p_ppm AS BIGINT) AS p_ppm,
      |  CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
      |  CAST(cents AS BIGINT) AS est
      |FROM samp CROSS JOIN ps
      |WHERE vr = greatest((p_ppm * m + 999999) // 1000000, 1)
      |ORDER BY event_type, p_ppm""".stripMargin,
    "q522_sketch_merge" -> """
      |WITH h AS (
      |  SELECT event_type, CAST(round(value * 1e2) AS BIGINT) AS cents,
      |    ('0x' || substring(sha256('sq:' || CAST(event_id AS VARCHAR)),
      |      1, 15))::BIGINT AS hk,
      |    event_id
      |  FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL
      |    AND event_id IS NOT NULL),
      |s AS (
      |  SELECT event_type, cents,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY hk, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM h),
      |samp AS (
      |  SELECT event_type, n, cents,
      |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS vr,
      |    count(*) OVER (PARTITION BY event_type) AS m
      |  FROM s WHERE rn <= 256),
      |ps AS (SELECT p_ppm
      |       FROM (VALUES (500000), (900000), (990000)) t(p_ppm))
      |SELECT event_type, CAST(p_ppm AS BIGINT) AS p_ppm,
      |  CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
      |  CAST(cents AS BIGINT) AS est
      |FROM samp CROSS JOIN ps
      |WHERE vr = greatest((p_ppm * m + 999999) // 1000000, 1)
      |ORDER BY event_type, p_ppm""".stripMargin,
    "q523_quantile_rank_audit" -> """
      |WITH h AS (
      |  SELECT event_type, CAST(round(value * 1e2) AS BIGINT) AS cents,
      |    ('0x' || substring(sha256('sq:' || CAST(event_id AS VARCHAR)),
      |      1, 15))::BIGINT AS hk,
      |    event_id
      |  FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL
      |    AND event_id IS NOT NULL),
      |s AS (
      |  SELECT event_type, cents,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY hk, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM h),
      |samp AS (
      |  SELECT event_type, n, cents,
      |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS vr,
      |    count(*) OVER (PARTITION BY event_type) AS m
      |  FROM s WHERE rn <= 256),
      |ps AS (SELECT p_ppm
      |       FROM (VALUES (500000), (900000), (990000)) t(p_ppm)),
      |est AS (
      |  SELECT event_type, p_ppm, n, m, cents AS est
      |  FROM samp CROSS JOIN ps
      |  WHERE vr = greatest((p_ppm * m + 999999) // 1000000, 1))
      |SELECT e.event_type, CAST(e.p_ppm AS BIGINT) AS p_ppm,
      |  CAST(e.n AS BIGINT) AS n, CAST(e.m AS BIGINT) AS m,
      |  CAST(e.est AS BIGINT) AS est,
      |  CAST(sum(CASE WHEN x.cents <= e.est THEN 1 ELSE 0 END) AS BIGINT)
      |    AS rank_le,
      |  CAST(abs(sum(CASE WHEN x.cents <= e.est THEN 1 ELSE 0 END)
      |    * 1000000 // e.n - e.p_ppm) AS BIGINT) AS rank_err_ppm
      |FROM est e JOIN h x ON x.event_type = e.event_type
      |GROUP BY e.event_type, e.p_ppm, e.n, e.m, e.est
      |ORDER BY 1, 2""".stripMargin,
    "q172_hist_quantiles" -> """
      |WITH o AS (SELECT o_orderpriority AS g,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS x, o_orderkey AS id
      |  FROM orders),
      |st AS (SELECT g, min(x) AS lo, max(x) AS hi, count(*) AS n
      |       FROM o GROUP BY 1),
      |bc AS (SELECT g, ((x - lo) * 256) // (hi - lo + 1) AS bin,
      |         count(*) AS c
      |       FROM o JOIN st USING (g) GROUP BY 1, 2),
      |cu AS (SELECT g, bin,
      |         CAST(sum(c) OVER (PARTITION BY g ORDER BY bin
      |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |       FROM bc),
      |t AS (SELECT g, q_bp, lo, hi,
      |        ((q_bp * n) + 9999) // 10000 AS k
      |      FROM st, (SELECT unnest([5000, 9000, 9900]) AS q_bp) q),
      |e AS (SELECT t.g, q_bp, lo + (min(bin) * (hi - lo + 1)) // 256 AS est
      |      FROM t JOIN cu ON cu.g = t.g AND cu.cum >= t.k
      |      GROUP BY t.g, q_bp, lo, hi),
      |r AS (SELECT g, x,
      |        row_number() OVER (PARTITION BY g ORDER BY x, id) AS rn
      |      FROM o),
      |ex AS (SELECT t.g, t.q_bp, r.x AS exact
      |       FROM t JOIN r ON r.g = t.g AND r.rn = t.k)
      |SELECT e.g AS o_orderpriority, e.q_bp, est, exact, est - exact AS err
      |FROM e JOIN ex ON ex.g = e.g AND ex.q_bp = e.q_bp
      |ORDER BY 1, 2""".stripMargin,
    "q166_cms" -> s"""
      |WITH toks AS (SELECT $toksSql AS t FROM documents),
      |u AS (SELECT unnest(t) AS item FROM toks),
      |g AS (SELECT unnest(generate_series(0, 3)) AS r),
      |cells AS (
      |  SELECT r AS row_i,
      |    ('0x' || substring(sha256(item || ':' || CAST(r AS VARCHAR)),
      |       1, 4))::BIGINT % 256 AS bucket,
      |    count(*) AS cell
      |  FROM u CROSS JOIN g GROUP BY 1, 2),
      |n AS (SELECT CAST(sum(cell) AS BIGINT) AS n FROM cells
      |      WHERE row_i = 0),
      |q AS (SELECT item, count(*) AS cnt FROM u GROUP BY 1),
      |hh AS (SELECT item, cnt FROM q CROSS JOIN n WHERE cnt * 500 > n.n),
      |est AS (
      |  SELECT hh.item, hh.cnt, min(c.cell) AS est
      |  FROM hh CROSS JOIN g
      |  JOIN cells c ON c.row_i = g.r AND c.bucket =
      |    ('0x' || substring(sha256(hh.item || ':' ||
      |       CAST(g.r AS VARCHAR)), 1, 4))::BIGINT % 256
      |  GROUP BY 1, 2)
      |SELECT item, cnt, est, est - cnt AS overcount
      |FROM est ORDER BY item""".stripMargin,
    "q296_sketch_rollup" -> """
      |WITH e AS (
      |  SELECT user_id,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
      |      AS wk
      |  FROM events WHERE user_id IS NOT NULL AND user_id >= 0),
      |h0 AS (SELECT DISTINCT wk,
      |         ((user_id % 2147483648) * 2654435761) % 4294967296 AS h FROM e),
      |h1 AS (SELECT wk, xor(h, h // 65536) AS h FROM h0),
      |h2 AS (SELECT wk, (h * 2146121005) % 4294967296 AS h FROM h1),
      |k AS (SELECT DISTINCT wk, xor(h, h // 8192) AS h FROM h2),
      |r AS (SELECT wk, h % 64 AS bucket, h // 64 AS v FROM k),
      |rh AS (SELECT wk // 4 AS mon, bucket,
      |         CASE WHEN v = 0 THEN 27 ELSE 27 - length(bin(v)) END AS rho
      |       FROM r),
      |mg AS (SELECT mon, bucket, max(rho) AS rho FROM rh GROUP BY 1, 2),
      |grid AS (
      |  SELECT m.mon, g.bucket
      |  FROM (SELECT DISTINCT mon FROM mg) m,
      |       (SELECT unnest(generate_series(0, 63)) AS bucket) g),
      |fl AS (
      |  SELECT grid.mon, grid.bucket, coalesce(rho, 0) AS rho
      |  FROM grid LEFT JOIN mg
      |    ON mg.mon = grid.mon AND mg.bucket = grid.bucket),
      |s AS (SELECT mon,
      |        CAST(sum(CAST(1 AS BIGINT) << (27 - rho)) AS BIGINT) AS harm
      |      FROM fl GROUP BY 1),
      |ex AS (SELECT wk // 4 AS mon, count(DISTINCT user_id)
      |         AS exact_distinct
      |       FROM e GROUP BY 1)
      |SELECT CAST(s.mon AS BIGINT) AS mon,
      |  CAST(exact_distinct AS BIGINT) AS exact_distinct,
      |  (CAST(7090 AS BIGINT) * 64 * 64 * (CAST(1 AS BIGINT) << 27))
      |    // (10000 * harm) AS hll_est,
      |  abs((CAST(7090 AS BIGINT) * 64 * 64 * (CAST(1 AS BIGINT) << 27))
      |    // (10000 * harm) - exact_distinct) * 10000 // exact_distinct
      |    AS abs_err_bp
      |FROM s JOIN ex ON ex.mon = s.mon
      |ORDER BY mon""".stripMargin,
    "q190_hll_agg" -> """
      |WITH h0 AS (SELECT DISTINCT event_type,
      |              ((user_id % 2147483648) * 2654435761) % 4294967296 AS h
      |            FROM events WHERE user_id IS NOT NULL AND user_id >= 0),
      |h1 AS (SELECT event_type, xor(h, h // 65536) AS h FROM h0),
      |h2 AS (SELECT event_type, (h * 2146121005) % 4294967296 AS h FROM h1),
      |k AS (SELECT DISTINCT event_type, xor(h, h // 8192) AS h FROM h2),
      |rh AS (SELECT event_type, h % 64 AS bucket,
      |         CASE WHEN h // 64 = 0 THEN 27
      |              ELSE 27 - length(bin(h // 64)) END AS rho
      |       FROM k),
      |g AS (SELECT DISTINCT event_type FROM events),
      |b AS (SELECT event_type, unnest(generate_series(0, 63)) AS bucket
      |      FROM g)
      |SELECT b.event_type AS event_type, CAST(b.bucket AS BIGINT) AS bucket,
      |  CAST(coalesce(max(rh.rho), 0) AS BIGINT) AS rho
      |FROM b LEFT JOIN rh ON rh.event_type = b.event_type
      |                   AND rh.bucket = b.bucket
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q168_hll" -> """
      |WITH h0 AS (SELECT DISTINCT ((user_id % 2147483648) * 2654435761) % 4294967296 AS h
      |            FROM events WHERE user_id IS NOT NULL AND user_id >= 0),
      |h1 AS (SELECT xor(h, h // 65536) AS h FROM h0),
      |h2 AS (SELECT (h * 2146121005) % 4294967296 AS h FROM h1),
      |k AS (SELECT DISTINCT xor(h, h // 8192) AS h FROM h2),
      |r AS (SELECT h % 64 AS bucket, h // 64 AS v FROM k),
      |rh AS (SELECT bucket,
      |         CASE WHEN v = 0 THEN 27 ELSE 27 - length(bin(v)) END AS rho
      |       FROM r),
      |regs AS (SELECT g.bucket, coalesce(max(rh.rho), 0) AS rho
      |         FROM (SELECT unnest(generate_series(0, 63)) AS bucket) g
      |         LEFT JOIN rh ON rh.bucket = g.bucket GROUP BY 1),
      |s AS (SELECT CAST(sum(CAST(1 AS BIGINT) << (27 - rho)) AS BIGINT)
      |        AS harm FROM regs),
      |ex AS (SELECT count(*) AS exact_distinct FROM k)
      |SELECT CAST(64 AS BIGINT) AS m, exact_distinct,
      |  (CAST(7090 AS BIGINT) * 64 * 64 * (CAST(1 AS BIGINT) << 27))
      |    // (10000 * harm) AS hll_est,
      |  ((((CAST(7090 AS BIGINT) * 64 * 64 * (CAST(1 AS BIGINT) << 27))
      |    // (10000 * harm)) - exact_distinct) * 10000) // exact_distinct
      |    AS err_bp
      |FROM ex CROSS JOIN s
      |ORDER BY 1""".stripMargin,
    "q119_decontaminate" -> s"""
      |WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |        unnest(list_transform(generate_series(1, len(t) - 3),
      |          i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]))
      |          AS gram
      |      FROM toks),
      |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
      |hits AS (SELECT g.doc_id, count(*) AS n FROM g JOIN ev USING (gram)
      |         WHERE g.doc_id % 97 <> 0 GROUP BY 1)
      |SELECT d.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_shared,
      |       CAST(CASE WHEN coalesce(h.n, 0) > 0 THEN 1 ELSE 0 END AS INT)
      |         AS contaminated
      |FROM documents d LEFT JOIN hits h USING (doc_id)
      |WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id""".stripMargin,
    "q358_bpe_train" -> bpeOracleSql(4),
    "q365_bpe_apply" -> bpeApplyOracleSql(4),
    "q373_fellegi_sunter" -> """
      |WITH p AS (
      |  SELECT (c_custkey % 3 = 0) AS im,
      |    CASE WHEN c_custkey % 3 = 0 THEN c_custkey % 10 <> 0
      |         ELSE c_custkey % 20 = 0 END AS name_agree,
      |    CASE WHEN c_custkey % 3 = 0 THEN c_custkey % 10 < 7
      |         ELSE c_custkey % 5 = 0 END AS segment_agree,
      |    CASE WHEN c_custkey % 3 = 0 THEN c_custkey % 100 <> 0
      |         ELSE c_custkey % 100 = 50 END AS phone_agree
      |  FROM customer),
      |a AS (
      |  SELECT 'name_agree' AS field,
      |    sum(CASE WHEN im AND name_agree THEN 1 ELSE 0 END) AS ma,
      |    sum(CASE WHEN NOT im AND name_agree THEN 1 ELSE 0 END) AS ua
      |  FROM p
      |  UNION ALL
      |  SELECT 'segment_agree',
      |    sum(CASE WHEN im AND segment_agree THEN 1 ELSE 0 END),
      |    sum(CASE WHEN NOT im AND segment_agree THEN 1 ELSE 0 END)
      |  FROM p
      |  UNION ALL
      |  SELECT 'phone_agree',
      |    sum(CASE WHEN im AND phone_agree THEN 1 ELSE 0 END),
      |    sum(CASE WHEN NOT im AND phone_agree THEN 1 ELSE 0 END)
      |  FROM p),
      |t AS (SELECT sum(CASE WHEN im THEN 1 ELSE 0 END) AS nm,
      |        sum(CASE WHEN NOT im THEN 1 ELSE 0 END) AS nu FROM p)
      |SELECT field, CAST(nm AS BIGINT) AS n_match,
      |  CAST(nu AS BIGINT) AS n_unmatch,
      |  CAST(ma * 1000000 // nm AS BIGINT) AS m_ppm,
      |  CAST(ua * 1000000 // nu AS BIGINT) AS u_ppm,
      |  CAST((length(bin(ma * 1000000 // nm))
      |      - length(bin(ua * 1000000 // nu))) * 100 AS BIGINT)
      |    AS agree_w_cb,
      |  CAST((length(bin(1000000 - ma * 1000000 // nm))
      |      - length(bin(1000000 - ua * 1000000 // nu))) * 100 AS BIGINT)
      |    AS disagree_w_cb
      |FROM a, t ORDER BY field""".stripMargin,
    "q368_nucleus" -> """
      |WITH t AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS tot
      |           FROM documents GROUP BY 1),
      |r AS (SELECT lang, doc_id, n_chars,
      |        CAST(row_number() OVER (PARTITION BY lang
      |          ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank,
      |        CAST(sum(n_chars) OVER (PARTITION BY lang
      |          ORDER BY n_chars DESC, doc_id) AS BIGINT) AS cum
      |      FROM documents)
      |SELECT r.lang, doc_id, n_chars, rank, cum AS cum_weight,
      |  t.tot AS total_weight
      |FROM r JOIN t USING (lang)
      |WHERE (cum - n_chars) * 10000 < tot * 8000
      |ORDER BY lang, rank""".stripMargin,
    "q367_host_cap" -> s"""
      |WITH u AS ($messyUrlsSql),
      |h AS (SELECT url, lower(regexp_extract(url,
      |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host FROM u),
      |r AS (SELECT url, host, CAST(row_number() OVER (
      |        PARTITION BY host ORDER BY sha256(url), url) AS BIGINT)
      |        AS rk
      |      FROM h WHERE host <> '')
      |SELECT url, host, rk FROM r WHERE rk <= 25
      |ORDER BY host, rk""".stripMargin,
    "q359_url_canonical" -> s"""
      |WITH u AS ($messyUrlsSql),
      |c AS (
      |  SELECT
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      |      AS scheme,
      |    lower(regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
      |    regexp_replace(regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/+$$', '')
      |      AS path,
      |    array_to_string(list_sort(list_filter(
      |      string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
      |      p -> p <> '' AND NOT regexp_matches(p,
      |        '^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)='))), '&') AS kept
      |  FROM u),
      |k AS (
      |  SELECT host,
      |    CASE WHEN scheme = '' OR host = '' THEN ''
      |         ELSE scheme || '://' || host || path ||
      |              CASE WHEN kept = '' THEN '' ELSE '?' || kept END
      |    END AS canon
      |  FROM c)
      |SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
      |  CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
      |  CAST((count(*) - count(DISTINCT canon)) * 10000 // count(*)
      |    AS BIGINT) AS dup_bp
      |FROM k WHERE canon <> '' GROUP BY host ORDER BY host""".stripMargin,
    "q360_domain_blocklist" -> s"""
      |WITH u AS ($messyUrlsSql),
      |h AS (SELECT regexp_extract(lower(url),
      |        '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host FROM u),
      |b AS (SELECT * FROM (VALUES ('example.com'), ('shop-3.example.com'),
      |        ('shop-7.example.com'), ('blocked.net')) v(entry)),
      |ph AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls
      |       FROM h GROUP BY 1),
      |sfx AS (SELECT host, unnest(list_transform(
      |          generate_series(1, len(string_split(host, '.'))),
      |          i -> array_to_string(string_split(host, '.')[i:], '.')))
      |          AS sfx
      |        FROM ph),
      |m AS (SELECT host, entry FROM (
      |        SELECT s.host, b.entry, row_number() OVER (
      |          PARTITION BY s.host ORDER BY length(b.entry) DESC) AS rn
      |        FROM sfx s JOIN b ON s.sfx = b.entry) WHERE rn = 1),
      |agg AS (SELECT m.entry, CAST(count(*) AS BIGINT) AS n_hosts,
      |          CAST(sum(ph.n_urls) AS BIGINT) AS n_urls
      |        FROM m JOIN ph USING (host) GROUP BY 1)
      |SELECT b.entry, CAST(coalesce(agg.n_hosts, 0) AS BIGINT) AS n_hosts,
      |  CAST(coalesce(agg.n_urls, 0) AS BIGINT) AS n_urls
      |FROM b LEFT JOIN agg USING (entry) ORDER BY entry""".stripMargin,
    "q361_line_dedup" -> s"""
      |WITH d AS ($compositeDocsSql),
      |l0 AS (SELECT doc_id, unnest(list_transform(
      |         generate_series(1, len(string_split(text, chr(10)))),
      |         i -> {'pos': i, 'line': string_split(text, chr(10))[i]}))
      |         AS s FROM d),
      |l AS (SELECT doc_id, s.pos AS pos, s.line AS line FROM l0
      |      WHERE s.line <> ''),
      |f AS (SELECT line, count(*) AS df FROM l GROUP BY 1),
      |j AS (SELECT l.doc_id, l.pos, l.line, f.df <= 10 AS keep
      |      FROM l JOIN f USING (line))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(coalesce(sum(CASE WHEN keep THEN length(line) END), 0)
      |    AS BIGINT) AS chars_kept,
      |  sha256(coalesce(string_agg(CASE WHEN keep THEN line END,
      |    chr(10) ORDER BY pos), '')) AS clean_sha
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q120_bpe_pairs" -> s"""
      |WITH w AS (SELECT x AS w, count(*) AS freq
      |           FROM (SELECT doc_id, unnest($toksSql) AS x FROM documents)
      |           GROUP BY 1),
      |p AS (SELECT unnest(list_transform(generate_series(1, length(w) - 1),
      |        i -> substring(w, i, 2))) AS pair, freq
      |      FROM w WHERE length(w) >= 2)
      |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
      |FROM p GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,
    "q121_winsorized" -> """
      |WITH r AS (
      |  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)) AS rn,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders),
      |f AS (SELECT o_orderpriority,
      |        CAST(sum(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS BIGINT) AS p25,
      |        CAST(sum(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS BIGINT) AS p75
      |      FROM r GROUP BY 1)
      |SELECT r.o_orderpriority, count(*) AS n,
      |       CAST(sum(greatest(f.p25, least(f.p75, r.cents))) AS BIGINT) AS wsum
      |FROM r JOIN f USING (o_orderpriority)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q122_mode" -> """
      |WITH c AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |         count(*) AS c
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, cents AS mode_value, c AS mode_count
      |FROM c
      |QUALIFY row_number() OVER (PARTITION BY event_type
      |  ORDER BY c DESC, cents) = 1
      |ORDER BY event_type""".stripMargin,
    "q123_bitmap_distinct" -> """
      |SELECT event_type, count(DISTINCT user_id) AS n_distinct
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q110_heavy_hitters" -> s"""
      |WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |b AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
      |        i -> t[i] || ' ' || t[i + 1])) AS item
      |      FROM toks)
      |SELECT item, count(*) AS cnt FROM b
      |GROUP BY item HAVING count(*) * 800 > (SELECT count(*) FROM b)
      |ORDER BY item""".stripMargin,
    "q111_url_parse" -> """
      |WITH u AS (SELECT
      |    'shop-' || (c_custkey % 20) || '.example.com' AS host,
      |    '/seg/' || lower(c_mktsegment) || '/item' AS path,
      |    CAST(c_nationkey AS VARCHAR) AS nat
      |  FROM customer)
      |SELECT host, count(*) AS n_urls, count(DISTINCT nat) AS n_nations,
      |       min(path) AS first_path
      |FROM u GROUP BY host ORDER BY host""".stripMargin,
    "q112_boilerplate" -> s"""
      |WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
      |        i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS gram
      |      FROM toks),
      |fl AS (SELECT gram
      |       FROM (SELECT gram, count(DISTINCT doc_id) AS ndw FROM g GROUP BY 1)
      |       WHERE ndw * 25 > (SELECT count(*) FROM documents))
      |SELECT doc_id, count(*) AS n_grams,
      |       CAST(sum(CASE WHEN gram IN (SELECT gram FROM fl)
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
      |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // label propagation unrolled: per round a labeled-neighbor vote count
    // and a (count desc, label) argmax, seeds clamped via coalesce order
    "q257_label_prop" -> """
      |WITH mm AS (SELECT (max(o_orderkey) + 1) // 50 AS m FROM orders),
      |nodes AS (SELECT DISTINCT o_orderkey % m AS node FROM orders, mm),
      |e AS (SELECT node AS src, (node + 1) % m AS dst FROM nodes, mm
      |      UNION ALL
      |      SELECT node, (node * 13 + 3) % m FROM nodes, mm),
      |l0 AS (SELECT node,
      |         CASE WHEN node % 10 = 0 THEN node % 4 END AS label
      |       FROM nodes),
      |v1 AS (SELECT e.dst AS node, l.label, count(*) AS c
      |       FROM e JOIN l0 l ON l.node = e.src
      |       WHERE l.label IS NOT NULL GROUP BY 1, 2),
      |b1 AS (SELECT node, label FROM (
      |         SELECT *, row_number() OVER (PARTITION BY node
      |           ORDER BY c DESC, label) AS rk FROM v1) WHERE rk = 1),
      |l1 AS (SELECT n.node,
      |         coalesce(CASE WHEN n.node % 10 = 0 THEN n.node % 4 END,
      |           b1.label) AS label
      |       FROM nodes n LEFT JOIN b1 ON b1.node = n.node),
      |v2 AS (SELECT e.dst AS node, l.label, count(*) AS c
      |       FROM e JOIN l1 l ON l.node = e.src
      |       WHERE l.label IS NOT NULL GROUP BY 1, 2),
      |b2 AS (SELECT node, label FROM (
      |         SELECT *, row_number() OVER (PARTITION BY node
      |           ORDER BY c DESC, label) AS rk FROM v2) WHERE rk = 1),
      |l2 AS (SELECT n.node,
      |         coalesce(CASE WHEN n.node % 10 = 0 THEN n.node % 4 END,
      |           b2.label) AS label
      |       FROM nodes n LEFT JOIN b2 ON b2.node = n.node)
      |SELECT node, CAST(label AS BIGINT) AS label FROM l2
      |ORDER BY node""".stripMargin,
    // HITS unrolled: per iteration an auth sum from previous hubs, an
    // integer max-rescale ((s*r0)//max, r0 = 2^20), then the hub sum from
    // the NEW auths with its own rescale — literally Graph.hitsInt's steps
    "q252_hits" -> """
      |WITH mm AS (SELECT (max(o_orderkey) + 1) // 50 AS m FROM orders),
      |nodes AS (SELECT DISTINCT o_orderkey % m AS node FROM orders, mm),
      |e AS (SELECT node AS src, (node + 1) % m AS dst FROM nodes, mm
      |      UNION ALL
      |      SELECT node, (node * 13 + 3) % m FROM nodes, mm),
      |h0 AS (SELECT node, CAST(1048576 AS BIGINT) AS v FROM nodes),
      |a1s AS (SELECT e.dst AS node, sum(h0.v) AS s
      |        FROM e JOIN h0 ON h0.node = e.src GROUP BY 1),
      |a1r AS (SELECT n.node, coalesce(s.s, 0) AS s
      |        FROM nodes n LEFT JOIN a1s s ON s.node = n.node),
      |a1 AS (SELECT node, (s * 1048576) // greatest((SELECT max(s) FROM a1r), 1) AS v
      |       FROM a1r),
      |h1s AS (SELECT e.src AS node, sum(a1.v) AS s
      |        FROM e JOIN a1 ON a1.node = e.dst GROUP BY 1),
      |h1r AS (SELECT n.node, coalesce(s.s, 0) AS s
      |        FROM nodes n LEFT JOIN h1s s ON s.node = n.node),
      |h1 AS (SELECT node, (s * 1048576) // greatest((SELECT max(s) FROM h1r), 1) AS v
      |       FROM h1r),
      |a2s AS (SELECT e.dst AS node, sum(h1.v) AS s
      |        FROM e JOIN h1 ON h1.node = e.src GROUP BY 1),
      |a2r AS (SELECT n.node, coalesce(s.s, 0) AS s
      |        FROM nodes n LEFT JOIN a2s s ON s.node = n.node),
      |a2 AS (SELECT node, (s * 1048576) // greatest((SELECT max(s) FROM a2r), 1) AS v
      |       FROM a2r),
      |h2s AS (SELECT e.src AS node, sum(a2.v) AS s
      |        FROM e JOIN a2 ON a2.node = e.dst GROUP BY 1),
      |h2r AS (SELECT n.node, coalesce(s.s, 0) AS s
      |        FROM nodes n LEFT JOIN h2s s ON s.node = n.node),
      |h2 AS (SELECT node, (s * 1048576) // greatest((SELECT max(s) FROM h2r), 1) AS v
      |       FROM h2r)
      |SELECT h2.node, CAST(h2.v AS BIGINT) AS hub, CAST(a2.v AS BIGINT) AS auth
      |FROM h2 JOIN a2 ON a2.node = h2.node ORDER BY 1""".stripMargin,
    "q113_pagerank" -> """
      |WITH mm AS (SELECT (max(o_orderkey) + 1) // 50 AS m FROM orders),
      |nodes AS (SELECT DISTINCT o_orderkey % m AS node FROM orders, mm),
      |e AS (SELECT node AS src, (node + 1) % m AS dst FROM nodes, mm
      |      UNION ALL
      |      SELECT node, (node * 13 + 3) % m FROM nodes, mm),
      |d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
      |r0 AS (SELECT node, CAST(1099511627776 AS BIGINT) AS r FROM nodes),
      |s1 AS (SELECT e.dst, sum(r0.r // d.outdeg) AS s
      |       FROM e JOIN d USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
      |r1 AS (SELECT n.node,
      |         (15 * 1099511627776) // 100 + (coalesce(s.s, 0) * 85) // 100 AS r
      |       FROM nodes n LEFT JOIN s1 s ON s.dst = n.node),
      |s2 AS (SELECT e.dst, sum(r1.r // d.outdeg) AS s
      |       FROM e JOIN d USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
      |r2 AS (SELECT n.node,
      |         (15 * 1099511627776) // 100 + (coalesce(s.s, 0) * 85) // 100 AS r
      |       FROM nodes n LEFT JOIN s2 s ON s.dst = n.node),
      |s3 AS (SELECT e.dst, sum(r2.r // d.outdeg) AS s
      |       FROM e JOIN d USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1),
      |r3 AS (SELECT n.node,
      |         (15 * 1099511627776) // 100 + (coalesce(s.s, 0) * 85) // 100 AS r
      |       FROM nodes n LEFT JOIN s3 s ON s.dst = n.node)
      |SELECT node, CAST(r AS BIGINT) AS rank FROM r3 ORDER BY node""".stripMargin,
    "q114_ewma" -> """
      |WITH b AS (SELECT event_id, user_id,
      |             CAST(round(value * 100) AS BIGINT) AS c, ts FROM events),
      |w AS (SELECT event_id, user_id,
      |        lag(c, 0) OVER win AS l0, lag(c, 1) OVER win AS l1,
      |        lag(c, 2) OVER win AS l2, lag(c, 3) OVER win AS l3,
      |        lag(c, 4) OVER win AS l4, lag(c, 5) OVER win AS l5,
      |        lag(c, 6) OVER win AS l6, lag(c, 7) OVER win AS l7
      |      FROM b WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_id, user_id,
      |  CAST(coalesce(l0 * 128, 0) + coalesce(l1 * 64, 0) + coalesce(l2 * 32, 0)
      |     + coalesce(l3 * 16, 0) + coalesce(l4 * 8, 0) + coalesce(l5 * 4, 0)
      |     + coalesce(l6 * 2, 0) + coalesce(l7, 0) AS BIGINT) AS ewma_num,
      |  CAST((CASE WHEN l0 IS NULL THEN 0 ELSE 128 END)
      |     + (CASE WHEN l1 IS NULL THEN 0 ELSE 64 END)
      |     + (CASE WHEN l2 IS NULL THEN 0 ELSE 32 END)
      |     + (CASE WHEN l3 IS NULL THEN 0 ELSE 16 END)
      |     + (CASE WHEN l4 IS NULL THEN 0 ELSE 8 END)
      |     + (CASE WHEN l5 IS NULL THEN 0 ELSE 4 END)
      |     + (CASE WHEN l6 IS NULL THEN 0 ELSE 2 END)
      |     + (CASE WHEN l7 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS weight_sum
      |FROM w ORDER BY event_id""".stripMargin,
    "q115_anomaly" -> """
      |WITH b AS (SELECT event_id, user_id,
      |             CAST(round(value * 100) AS BIGINT) AS c, ts FROM events),
      |w AS (SELECT event_id, c,
      |        count(c) OVER win AS m,
      |        CAST(coalesce(sum(c) OVER win, 0) AS BIGINT) AS s,
      |        CAST(coalesce(sum(c * c) OVER win, 0) AS BIGINT) AS q
      |      FROM b WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING))
      |SELECT event_id, CAST(m AS BIGINT) AS baseline_n,
      |  CAST(CASE WHEN m = 16 AND (m * c - s) * (m * c - s) > 9 * (m * q - s * s)
      |            THEN 1 ELSE 0 END AS INT) AS anomaly
      |FROM w ORDER BY event_id""".stripMargin,
    "q375_dsir_weights" -> s"""
      |WITH t AS (
      |  SELECT doc_id, tgt,
      |    ('0x' || substring(sha256(token), 1, 4))::BIGINT % 64 AS b
      |  FROM (SELECT doc_id, lang = 'en' AS tgt,
      |          unnest($toksSql) AS token FROM documents)),
      |pd AS (SELECT doc_id, b, any_value(tgt) AS tgt, count(*) AS n
      |       FROM t GROUP BY 1, 2),
      |bs AS (SELECT b, sum(n) AS raw,
      |         sum(CASE WHEN tgt THEN n ELSE 0 END) AS tgtc
      |       FROM pd GROUP BY 1),
      |tot AS (SELECT sum(raw) AS rawtot, sum(tgtc) AS tgttot FROM bs),
      |g AS (SELECT b,
      |        (length(bin(rawtot + 64)) - length(bin(raw + 1)))
      |      - (length(bin(tgttot + 64)) - length(bin(tgtc + 1))) AS gain
      |      FROM bs CROSS JOIN tot),
      |w AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
      |        CAST(sum(n * gain) AS BIGINT) AS weight_bits
      |      FROM pd JOIN g USING (b) GROUP BY 1)
      |SELECT d.doc_id, d.lang = 'en' AS is_target,
      |  coalesce(w.n_tokens, 0) AS n_tokens,
      |  coalesce(w.weight_bits, 0) AS weight_bits
      |FROM documents d LEFT JOIN w USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin,
    "q390_epoch_plan" -> s"""
      |WITH a AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len($toksSql)) AS BIGINT) AS tokens_avail
      |  FROM documents GROUP BY 1),
      |t(source, target_bp) AS (VALUES
      |  ('src0', CAST(4000 AS BIGINT)), ('src1', 3000), ('src2', 2000),
      |  ('srcX', 1000)),
      |j AS (
      |  SELECT coalesce(a.source, t.source) AS source,
      |    coalesce(n_docs, 0) AS n_docs,
      |    coalesce(tokens_avail, 0) AS tokens_avail,
      |    coalesce(target_bp, 0) AS target_bp
      |  FROM a FULL OUTER JOIN t ON t.source = a.source)
      |SELECT source, n_docs, tokens_avail, target_bp,
      |  CAST(10000000 * target_bp // 10000 AS BIGINT) AS tokens_needed,
      |  CAST(CASE WHEN 10000000 * target_bp // 10000 = 0 THEN 0
      |       WHEN tokens_avail > 0 THEN
      |         (10000000 * target_bp // 10000 + tokens_avail - 1)
      |           // tokens_avail END AS BIGINT) AS epochs,
      |  CAST(CASE WHEN tokens_avail > 0 THEN
      |    (10000000 * target_bp // 10000) * 10000 // tokens_avail
      |    END AS BIGINT) AS oversample_bp
      |FROM j ORDER BY source""".stripMargin,
    "q391_window_waste" -> s"""
      |WITH d AS (
      |  SELECT source, CAST(len($toksSql) AS BIGINT) AS t
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(t) AS BIGINT) AS tokens,
      |  CAST(sum(CASE WHEN t > 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
      |  CAST(sum(greatest(t - 64, 0)) AS BIGINT) AS trunc_waste,
      |  CAST(sum((t + 63) // 64) AS BIGINT) AS n_chunks,
      |  CAST(sum((t + 63) // 64) * 64 - sum(t) AS BIGINT) AS pad_waste
      |FROM d GROUP BY 1 ORDER BY source""".stripMargin,
    "q116_feature_hash" -> s"""
      |WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents)
      |SELECT doc_id,
      |  ('0x' || substring(sha256(token), 1, 4))::BIGINT % 64 AS bucket,
      |  count(*) AS n
      |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q117_vocab_encode" -> s"""
      |WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |pe AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos FROM toks),
      |tok AS (SELECT doc_id, CAST(pos AS INT) AS pos, t[pos] AS token FROM pe),
      |vc AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
      |v AS (SELECT token,
      |        CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS token_id
      |      FROM vc)
      |SELECT tok.doc_id, tok.pos, v.token_id
      |FROM tok JOIN v USING (token) ORDER BY doc_id, pos""".stripMargin,
    "q118_pmi_bigrams" -> s"""
      |WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |uni AS (SELECT x, count(*) AS c
      |        FROM (SELECT unnest(t) AS x FROM toks) GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM (SELECT unnest(t) AS x FROM toks)),
      |bi AS (SELECT bigram, count(*) AS c_xy FROM (
      |         SELECT unnest(list_transform(generate_series(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i + 1])) AS bigram FROM toks)
      |       GROUP BY 1 HAVING count(*) >= 5),
      |sp AS (SELECT bigram, c_xy,
      |         string_split(bigram, ' ')[1] AS x,
      |         string_split(bigram, ' ')[2] AS y FROM bi)
      |SELECT sp.bigram AS xy, sp.c_xy,
      |  CAST((sp.c_xy * n.n * 100) // (ux.c * uy.c) AS BIGINT) AS pmi_scaled
      |FROM sp CROSS JOIN n
      |JOIN uni ux ON ux.x = sp.x
      |JOIN uni uy ON uy.x = sp.y
      |ORDER BY pmi_scaled DESC, xy LIMIT 50""".stripMargin)
}
