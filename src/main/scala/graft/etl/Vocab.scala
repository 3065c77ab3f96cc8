package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level vocabulary, feature-encoding, and boilerplate operators —
  * the dataset-wide half of the text-curation surface ([[Corpus]] holds the
  * per-document half). All outputs are integers or strings; ratios stay as
  * (numerator, denominator) pairs or pre-scaled integer quotients so the
  * cross-engine oracle compare is exact.
  */
object Vocab {

  /** (doc_id, pos, gram) sliding word n-grams; pos is 1-based. Same
    * constant-evaluation shape as [[Corpus.bigramsOf]] (slices, not a
    * per-element lambda over the token array). */
  private[graft] def ngramRows(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = Corpus.tokensOf(col(textCol))
    val grams = (0 until n).map { i =>
      val len = greatest(size(toks) - (n - 1), lit(0))
      slice(toks, lit(i + 1), len)
    }.reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
    // pinned per-doc gram arrays (same rationale as Similarity.pinnedTokens):
    // every caller consumes the gram rows at least twice (frequency census +
    // position join), and un-pinned each consumer re-ran the tokenize +
    // n-fold zip_with construction over the corpus
    Parallelism.spread(docs).select(col(idCol), grams.as("_grams"))
      .localCheckpoint(eager = false)
      .select(col(idCol), posexplode(col("_grams")).as(Seq("pos0", "gram")))
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("gram"))
  }

  /** Dataset-level boilerplate audit (the cross-document analogue of the
    * Gopher intra-document repetition gates in [[Corpus.repetitionStats]]):
    * an n-gram is boilerplate when it appears in more than |docs|/freqDiv
    * distinct documents; per document, report total n-gram positions and
    * how many land on a boilerplate gram. The gram→doc-count aggregation
    * is combiner-friendly (distinct (doc,gram) then count by gram) and the
    * flag join is on the gram key — no all-pairs anything. */
  def boilerplateNgrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, freqDiv: Int = 25): DataFrame = {
    val grams = ngramRows(docs, idCol, textCol, n)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val flagged = grams.select(col(idCol), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("n_docs_with"))
      .join(broadcast(nDocs))
      .filter(col("n_docs_with") * freqDiv > col("n_docs"))
      .select(col("gram"), lit(1).as("is_boiler"))
    grams.join(flagged, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("is_boiler")), lit(0L)).cast("long").as("n_boiler"))
  }

  /** Benchmark decontamination: per NON-eval document, how many of its
    * distinct word n-grams also occur in the eval split (`evalPred` rows),
    * plus a 0/1 contaminated flag. Eval sets are small by construction, so
    * their gram set broadcasts and the corpus never shuffles for the
    * overlap join; the distinct (doc, gram) pass and the per-doc count are
    * the only shuffles. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      evalPred: Column, n: Int = 4): DataFrame = {
    val grams = ngramRows(docs, idCol, textCol, n)
      .select(col(idCol), col("gram")).distinct()
    val evalGrams = docs.filter(evalPred)
      .select(col(idCol)).join(grams, idCol)
      .select(col("gram")).distinct()
    val hits = docs.filter(!evalPred).select(col(idCol)).join(grams, idCol)
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    docs.filter(!evalPred).select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n"), lit(0L)).as("n_shared"),
        when(coalesce(col("n"), lit(0L)) > 0, lit(1)).otherwise(lit(0))
          .as("contaminated"))
  }

  /** Hashing-trick feature counts: token → bucket via the repo's standard
    * cross-engine hash (first 4 sha256 hex digits, Strings/TrainingData
    * train-split recipe) mod `buckets`; output (doc, bucket, n). Bounded
    * output — ≤ buckets rows per doc — and one combiner-friendly shuffle. */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64): DataFrame = {
    val bucket = conv(substring(sha2(col("token"), 256), 1, 4), 16, 10)
      .cast("long") % buckets
    docs.select(col(idCol), explode(Corpus.tokensOf(col(textCol))).as("token"))
      .select(col(idCol), bucket.as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Global frequency-ranked vocabulary: token_id 1.. by (count DESC,
    * token ASC), ranked WITHOUT a single-partition global window.
    *
    * Two-phase rank: range-partition the distinct-term table on the sort
    * key (partition i wholly precedes partition i+1, and keys are unique
    * because `token` breaks count ties, so any sampled boundary split
    * yields the same global order), rank within partitions in parallel,
    * then add broadcast per-partition offsets. The offsets table has
    * `rankPartitions` rows — its cumulative-sum window is the only
    * single-partition step left and is O(rankPartitions). The term table
    * is localCheckpointed so the rank pass and the offset count don't
    * recompute the corpus-sized explode+count.
    *
    * `minCount` floors the vocabulary so the ranked table (and any
    * downstream broadcast) is bounded by N/minCount by construction — on
    * a web corpus the raw token domain (hapax/garbage/unicode) can be
    * 10⁸–10⁹, the ≥2-count vocabulary orders of magnitude smaller. */
  def vocabulary(docs: DataFrame, textCol: String, minCount: Long = 1,
      rankPartitions: Int = 32): DataFrame = {
    val counts = docs
      .select(explode(Corpus.tokensOf(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val bucketed = counts
      .repartitionByRange(rankPartitions, col("cnt").desc, col("token").asc)
      .withColumn("bucket", spark_partition_id())
      .localCheckpoint()
    val local = bucketed.withColumn("local_rank", row_number().over(
      Window.partitionBy(col("bucket"))
        .orderBy(col("cnt").desc, col("token"))))
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("sz"))
      .withColumn("off", coalesce(
        sum(col("sz")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("off"))
    local.join(broadcast(offsets), "bucket")
      .select(col("token"), col("cnt"),
        (col("off") + col("local_rank")).cast("int").as("token_id"))
  }

  /** Zipf rank–frequency fit per language: OLS slope of ⌊log₂count⌋ on
    * ⌊log₂rank⌋ over the top `maxRank` tokens with count ≥ `minCount` —
    * the corpus-health screen (natural text decays with slope ≈ −1; a
    * flat decay flags boilerplate/templating flooding the head, a cliff
    * flags a truncated or synthetic vocabulary). Both logs are floored
    * bit-lengths, so the five OLS sufficient statistics are sums of tiny
    * integers (x ≤ ⌊log₂maxRank⌋, y < 64) and the closed-form slope
    *   (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * is an exact long fraction. `decay_milli` negates the (negative)
    * slope and clamps at 0 before the floored division so Spark's
    * truncating `div` and DuckDB's flooring `//` agree. The per-language
    * rank window is bounded by the minCount-floored head of the
    * vocabulary, never the token stream. */
  def zipfFit(docs: DataFrame, langCol: String, textCol: String,
      minCount: Long = 2, maxRank: Int = 4096): DataFrame = {
    val counts = docs
      .select(col(langCol), explode(Corpus.tokensOf(col(textCol)))
        .as("token"))
      .groupBy(col(langCol), col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val w = Window.partitionBy(col(langCol))
      .orderBy(col("cnt").desc, col("token"))
    val xy = counts.withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") <= maxRank)
      .select(col(langCol),
        (length(expr("bin(r)")) - 1).cast("long").as("x"),
        (length(expr("bin(cnt)")) - 1).cast("long").as("y"))
    xy.groupBy(col(langCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col(langCol), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
        expr("""CAST(greatest(-(n * sxy - sx * sy), 0) * 1000
                div NULLIF(n * sxx - sx * sx, 0) AS BIGINT)""")
          .as("decay_milli"))
  }

  /** Good–Turing unseen-mass estimate per language: the probability the
    * NEXT token drawn is a type never seen in this corpus,
    * P₀ ≈ N₁/N (hapax count over token count — the leave-one-out
    * argument: a token is "new" exactly as often as it was a singleton),
    * plus the supporting vocabulary census (types, hapax/dis legomena,
    * type–token ratio in ppm). The coverage forecast a tokenizer/vocab
    * freeze is sized against — high unseen mass says the corpus slice
    * is still growing vocabulary and an OOV bucket will be hot. Two
    * keyed aggregations, everything exact-integer. */
  def unseenMass(docs: DataFrame, langCol: String,
      textCol: String): DataFrame = {
    val counts = docs
      .select(col(langCol), explode(Corpus.tokensOf(col(textCol)))
        .as("token"))
      .groupBy(col(langCol), col("token")).agg(count(lit(1)).as("cnt"))
    counts.groupBy(col(langCol))
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("cnt") === 2, 1L).otherwise(0L)).as("dis"))
      .select(col(langCol), col("n_tokens"), col("n_types"), col("hapax"),
        col("dis"),
        expr("hapax * 1000000 div n_tokens").as("unseen_ppm"),
        expr("n_types * 1000000 div n_tokens").as("ttr_ppm"))
  }

  /** Encode documents as (doc, pos, token_id) against the global
    * [[vocabulary]] — the id-mapping side of tokenization. Tokens below
    * the `minCount` floor encode as the OOV id 0. No explicit broadcast
    * hint: the floored vocabulary usually broadcasts, but that is AQE's
    * runtime call — the fallback is a correct shuffle join on the token
    * key, never a driver OOM. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 1): DataFrame = {
    val vocab = vocabulary(docs, textCol, minCount)
      .select(col("token"), col("token_id"))
    docs.select(col(idCol),
        posexplode(Corpus.tokensOf(col(textCol))).as(Seq("pos0", "token")))
      .join(vocab, Seq("token"), "left")
      .select(col(idCol), (col("pos0") + 1).as("pos"),
        coalesce(col("token_id"), lit(0)).as("token_id"))
  }

  /** Duplicated-span audit — the shuffle-friendly core of substring
    * deduplication (the Lee et al. 2022 "Deduplicating Training Data"
    * operation, minus the suffix array): an n-gram POSITION is duplicated
    * when its gram occurs ≥2 times corpus-wide (within- or cross-doc);
    * per document, report total positions, duplicated positions, and the
    * longest consecutive duplicated run (a run of r positions ≈ a
    * duplicated span of r+n−1 tokens). A true suffix array finds spans at
    * every length simultaneously; fixing the anchor length n trades that
    * for three bounded shuffles — gram count (combiner-friendly), a join
    * back on the gram key, and one per-doc window — which is the shape
    * that survives 100 TB. Islands via the pos − row_number trick (same
    * as [[Events.mergeIntervals]]), no self-join. */
  /** Per-doc n-gram novelty: the fraction of a doc's distinct shingles
    * whose FIRST appearance (minimum doc id over the corpus) is this doc —
    * the repetition-aware curation score (a doc of recycled phrases scores
    * near 0, genuinely new text near 10⁴) that complements pairwise dedup:
    * it measures diffuse, many-source repetition no single pair exhibits.
    *
    * Shuffles: the shingle explode + min-id agg (combiner-friendly), a
    * shingle-keyed join back, and the per-doc fold — nothing pairwise,
    * nothing quadratic; the id order makes "first" deterministic in any
    * engine. */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val sh = Similarity.explodeShingles(docs, idCol, textCol, n)
    val firstSeen = sh.groupBy(col("shingle"))
      .agg(min(col("id")).as("_first"))
    sh.join(firstSeen, "shingle")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_first") === col("id"), 1L).otherwise(0L))
          .cast("long").as("n_novel"))
      .withColumn("novelty_bp",
        expr("n_novel * 10000L div n_shingles"))
  }

  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = ngramRows(docs, idCol, textCol, n)
    val dup = grams.groupBy(col("gram")).agg(count(lit(1)).as("_occ"))
      .filter(col("_occ") >= 2).select(col("gram"))
    val flagged = grams.join(dup, Seq("gram"), "left_semi")
      .withColumn("_isl", col("pos") - row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))))
    val runs = flagged.groupBy(col(idCol), col("_isl"))
      .agg(count(lit(1)).as("_run"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_runs"),
        sum(col("_run")).cast("long").as("n_dup_pos"),
        max(col("_run")).cast("long").as("max_run"))
    docs.select(col(idCol),
        greatest(size(Corpus.tokensOf(col(textCol))) - (n - 1), lit(0))
          .cast("long").as("n_pos"))
      .join(runs, Seq(idCol), "left")
      .select(col(idCol), col("n_pos"),
        coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  /** Unigram-surprisal document scoring — the LM-quality curation signal
    * computable without a language model: each token position contributes
    * ⌊log₂N⌋ − ⌊log₂c⌋ bits (N = corpus token count, c = the token's
    * corpus frequency), i.e. floored unigram self-information. Low total
    * ≈ boilerplate/common text, high mean ≈ rare-token gibberish — the
    * two tails a curation pass trims. log₂ floors come from binary-digit
    * COUNTS (`length(bin(x)) − 1`), exact integers on any engine — no
    * float log to drift. Shuffles: the unigram count, the token→count
    * join (AQE broadcasts the vocab when small), one per-doc sum. */
  /** Held-out cross-entropy: a Laplace-smoothed unigram LM is FIT on
    * the train-flagged tokens and SCORED on the held-out tokens —
    * the distribution-shift number between splits that self-scored
    * surprisal ([[unigramSurprisal]], q136) cannot give, and the
    * empirical companion of q299's unseen-mass forecast. Per group:
    *   xent_cb = ⌊Σ_tok n_test·(bl(T+V+1) − bl(c_train+1)) · 100 / N_test⌋
    * (bl = bit length — the repo's floored-log₂ quantization; the OOV
    * bucket is the +1 in the smoothing mass, so unseen test tokens pay
    * the full bl(T+V+1) bits and are also counted in `oov_tokens`).
    * Two token-level groupBys (combiner-friendly), one vocab-sized
    * left join, one enum-sized fold — no corpus-sized state. */
  def heldoutXent(toks: DataFrame, groupCol: String, tokCol: String,
      trainCol: Column): DataFrame = {
    val t = toks.select(col(groupCol), col(tokCol).as("tok"),
      when(trainCol, 1L).otherwise(0L).as("_tr"))
    val trainCnt = t.filter(col("_tr") === 1)
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("c"))
    val tg = trainCnt.groupBy(col(groupCol))
      .agg(sum(col("c")).as("train_tokens"),
        count(lit(1)).as("train_vocab"))
      .withColumn("k",
        length(expr("bin(train_tokens + train_vocab + 1)")).cast("long"))
    val testCnt = t.filter(col("_tr") === 0)
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("n"))
    testCnt.join(trainCnt, Seq(groupCol, "tok"), "left")
      .join(broadcast(tg), Seq(groupCol))
      .withColumn("_term",
        col("k") - length(expr("bin(coalesce(c, 0L) + 1)")).cast("long"))
      .groupBy(col(groupCol), col("train_tokens"), col("train_vocab"))
      .agg(sum(col("n")).as("n_test"),
        sum(when(col("c").isNull, col("n")).otherwise(0L))
          .as("oov_tokens"),
        sum(col("n") * col("_term")).as("_x"))
      .select(col(groupCol), col("train_tokens"), col("train_vocab"),
        col("n_test"), col("oov_tokens"),
        expr("CAST(_x * 100 div NULLIF(n_test, 0) AS BIGINT)")
          .as("xent_cb"))
  }

  def unigramSurprisal(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = Corpus.tokensOf(col(textCol))
    val uni = docs.select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("_c"))
    val n = uni.agg(sum(col("_c")).as("_n"))
    val bits = docs
      .select(col(idCol), explode(toks).as("token"))
      .join(uni, "token")
      .join(broadcast(n))
      .select(col(idCol),
        (length(expr("bin(_n)")) - length(expr("bin(_c)"))).as("_bits"))
    docs.select(col(idCol))
      .join(bits.groupBy(col(idCol))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("_bits")).cast("long").as("surprisal_bits")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("surprisal_bits"), lit(0L)).as("surprisal_bits"),
        expr("CAST(coalesce(surprisal_bits, 0) * 100 div " +
          "NULLIF(n_tokens, 0) AS BIGINT)").as("mean_bits_x100"))
  }

  /** Bigram conditional-surprisal document scoring — the first-order LM
    * refinement of [[unigramSurprisal]]: each bigram position (w₁,w₂)
    * contributes ⌊log₂c(w₁)⌋ − ⌊log₂c(w₁w₂)⌋ bits, the floored
    * −log₂ P̂(w₂|w₁) under the MLE estimator c(w₁w₂)/c(w₁). Predictable
    * continuations (c(w₁w₂) ≈ c(w₁)) contribute ~0 bits; surprising ones
    * pay the full ratio — fluency scoring with no float and no model.
    * Shuffles: bigram count, unigram count, two gram-keyed joins (AQE
    * broadcasts floored vocabularies), one per-doc sum. */
  def bigramSurprisal(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = Corpus.tokensOf(col(textCol))
    val bi = docs.select(col(idCol),
      explode(Corpus.bigramsOf(toks)).as("bigram"))
    val bcnt = bi.groupBy(col("bigram")).agg(count(lit(1)).as("_cb"))
    val uni = docs.select(explode(toks).as("_w1"))
      .groupBy(col("_w1")).agg(count(lit(1)).as("_cu"))
    val bits = bi
      .withColumn("_w1", substring_index(col("bigram"), " ", 1))
      .join(bcnt, "bigram").join(uni, "_w1")
      .select(col(idCol),
        (length(expr("bin(_cu)")) - length(expr("bin(_cb)"))).as("_bits"))
    docs.select(col(idCol))
      .join(bits.groupBy(col(idCol))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("_bits")).cast("long").as("bi_bits")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("bi_bits"), lit(0L)).as("bi_bits"),
        expr("CAST(coalesce(bi_bits, 0) * 100 div " +
          "NULLIF(n_bigrams, 0) AS BIGINT)").as("mean_bits_x100"))
  }

  /** Bigram association strength as a pre-scaled integer PMI ratio:
    * score = (c_xy · N · scale) div (c_x · c_y), monotone in pointwise
    * mutual information (log of the same ratio) — ranking and
    * thresholding need the ratio, not the log, and the integer form
    * crosses engines exactly. N is the total token count. */
  def pmiBigrams(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5, scale: Long = 100): DataFrame = {
    val toks = Corpus.tokensOf(col(textCol))
    // every surviving bigram has c_xy >= minCount occurrences, so BOTH its
    // unigrams occur >= minCount times — pre-filtering the unigram table to
    // c >= minCount is exactness-preserving and shrinks it from the raw
    // token domain (unbounded garbage/unicode on a web corpus) to the
    // >= minCount vocabulary. No explicit broadcast hints on the unigram
    // joins: the filtered table usually broadcasts, but at 100 TB that is
    // AQE's runtime call to make, not a plan-time promise — a shuffle join
    // on the token key is the correct fallback, never a driver OOM.
    val uni = docs.select(explode(toks).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    val n = docs.select(explode(toks).as("t")).agg(count(lit(1)).as("n"))
    val bi = docs.select(explode(Corpus.bigramsOf(toks)).as("xy"))
      .groupBy(col("xy")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      .withColumn("x", split(col("xy"), " ").getItem(0))
      .withColumn("y", split(col("xy"), " ").getItem(1))
    // c_xy·N·scale can reach ~10^26 on a 10^12-token corpus — far past
    // Long (Spark 4 ANSI would throw) — so the ratio is computed in
    // decimal(38,0) and only the final integral quotient (≤ N·scale)
    // narrows back to BIGINT
    bi.join(uni.select(col("t").as("x"), col("c").as("c_x")), "x")
      .join(uni.select(col("t").as("y"), col("c").as("c_y")), "y")
      .join(broadcast(n))
      .select(col("xy"), col("c_xy"),
        expr(s"CAST((CAST(c_xy AS DECIMAL(38,0)) * n * $scale) div " +
          "(CAST(c_x AS DECIMAL(38,0)) * c_y) AS BIGINT)").as("pmi_scaled"))
  }

  /** Positional phrase search: per-document occurrence counts of an exact
    * token phrase, via positional-posting joins — the adjacency query the
    * flat inverted index (q89) cannot answer. Each phrase word's postings
    * are filtered BEFORE any join (a phrase word's postings are a small
    * slice of the corpus), then word k joins on (doc, pos − k) — L−1
    * equi-joins for an L-word phrase, each on a doc+position key, no
    * windows, no per-doc arrays. Overlapping occurrences count
    * separately ("a a a" matches "a a" twice). Output: (id, n_matches)
    * for docs with ≥1 match. */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least 2 words")
    val toks = docs.select(col(idCol),
      posexplode(Corpus.tokensOf(col(textCol))).as(Seq("pos", "term")))
    val first = toks.filter(col("term") === phrase.head)
      .select(col(idCol), col("pos"))
    val matches = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (w, k)) =>
        val nxt = toks.filter(col("term") === w)
          .select(col(idCol).as("_pm_id"), (col("pos") - k).as("_pm_p"))
        acc.join(nxt,
            col(idCol) === col("_pm_id") && col("pos") === col("_pm_p"))
          .drop("_pm_id", "_pm_p")
    }
    matches.groupBy(col(idCol)).agg(count(lit(1)).as("n_matches"))
  }

  /** Iterative BPE merge training — the loop q120's single pair-count
    * round feeds: per round, pick the globally most frequent adjacent
    * symbol pair (count weighted by word frequency, ties to the
    * lexicographically smallest (a, b)), merge it throughout the
    * vocabulary, and report the merge plus the corpus token count the
    * merged vocabulary implies. Output: one row per executed round —
    * `(round, sym_a, sym_b, pair_n, corpus_tokens)`.
    *
    * Scale shape: the only corpus-sized work is ONE word-count shuffle;
    * every round after that runs on the cached DISTINCT-WORD table
    * (vocabulary-sized, bounded by |vocab|, not |corpus|). The per-round
    * argmax is orderBy+limit(1) (TakeOrderedAndProject) and its single
    * row is collected to the driver — a bounded scalar per round, the
    * same legitimacy class as the IVF centroid pull — so the merge is a
    * literal codegen'd `replace` and round r never re-executes rounds
    * 1..r−1 as joins.
    *
    * Conventions (pinned so the DuckDB oracle is bit-identical):
    *  - symbols are space-delimited inside a space-bounded string
    *    (words come from whitespace tokenization, so no symbol can
    *    contain the delimiter);
    *  - `pair_n` counts ALL adjacent occurrences, overlapping included
    *    (standard BPE counting: `a a a` contributes (a,a) twice);
    *  - the merge rewrites leftmost NON-overlapping delimited
    *    occurrences in one pass (both engines' literal `replace`):
    *    in a run like `a a a` only the first pair merges this round —
    *    the remainder merges in a later round. Reference BPE
    *    implementations differ here (they re-scan greedily within the
    *    round); the one-pass form is deterministic and identical across
    *    engines, which is what the oracle gate needs. */
  def bpeTrain(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds must be in 1..16: $rounds")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(Corpus.tokensOf(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "), concat_ws(" ", expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))")),
        lit(" ")).as("rep"), col("freq"))
      .cache()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long, Long)]
    try {
      var rep: Column = col("rep")
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val syms = split(trim(rep), " ")
        val top = words
          .select(col("freq"), explode(zip_with(
            slice(syms, lit(1), size(syms) - 1),
            slice(syms, lit(2), size(syms) - 1),
            (x, y) => concat_ws(" ", x, y))).as("pair"))
          .select(col("freq"),
            substring_index(col("pair"), " ", 1).as("a"),
            substring_index(col("pair"), " ", -1).as("b"))
          .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val (a, b, n) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          rep = call_function("replace", rep,
            lit(s" $a $b "), lit(s" $a$b "))
          val toks = words
            .agg(sum(col("freq") * size(split(trim(rep), " ")).cast("long")))
            .head().getLong(0)
          out += ((r.toLong, a, b, n, toks))
          r += 1
        }
      }
    } finally words.unpersist(blocking = false)
    import spark.implicits._
    out.toSeq.toDF("round", "sym_a", "sym_b", "pair_n", "corpus_tokens")
  }

  /** Apply a trained BPE merge list ([[bpeTrain]]'s output, collected —
    * merge tables are vocabulary-sized driver data, like IVF centroids)
    * to a document set: per doc, word/token/char masses under the learned
    * segmentation — the tokenizer-fit report (chars-per-token, fertility)
    * for a held-out corpus.
    *
    * Merges fold in rank order over the same space-delimited symbol
    * representation as training, with the same non-overlapping
    * left-to-right `replace` convention, so train and apply cannot
    * drift. The fold runs once per DISTINCT word type (the vocab-sized
    * frame), never per occurrence; per-doc masses come from one join of
    * the (doc, word, n) occurrence counts against the encoded types —
    * at 100 TB the replace chain is proportional to the vocabulary, and
    * the heavy table only ever carries integers. */
  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each raw document
    * by how much more likely its hashed-unigram feature vector is under
    * the TARGET distribution (the high-quality slice, `targetCol`) than
    * under the raw corpus, so downstream sampling can tilt the mixture
    * toward target-like text without training a classifier.
    *
    * House integer-exact adaptation: per feature bucket b (the same
    * sha256-prefix bucketing as [[featureHash]]), both distributions are
    * add-one smoothed and their −log₂ probabilities floored via bit
    * length L(x) = ⌊log₂x⌋+1:
    *
    *   bits_X(b)  = L(tot_X + buckets) − L(c_X(b) + 1)
    *   gain(b)    = bits_raw(b) − bits_tgt(b)
    *   weight(d)  = Σ_b n_b(d) · gain(b)
    *
    * gain > 0 ⇔ the bucket is (dyadically) more probable in the target
    * than in the raw pool; a document's weight is its token-weighted sum
    * — the floored log importance ratio log₂(p_tgt/p_raw) of the paper,
    * exactly reproducible by the DuckDB oracle (no floats).
    *
    * Scale shape: one explode + (doc, bucket) count (map-side combine),
    * a `buckets`-row stats table broadcast back onto it, one per-doc
    * sum. The stats table is O(buckets) regardless of corpus size; the
    * heavy path shuffles once on (doc, bucket) and once on doc. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetCol: Column, buckets: Int = 64): DataFrame = {
    require(buckets > 0 && buckets <= 4096, s"buckets out of range: $buckets")
    val bucket = conv(substring(sha2(col("token"), 256), 1, 4), 16, 10)
      .cast("long") % buckets
    val perDoc = docs
      .select(col(idCol), targetCol.cast("boolean").as("_tgt"),
        explode(Corpus.tokensOf(col(textCol))).as("token"))
      .select(col(idCol), col("_tgt"), bucket.as("_b"))
      .groupBy(col(idCol), col("_b"))
      .agg(count(lit(1)).as("_n"), first(col("_tgt")).as("_tgt"))
    val stats = perDoc.groupBy(col("_b"))
      .agg(sum(col("_n")).as("_raw"),
        sum(when(col("_tgt"), col("_n")).otherwise(0L)).as("_tgtc"))
    val tot = stats.agg(sum(col("_raw")).as("_rawTot"),
      sum(col("_tgtc")).as("_tgtTot"))
    def bitLen(c: Column) = length(bin(c))
    val gains = stats.join(broadcast(tot))
      .select(col("_b"),
        ((bitLen(col("_rawTot") + buckets) - bitLen(col("_raw") + 1)) -
          (bitLen(col("_tgtTot") + buckets) - bitLen(col("_tgtc") + 1)))
          .cast("long").as("_gain"))
    val w = perDoc.join(broadcast(gains), Seq("_b"))
      .groupBy(col(idCol))
      .agg(sum(col("_n")).as("n_tokens"),
        sum(col("_n") * col("_gain")).as("weight_bits"))
    docs.select(col(idCol), targetCol.cast("boolean").as("is_target"))
      .join(w, Seq(idCol), "left")
      .select(col(idCol), col("is_target"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("weight_bits"), lit(0L)).as("weight_bits"))
  }

  def bpeApply(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty && merges.size <= 64,
      s"merges must be 1..64 entries: ${merges.size}")
    val occ = docs
      .select(col(idCol), explode(Corpus.tokensOf(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("_n"))
    val rep0: Column = concat(lit(" "), concat_ws(" ", expr(
      "transform(sequence(1, length(w)), i -> substring(w, i, 1))")),
      lit(" "))
    val rep = merges.foldLeft(rep0) { case (r, (a, b)) =>
      call_function("replace", r, lit(s" $a $b "), lit(s" $a$b "))
    }
    val enc = occ.select(col("w")).distinct()
      .withColumn("_tok", size(split(trim(rep), " ")).cast("long"))
      .withColumn("_chars", length(col("w")).cast("long"))
    occ.join(enc, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("_n")).as("n_words"),
        sum(col("_n") * col("_tok")).as("n_tokens"),
        sum(col("_n") * col("_chars")).as("n_chars"))
  }
}
