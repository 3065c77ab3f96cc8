package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL and domain hygiene operators — the normalization layer a web-scale
  * corpus needs BEFORE any content-level dedup runs: the same page
  * arriving as `HTTPS://Host/x/?id=1&utm_source=a#top` and
  * `https://host/x?id=1` must collapse to one key, or every downstream
  * exact/near-dup count is inflated by crawl noise.
  *
  * Everything here is pure column expressions over regexp extraction
  * (deliberately NOT `parse_url`: the DuckDB oracle has no parse_url, and
  * a shared regex convention is what makes the twin bit-identical). All
  * operators are scan-shaped (no joins beyond a broadcast against an
  * enum-sized list), so they scale as one pass over the corpus.
  */
object Web {

  private def part(url: Column, pattern: String): Column =
    regexp_extract(url, pattern, 1)

  /** Canonical form of a URL — the dedup key. Conventions (each one a
    * deterministic choice, mirrored literally in the oracle SQL):
    *  - scheme and host lowercase;
    *  - fragment dropped;
    *  - trailing slash stripped from the path (root path becomes empty);
    *  - tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`) removed
    *    from the query; the survivors sorted lexicographically and
    *    re-joined with `&`; an emptied query drops its `?`.
    * Malformed URLs (no `scheme://host`) canonicalize to the empty
    * string — callers filter or report them, never silently keep them. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(part(url, "^([A-Za-z][A-Za-z0-9+.-]*)://"))
    val host = lower(part(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"))
    val path = regexp_replace(
      part(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"), "/+$", "")
    val rawQuery = part(url, "\\?([^#]*)")
    val kept = array_join(array_sort(filter(
      split(rawQuery, "&"),
      p => p =!= "" && !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="))),
      "&")
    when(scheme === "" || host === "", lit(""))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }

  /** URL dedup audit per host: raw URL count, distinct canonical pages,
    * and the crawl-noise share `dup_bp` = (raw − canonical)·10⁴/raw —
    * the table that says how much of a crawl is tracking-parameter and
    * case noise rather than content. One groupBy on the canonical key
    * (combiner-friendly), then one on host. */
  def urlDedupAudit(df: DataFrame, urlCol: String): DataFrame = {
    val canon = df.select(canonicalizeUrl(col(urlCol)).as("canon"))
      .filter(col("canon") =!= "")
      .withColumn("host", part(col("canon"), "^[a-z][a-z0-9+.-]*://([^/?#]+)"))
    canon.groupBy(col("host"), col("canon"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col("host"))
      .agg(sum(col("_n")).as("n_urls"),
        count(lit(1)).as("n_canonical"))
      .withColumn("dup_bp",
        expr("(n_urls - n_canonical) * 10000 div n_urls"))
  }

  /** All dot-suffixes of a hostname, most specific first:
    * `a.b.example.com` → `[a.b.example.com, b.example.com, example.com,
    * com]`. Bounded by the label count (≤ ~10), so exploding it is a
    * constant fan-out — the scale-safe way to match hosts against a
    * registrable-domain list without a prefix-wildcard join. */
  def domainSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /** Blocklist audit with registrable-domain semantics: each host counts
    * against its MOST SPECIFIC matching entry only (a host under
    * `bad.example.com` does not also count under `example.com`), every
    * blocklist entry reports even at zero. The suffix chain explodes
    * (bounded fan-out), joins the broadcast entry list, and the
    * per-host argmax is a max(struct) aggregate — no windows, no
    * wildcards. Input rows are (host) observations; `n_urls` counts
    * rows, `n_hosts` distinct hosts. */
  def blocklistAudit(df: DataFrame, hostCol: String,
      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    val spark = df.sparkSession
    import spark.implicits._
    val entries = blocklist.toDF("entry")
    // fold to distinct hosts FIRST: the suffix explosion then runs at
    // host cardinality, not observation cardinality
    val perHost = df.select(lower(col(hostCol)).as("host"))
      .groupBy(col("host")).agg(count(lit(1)).as("n_urls"))
    val matched = perHost.select(col("host"))
      .withColumn("sfx", explode(domainSuffixes(col("host"))))
      .join(broadcast(entries), col("sfx") === col("entry"))
      .groupBy(col("host"))
      .agg(max(struct(length(col("entry")).as("l"), col("entry").as("e")))
        .as("_m"))
      .select(col("host"), col("_m.e").as("entry"))
    entries.join(
        matched.join(perHost, Seq("host"))
          .groupBy(col("entry"))
          .agg(count(lit(1)).as("n_hosts"), sum(col("n_urls")).as("n_urls")),
        Seq("entry"), "left")
      .select(col("entry"),
        coalesce(col("n_hosts"), lit(0L)).as("n_hosts"),
        coalesce(col("n_urls"), lit(0L)).as("n_urls"))
  }

  /** Per-host crawl budget cap (the politeness/anti-monoculture sampler):
    * keep at most `perHost` URLs per host, selected by sha256(url) order
    * — a deterministic uniform sample that every engine and every rerun
    * agrees on, unlike "first N seen" which depends on crawl order.
    * Emits the kept rows with their host and in-host rank; the window
    * partitions on host (millions of independent groups at corpus
    * scale), never globally. Ties on the full hash are broken by the url
    * itself, so the order is total even for duplicate URLs. */
  def hostCap(df: DataFrame, urlCol: String, perHost: Int): DataFrame = {
    require(perHost >= 1, "perHost must be >= 1")
    val host = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("host"))
      .orderBy(sha2(col(urlCol), 256), col(urlCol))
    df.select(col(urlCol).as("url"), host.as("host"))
      .filter(col("host") =!= "")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perHost)
  }
}
