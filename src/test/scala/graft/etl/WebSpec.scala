package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalizeUrl: case, fragment, trailing slash, tracking params") {
    val got = Seq(
      // noise classes one at a time, all collapsing to the same page
      "HTTPS://Host.Example.COM/a/b/?id=1&utm_source=x#top",
      "https://host.example.com/a/b?utm_campaign=y&id=1",
      "https://host.example.com/a/b/?id=1&fbclid=zz&gclid=q&ref=feed",
      // param ORDER normalizes (sorted rejoin)
      "https://host.example.com/a/b?z=2&id=1",
      // root path strips to empty; query-less stays query-less
      "https://host.example.com/",
      "https://HOST.example.com",
      // malformed → empty string, never a partial key
      "not a url", "host.example.com/no-scheme")
      .toDF("u").select(Web.canonicalizeUrl($"u")).as[String].collect().toSeq
    assert(got == Seq(
      "https://host.example.com/a/b?id=1",
      "https://host.example.com/a/b?id=1",
      "https://host.example.com/a/b?id=1",
      "https://host.example.com/a/b?id=1&z=2",
      "https://host.example.com",
      "https://host.example.com",
      "", ""))
  }

  test("urlDedupAudit: per-host raw vs canonical counts, malformed dropped") {
    val df = Seq(
      "https://a.com/x?id=1&utm_source=m", "https://A.com/x/?id=1",
      "https://a.com/x?id=2",
      "https://b.com/y", "junk").toDF("url")
    val got = Web.urlDedupAudit(df, "url").orderBy($"host")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a.com", 3L, 2L, 3333L), ("b.com", 1L, 1L, 0L)))
  }

  test("domainSuffixes: most specific first, bounded by label count") {
    val got = Seq("a.b.example.com").toDF("h")
      .select(Web.domainSuffixes($"h")).as[Seq[String]].head()
    assert(got == Seq("a.b.example.com", "b.example.com", "example.com",
      "com"))
  }

  test("blocklistAudit: most-specific entry wins, zero entries report") {
    val hosts = Seq(
      "x.bad.example.com", "bad.example.com",  // specific entry
      "other.example.com",                      // falls to the apex entry
      "clean.org", "clean.org").toDF("host")    // no match
    val got = Web.blocklistAudit(hosts, "host",
        Seq("example.com", "bad.example.com", "unused.net"))
      .orderBy($"entry")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("bad.example.com", 2L, 2L),
      ("example.com", 1L, 1L),
      ("unused.net", 0L, 0L)))
  }

  test("blocklistAudit plan: broadcast entry join, no cartesian") {
    val hosts = Seq("a.example.com").toDF("host")
    val plan = Web.blocklistAudit(hosts, "host", Seq("example.com"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("hostCap: per-host budget, deterministic sha order, malformed dropped") {
    import spark.implicits._
    val urls = ((1 to 10).map(i => s"https://big.example/page$i") ++
      Seq("https://small.example/only", "not a url")).toDF("url")
    val out = Web.hostCap(urls, "url", perHost = 3).collect()
    val byHost = out.groupBy(_.getAs[String]("host"))
    assert(byHost("big.example").length == 3)
    assert(byHost("small.example").length == 1)
    assert(!byHost.contains(""))
    // selection is the sha256-least URLs, rerun-stable
    val expect = (1 to 10).map(i => s"https://big.example/page$i")
      .sortBy(u => java.security.MessageDigest.getInstance("SHA-256")
        .digest(u.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .take(3).toSet
    assert(byHost("big.example").map(_.getAs[String]("url")).toSet == expect)
    assert(byHost("big.example").map(_.getAs[Long]("rk")).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }
}
