package graft

import org.apache.spark.sql.functions._

import graft.llm.Url

class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def parse(urls: String*): Seq[(String, String, String)] =
    urls.toDF("url")
      .select(Url.host(col("url")).as("h"),
        Url.registeredDomain(Url.stripWww(Url.host(col("url"))))
          .as("d"),
        Url.canonicalize(col("url")).as("c"))
      .as[(String, String, String)].collect().toSeq

  test("host: scheme/userinfo/port/case variants all reduce to the host") {
    val got = parse(
      "https://www.Example.COM/a?b#c",
      "http://user:pw@sub.example.com:8080/x",
      "example.com/plain",
      "ftp://files.example.org")
    assert(got.map(_._1) == Seq("www.example.com", "sub.example.com",
      "example.com", "files.example.org"))
  }

  test("registered domain: last-2 labels, multi-label suffixes, short hosts") {
    val got = parse(
      "https://a.b.example.co.uk/x",   // multi-label suffix → 3 labels
      "https://deep.sub.example.com",  // plain → 2 labels
      "https://localhost/x",           // 1 label passes through
      "https://example.com")           // exactly 2 labels
    assert(got.map(_._2) == Seq("example.co.uk", "example.com",
      "localhost", "example.com"))
  }

  test("registered domain: IP-literal hosts pass through unchanged " +
    "(a dotted IPv4 must not collapse to its last two octets)") {
    val got = parse(
      "http://192.168.0.1/admin",
      "http://10.0.0.1:8080/x")
    assert(got.map(_._2) == Seq("192.168.0.1", "10.0.0.1"))
    // colon-bearing hosts (IPv6 text from any upstream parser) pass
    // through too — Url.host itself keeps bracketed IPv6 out of scope
    val v6 = Seq("2001:db8::1").toDF("h")
      .select(Url.registeredDomain(col("h"))).as[String].head()
    assert(v6 == "2001:db8::1")
  }

  test("registeredDomainPsl: longest suffix wins, default * rule for " +
    "unknown TLDs, whole-host-is-suffix and IPs pass through") {
    val hosts = Seq(
      "a.b.example.co.uk",     // 2-label suffix → example.co.uk
      "school.k12.ma.us",      // 3-label suffix → school.k12.ma.us? no:
                               // suffix k12.ma.us + 1 label = itself? it
                               // IS suffix+1 → school.k12.ma.us
      "deep.school.k12.ma.us", // → school.k12.ma.us
      "deep.sub.example.com",  // 1-label suffix com → example.com
      "example.zz",            // unmatched TLD → default * → example.zz
      "a.b.example.zz",        // default * rule → example.zz
      "co.uk",                 // the host IS a suffix → pass through
      "localhost",             // dot-free → pass through
      "192.168.0.1")           // IPv4 → pass through
      .toDF("host")
    val got = Url.registeredDomainPsl(hosts, "host",
        Url.pslFixtureDf(spark))
      .select("host", "domain").as[(String, String)].collect().toMap
    assert(got("a.b.example.co.uk") == "example.co.uk")
    assert(got("school.k12.ma.us") == "school.k12.ma.us")
    assert(got("deep.school.k12.ma.us") == "school.k12.ma.us")
    assert(got("deep.sub.example.com") == "example.com")
    assert(got("example.zz") == "example.zz")
    assert(got("a.b.example.zz") == "example.zz")
    assert(got("co.uk") == "co.uk")
    assert(got("localhost") == "localhost")
    assert(got("192.168.0.1") == "192.168.0.1")
  }

  test("registeredDomainPsl is row-PRESERVING even when the suffix " +
    "list carries duplicate values (deduped before the per-length " +
    "broadcast joins — round-9 advice)") {
    val hosts = Seq("a.example.com", "b.example.co.uk", "x.example.zz")
      .toDF("host")
    // triple every suffix row: without the up-front distinct each
    // matching host would come back 3x
    val dupSfx = Url.pslFixtureDf(spark)
    val tripled = dupSfx.union(dupSfx).union(dupSfx)
    val got = Url.registeredDomainPsl(hosts, "host", tripled)
    assert(got.count() == 3L, got.collect().mkString(", "))
    assert(got.where(col("host") === "a.example.com")
      .select("domain").as[String].head() == "example.com")
  }

  test("registeredDomainPsl agrees with the hardcoded registeredDomain " +
    "on every synthesized corpus host (the fixture supersets " +
    "MultiLabelSuffixes plus their TLDs)") {
    val docs = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    val hosts = SparkEntry.queries("q_url_parse")(spark,
      "/root/testdata/sf0.001")
      .select(Url.stripWww(col("host")).as("host"), col("domain"))
    val got = Url.registeredDomainPsl(
        hosts.select("host"), "host", Url.pslFixtureDf(spark))
      .select("host", "domain").distinct()
      .as[(String, String)].collect().toMap
    val expected = hosts.distinct().as[(String, String)].collect().toMap
    assert(got.nonEmpty && docs.count() > 0)
    assert(got == expected,
      (got.toSet -- expected.toSet).take(5).toString)
  }

  test("canonicalize: fragment, default ports, scheme default, empty path") {
    val got = parse(
      "HTTPS://u@Host.COM:443/Path?Q=1#frag", // drop user+443+frag, keep case of path
      "http://host.com:80",                   // default port + empty path
      "host.com:8080/x",                      // schemeless, exotic port kept
      "https://host.com:8443/")
    assert(got.map(_._3) == Seq(
      "https://host.com/Path?Q=1",
      "http://host.com/",
      "http://host.com:8080/x",
      "https://host.com:8443/"))
  }

  test("canonicalize is idempotent over every synthesized URL shape") {
    val shapes = Seq(
      "https://www.s.com/d/1?x=1#frag", "http://s.com:80/d/2",
      "s.com/d/3", "HTTPS://user:pw@docs.S.COM:443/d/4?q=a&b=2",
      "http://s.co.uk:8080/Path/5", "https://sub.cdn.s.com#top")
    val once = shapes.toDF("url")
      .select(Url.canonicalize(col("url")).as("c"))
    val twice = once.select(Url.canonicalize(col("c")).as("c2"))
    assert(once.as[String].collect().toSeq ==
      twice.as[String].collect().toSeq)
  }

  test("domainCap keeps at most k per domain, score-desc id-asc order") {
    val docs = (0L until 40L).map(i =>
      (i, s"https://d${i % 2}.com/${i}", i % 7)).toDF(
      "doc_id", "url", "quality")
    val got = Url.domainCap(docs, "url", col("doc_id"),
      col("quality"), k = 3)
    val byDomain = got.groupBy("domain").count()
      .select("count").as[Long].collect()
    assert(byDomain.length == 2 && byDomain.forall(_ == 3))
    // top slot per domain is the max-quality, min-id doc
    val top = got.filter(col("domain") === "d0.com" && col("rank") === 1)
      .select("doc_id").as[Long].head()
    assert(top == 6L) // quality 6 is the max of i%7 among even ids; 6 is smallest such id
  }

  test("pslFullRules parses the committed PSL fixture into the three " +
    "rule classes") {
    val r = Url.pslFullRules
    assert(r.plain.size > 9000 && r.wildcardBases.size > 50 &&
      r.exceptions.size >= 8)
    // pinned public rules (publicsuffix.org): multi-label plain,
    // wildcard, exception
    assert(r.plain.contains("co.uk") && r.plain.contains("k12.va.us"))
    assert(r.wildcardBases.contains("ck") &&
      r.wildcardBases.contains("kobe.jp"))
    assert(r.exceptions.contains("www.ck") &&
      r.exceptions.contains("city.kobe.jp"))
    // rule classes keep their markers stripped
    assert(!r.wildcardBases.exists(_.contains("*")) &&
      !r.exceptions.exists(_.startsWith("!")))
    // IDN rules index BOTH forms: the list's unicode and the punycode
    // a crawl host actually carries (公司.cn and its IDN twin)
    assert(r.plain.contains("公司.cn") &&
      r.plain.contains("xn--55qx5d.cn"))
  }

  test("punycode hosts match the IDN twins of unicode PSL rules") {
    val hosts = Seq(
      (0L, "a.b.xn--55qx5d.cn"),   // 公司.cn in punycode -> 2-label suffix
      (1L, "b.xn--55qx5d.cn"))
      .toDF("id", "host")
    val got = Url.registeredDomainPslFull(hosts, "host", Url.pslFullRules)
      .orderBy("id").select("domain").as[String].collect().toSeq
    // with the twin indexed, suffix = xn--55qx5d.cn (2 labels): the
    // registered domain keeps THREE labels; without it the implicit *
    // would have rolled up one label short (xn--55qx5d.cn itself)
    assert(got == Seq("b.xn--55qx5d.cn", "b.xn--55qx5d.cn"))
  }

  test("registeredDomainPslFull applies the publicsuffix.org algorithm: " +
    "exceptions prevail, wildcards match one label down, longest plain " +
    "wins, implicit * fallback") {
    val hosts = Seq(
      "s.com",              // plain 1-label suffix -> host
      "a.b.s.com",          // -> s.com
      "www.s.co.uk",        // 2-label suffix -> s.co.uk... www NOT stripped here
      "x.s.k12.va.us",      // 3-label plain -> s.k12.va.us
      "s.ck",               // wildcard *.ck: host IS a public suffix -> host
      "x.shop.s.ck",        // wildcard: suffix = s.ck -> shop.s.ck
      "www.ck",             // exception !www.ck -> registrable itself
      "deep.www.ck",        // exception -> www.ck
      "ward.city.kobe.jp",  // exception !city.kobe.jp -> city.kobe.jp
      "a.s.notatld",        // no rule -> implicit *: last two
      "10.42.7.9",          // IP pass-through
      "localhost")          // single label pass-through
      .zipWithIndex.map(_.swap).toDF("id", "host")
    val got = Url.registeredDomainPslFull(hosts, "host",
        Url.pslFullRules)
      .orderBy("id").select("domain").as[String].collect().toSeq
    assert(got == Seq(
      "s.com", "s.com", "s.co.uk", "s.k12.va.us", "s.ck", "shop.s.ck",
      "www.ck", "www.ck", "city.kobe.jp", "s.notatld", "10.42.7.9",
      "localhost"))
  }

  test("registeredDomainPslFull is row-preserving (no duplicate-suffix " +
    "fan-out) over the synthesized corpus shapes") {
    val hosts = (0L until 280L).map(i =>
      (i, s"x.shop.s$i.ck")).toDF("id", "host")
    val got = Url.registeredDomainPslFull(hosts, "host", Url.pslFullRules)
    assert(got.count() == 280L)
    assert(got.select("id").distinct().count() == 280L)
  }

  test("domainStats dup fraction counts exact duplicate texts per domain") {
    val docs = Seq(
      (0L, "https://a.com/1", "same"),
      (1L, "https://a.com/2", "same"),
      (2L, "https://a.com/3", "other"),
      (3L, "https://b.com/1", "x")).toDF("doc_id", "url", "text")
    val got = Url.domainStats(docs, "url", "text")
      .orderBy("domain")
      .select("domain", "n_docs", "distinct_texts", "dup_frac")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a.com", 3L, 2L, 1.0 / 3.0), ("b.com", 1L, 1L, 0.0)))
  }
}
