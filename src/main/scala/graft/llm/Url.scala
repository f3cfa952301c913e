package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL curation: host extraction, registered-domain rollup and
  * URL canonicalization — the identity layer of crawl-derived training
  * corpora (CCNet / Gopher / RefinedWeb all key their volume caps, dedup
  * scopes and quality strata on the registered domain, not the raw URL).
  *
  * Everything here is built-in `Column` expressions (regexp/split/slice —
  * whole-stage codegen, no UDF), so host/domain extraction runs map-only
  * at crawl scale and the downstream per-domain cap is one bounded
  * aggregate. The regexes stay inside the RE2-compatible subset (no
  * backreferences, no lookaround) so the DuckDB oracle replays them with
  * the identical patterns.
  *
  * Reference scope: the reference (makinage) has no web-curation surface;
  * this is a SURVEY §2.6 north-star extension (corpus assembly family).
  */
object Url {

  /** Scheme prefix recognizer — permissive RFC 3986 scheme chars. */
  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** Host of a URL (lower-cased, port stripped): optional scheme,
    * optional userinfo, then everything up to the first `/ : ? #`.
    * Schemeless inputs ("example.com/x") parse as host-first.
    * Bracketed IPv6 hosts (`[::1]`) are OUT of scope (the colon stops
    * the host group) — negligible in crawl corpora; extend the
    * character class with a bracket branch if they matter. */
  def host(url: Column): Column =
    regexp_extract(lower(url),
      "^(?:[a-z][a-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/:?#]+)", 1)

  /** Host with a single leading `www.` label stripped — the crawl
    * convention before domain rollup. */
  def stripWww(h: Column): Column = regexp_replace(h, "^www\\.", "")

  /** Multi-label public suffixes recognized by [[registeredDomain]].
    * Deliberately a SMALL documented subset of the PSL (the full list is
    * data, not code — load it into a broadcast join when fidelity past
    * these matters). */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "co.in", "co.kr",
    "com.mx", "co.nz", "com.sg", "com.tr", "co.za")

  /** Registered domain of a (lower-case, www-stripped) host: the last two
    * labels, or the last three when the last two are a known multi-label
    * public suffix ("a.b.example.co.uk" → "example.co.uk"). Hosts with
    * ≤ 2 labels pass through unchanged, as do IP-literal hosts (dotted
    * IPv4 and bracket-free IPv6): a dotted IPv4 has 4 "labels", so
    * without the explicit check every IP-hosted URL would collapse into
    * a handful of fake domains like "0.1" and skew domainStats /
    * domainCap admission. */
  def registeredDomain(h: Column): Column = {
    val labels = split(h, "\\.")
    val n      = size(labels)
    val last2  = concat_ws(".", slice(labels, -2, 2))
    val last3  = concat_ws(".", slice(labels, -3, 3))
    val isMulti = MultiLabelSuffixes
      .map(s => last2 === lit(s)).reduce(_ || _)
    val isIp = h.rlike("^[0-9]+(\\.[0-9]+){3}$") || h.contains(":")
    when(isIp || n <= 2, h).otherwise(when(isMulti && n >= 3, last3)
      .otherwise(last2))
  }

  /** Committed fixture SUBSET of the Public Suffix List
    * (publicsuffix.org — the real list is ~9k rules and lives as DATA,
    * refreshed out-of-band; this subset covers the shapes the tests and
    * synthesized corpus exercise: plain TLDs, 2-label and 3-label
    * suffixes). Single source of truth for BOTH engines: the default
    * Spark-side suffix frame and the DuckDB oracle's inline VALUES list
    * are generated from this one Seq. */
  val PslFixture: Seq[String] = Seq(
    // plain TLDs
    "com", "org", "net", "edu", "gov", "io", "uk", "au", "jp", "br",
    "cn", "in", "kr", "mx", "nz", "sg", "tr", "za", "us", "de", "fr",
    // 2-label public suffixes
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "co.in", "co.kr",
    "com.mx", "co.nz", "com.sg", "com.tr", "co.za",
    // 3-label public suffixes (PSL has many of these; e.g. the
    // US K-12 and Japanese geographic blocks)
    "k12.ma.us", "cc.ca.us", "lib.tx.us", "city.kobe.jp", "pref.kyoto.jp")

  /** [[PslFixture]] as the one-column `suffix` DataFrame
    * [[registeredDomainPsl]] takes — swap in the full list
    * ([[pslFullRules]]) at this seam. */
  def pslFixtureDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    PslFixture.toDF("suffix")
  }

  /** The three rule classes of the Public Suffix List
    * (publicsuffix.org/list/): plain suffixes; wildcard BASES (the rule
    * `*.ck` is stored as base `ck` — any single label under a base is a
    * public suffix); exception NAMES (`!www.ck` stored as `www.ck` — the
    * name is registrable even though a wildcard covers it). */
  final case class PslRules(plain: Seq[String], wildcardBases: Seq[String],
                            exceptions: Seq[String])

  /** The FULL Public Suffix List, parsed from the committed fixture
    * `graft/public_suffix_list.dat` (publicsuffix.org, public data —
    * the copy shipped in every Debian/OpenJDK; refresh by overwriting
    * the resource). 9,506 rules at commit time: 9,391 plain, 107
    * wildcard, 8 exception; ≤ 5 labels. Parse per the PSL spec: a line
    * is everything up to the first whitespace; `//` comments and blank
    * lines are skipped; ICANN and PRIVATE sections both apply (eTLD+1
    * convention). Single source of truth for BOTH engines: the Spark
    * join tables and the DuckDB oracle's VALUES lists are generated
    * from this one value. */
  lazy val pslFullRules: PslRules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "resource graft/public_suffix_list.dat missing")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    val rules = lines.map(_.takeWhile(!_.isWhitespace))
      .filter(l => l.nonEmpty && !l.startsWith("//"))
    // the list ships IDN rules in UNICODE form but crawl hosts arrive
    // in punycode (`a.b.xn--55qx5d.cn`), so every non-ASCII rule also
    // indexes its IDN/punycode twin — 305 multi-label unicode rules
    // would otherwise silently fall back to the implicit `*` and roll
    // up one label short. Label counts are dot-preserved by IDN, so
    // the per-length join ladders are unaffected.
    def withPunycode(rs: Seq[String]): Seq[String] =
      (rs ++ rs.flatMap { r =>
        if (r.forall(_ < 0x80)) None
        else scala.util.Try(java.net.IDN.toASCII(r)).toOption
          .filter(p => p != r && p.nonEmpty)
      }).distinct
    val (exc, rest) = rules.partition(_.startsWith("!"))
    val (wild, plain) = rest.partition(_.startsWith("*."))
    PslRules(withPunycode(plain.distinct),
      withPunycode(wild.map(_.stripPrefix("*.")).distinct),
      withPunycode(exc.map(_.stripPrefix("!")).distinct))
  }

  /** PSL-faithful registered domain with the suffix list AS DATA
    * (round-8 verdict task #4 — [[MultiLabelSuffixes]] is the
    * hardcoded-subset fast path; this is the fidelity path): longest
    * suffix match via K chained BROADCAST left joins (K = max labels in
    * the suffix list — map-only, no explode, no shuffle, the shape that
    * survives a 100 TB corpus), registered domain = matched suffix plus
    * one label.
    *
    * Rule semantics (plain-rule subset — PSL wildcard `*.foo` and
    * exception `!bar.foo` rules are out of scope for the fixture):
    *  - IP-literal hosts and dot-free hosts pass through;
    *  - no suffix matches → the PSL implicit `*` default: the last
    *    label is the suffix, so the registered domain is the last TWO
    *    labels (hosts with ≤ 2 labels pass through);
    *  - the whole host IS a public suffix → pass through (no
    *    registrable domain to roll up to);
    *  - else the last `s+1` labels, `s` = longest match. */
  def registeredDomainPsl(df: DataFrame, hostCol: String,
                          suffixes: DataFrame, out: String = "domain")
      : DataFrame = {
    // dedupe up front: each per-length broadcast join below is only
    // row-PRESERVING when the per-length suffix sets are distinct — a
    // duplicated suffix value would silently duplicate matching input
    // rows (round-9 advice). A suffix has exactly one label count, so
    // one global distinct makes every per-length set distinct too.
    val sfx = suffixes.select(col("suffix")).distinct()
    val maxS = sfx
      .agg(max(size(split(col("suffix"), "\\.")))).head().getInt(0)
    require(maxS >= 1 && maxS <= 8, s"suspicious suffix list: maxS=$maxS")
    val labels = split(col(hostCol), "\\.")
    val n      = size(labels)
    val isIp = col(hostCol).rlike("^[0-9]+(\\.[0-9]+){3}$") ||
      col(hostCol).contains(":")
    var cur = df
    for (s <- 1 to maxS) {
      val cand = when(n >= s, concat_ws(".", slice(labels, -s, s)))
      cur = cur.join(
        broadcast(sfx.select(col("suffix").as(s"__psl_$s"))),
        cand === col(s"__psl_$s"), "left")
    }
    // longest match wins: the fold wraps so s = maxS is checked first
    val matched = (1 to maxS).foldLeft(lit(0)) { (acc, s) =>
      when(col(s"__psl_$s").isNotNull, lit(s)).otherwise(acc)
    }
    val dom = when(isIp || n <= 1, col(hostCol))
      .when(matched === 0,
        when(n <= 2, col(hostCol))
          .otherwise(concat_ws(".", slice(labels, -2, 2))))
      .when(matched === n, col(hostCol))
      .otherwise(concat_ws(".",
        slice(labels, -(matched + lit(1)), matched + lit(1))))
    cur.withColumn(out, dom)
      .drop((1 to maxS).map(s => s"__psl_$s"): _*)
  }

  /** FULL-PSL registered domain — [[registeredDomainPsl]] extended to
    * all three rule classes per the publicsuffix.org algorithm: an
    * exception rule always prevails (its public suffix is the rule
    * minus the leftmost label, so `!www.ck` makes `www.ck` itself
    * registrable); otherwise the LONGEST match among plain rules and
    * wildcard matches (`*.ck` ⇒ any `<label>.ck` is a public suffix)
    * wins; no match falls back to the implicit `*` rule (last label is
    * the suffix, registered domain = last two). Same engine shape: one
    * chained MAP-ONLY broadcast join per (rule class, label count) —
    * ~11 joins for the full list, each against a ≤10k-row broadcast —
    * so the crawl-scale corpus never shuffles. */
  def registeredDomainPslFull(df: DataFrame, hostCol: String,
                              rules: PslRules, out: String = "domain")
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val labels = split(col(hostCol), "\\.")
    val n      = size(labels)
    val isIp = col(hostCol).rlike("^[0-9]+(\\.[0-9]+){3}$") ||
      col(hostCol).contains(":")
    def byLen(rs: Seq[String]): Seq[(Int, Seq[String])] =
      rs.distinct.groupBy(_.count(_ == '.') + 1).toSeq.sortBy(_._1)
    // (kind, rule label count) -> join column; distinct-per-class rules
    // keep every broadcast join row-preserving (round-9 invariant)
    var cur = df
    def addJoins(kind: String, groups: Seq[(Int, Seq[String])])
        : Seq[(Int, String)] = groups.map { case (len, vs) =>
      val cn = s"__pslf_${kind}_$len"
      val cand = when(n >= len, concat_ws(".", slice(labels, -len, len)))
      cur = cur.join(broadcast(vs.toDF(cn)), cand === col(cn), "left")
      (len, cn)
    }
    val pJoins = addJoins("p", byLen(rules.plain))
    val wJoins = addJoins("w", byLen(rules.wildcardBases))
    val eJoins = addJoins("e", byLen(rules.exceptions))
    // longest-wins folds (ascending wrap = largest checked first)
    val sPlain = pJoins.foldLeft(lit(0)) { case (acc, (len, cn)) =>
      when(col(cn).isNotNull, lit(len)).otherwise(acc)
    }
    // a wildcard rule has base+1 labels, so it only matches hosts with
    // at least base+1 labels; its public suffix spans base+1
    val sWild = wJoins.foldLeft(lit(0)) { case (acc, (len, cn)) =>
      when(col(cn).isNotNull && n >= len + 1, lit(len + 1)).otherwise(acc)
    }
    val sExc = eJoins.foldLeft(lit(-1)) { case (acc, (len, cn)) =>
      when(col(cn).isNotNull, lit(len - 1)).otherwise(acc)
    }
    val matched = when(sExc >= 0, sExc).otherwise(greatest(sPlain, sWild))
    val dom = when(isIp || n <= 1, col(hostCol))
      .when(matched === 0,
        when(n <= 2, col(hostCol))
          .otherwise(concat_ws(".", slice(labels, -2, 2))))
      .when(matched === n, col(hostCol))
      .otherwise(concat_ws(".",
        slice(labels, -(matched + lit(1)), matched + lit(1))))
    cur.withColumn(out, dom)
      .drop((pJoins ++ wJoins ++ eJoins).map(_._2): _*)
  }

  /** Canonical URL: fragment stripped, scheme + host lower-cased (scheme
    * defaults to `http` when absent), userinfo dropped, default ports
    * (http:80 / https:443) removed, empty path normalized to `/`. Path +
    * query keep their original case. The standard pre-dedup URL key. */
  def canonicalize(url: Column): Column = {
    val noFrag    = regexp_replace(url, "#.*", "")
    val rawScheme = lower(regexp_extract(noFrag, SchemeRe, 0))
    val scheme    = when(rawScheme === "", lit("http"))
      .otherwise(regexp_replace(rawScheme, "://", ""))
    val after     = regexp_replace(noFrag, SchemeRe, "")
    val hostPort  = regexp_extract(after, "^(?:[^/?#@]*@)?([^/?#]*)", 1)
    val pathQ     = regexp_extract(after, "^(?:[^/?#@]*@)?[^/?#]*(.*)", 1)
    val h         = lower(regexp_extract(hostPort, "^([^:]+)", 1))
    val port      = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort  = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val hp   = when(keepPort, concat(h, lit(":"), port)).otherwise(h)
    val path = when(pathQ === "", lit("/")).otherwise(pathQ)
    concat(scheme, lit("://"), hp, path)
  }

  /** Per-registered-domain corpus statistics: volume, exact distinct
    * content, duplicate fraction — the "is this domain boilerplate?"
    * rollup that decides crawl caps. One shuffle on the domain key. */
  def domainStats(df: DataFrame, urlCol: String, textCol: String)
  : DataFrame =
    df.select(
        registeredDomain(stripWww(host(col(urlCol)))).as("domain"),
        col(textCol).as("__t"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("__t")).cast("long")).as("total_chars"),
        countDistinct(col("__t")).as("distinct_texts"))
      .withColumn("dup_frac",
        (col("n_docs") - col("distinct_texts")).cast("double") /
          col("n_docs").cast("double"))

  /** Per-domain volume cap: keep at most `k` docs per registered domain,
    * preferring high `scoreCol` (ties to low id) — RefinedWeb-style
    * anti-boilerplate throttling. Bounded TopKCollect aggregate (≤ k rows
    * per domain cross the exchange), no WindowExec. */
  def domainCap(df: DataFrame, urlCol: String, idCol: Column,
                scoreCol: Column, k: Int): DataFrame = {
    // domain pre-projected: takeOrderedByKey re-selects its key columns
    // after the aggregate, so the key must be a plain column there
    val withDomain = df.withColumn("domain",
      registeredDomain(stripWww(host(col(urlCol)))))
    graft.operators.Ops.takeOrderedByKey(k, idCol, scoreCol,
      Seq(col("domain")), as = ("doc_id", "score"))(withDomain)
  }
}
