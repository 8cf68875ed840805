package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextAnalysis}
import graft.operators.Sampling

/** URL canonicalization / registered-domain / per-domain-cap family
  * (q146-q148). The kernel's rule list is certified against the DuckDB
  * regex replay by the oracle gate; THIS spec pins the edges the
  * synthesized corpus can't reach (unparseable input, IP hosts, weird
  * ports, suffix-set boundaries) plus the cap/gate operator semantics.
  */
class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def parts(url: String): (String, String, String) = {
    GraftFunctions.ensureRegistered(spark)
    val r = Seq(Tuple1(url)).toDF("url")
      .select(TextAnalysis.canonicalUrl(col("url")),
        TextAnalysis.urlHost(col("url")),
        TextAnalysis.registeredDomain(col("url")))
      .collect()(0)
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("canonicalization rules: scheme/host case, www, ports, path, query, fragment") {
    // scheme + host lowercase, www strip, fragment drop, empty path → /
    assert(parts("HTTPS://WWW.Example.COM#frag") ===
      (("https://example.com/", "example.com", "example.com")))
    // default ports stripped per scheme; non-default kept
    assert(parts("http://a.com:80/x")._1 === "http://a.com/x")
    assert(parts("https://a.com:443/x")._1 === "https://a.com/x")
    assert(parts("https://a.com:80/x")._1 === "https://a.com:80/x")
    assert(parts("http://a.com:8080/x")._1 === "http://a.com:8080/x")
    // trailing host dots stripped; ONE leading www. stripped
    assert(parts("https://example.com./x")._2 === "example.com")
    assert(parts("https://www.www.example.com/x")._2 === "www.example.com")
    // query: tracking keys dropped (case-insensitive key, utm_ by
    // prefix), survivor ORDER preserved, empty segments dropped,
    // all-tracking query loses its '?'
    assert(parts("https://a.com/p?UTM_Source=x&id=7&&b=c=d&fbclid=z")._1 ===
      "https://a.com/p?id=7&b=c=d")
    assert(parts("https://a.com/p?utm_medium=em")._1 === "https://a.com/p")
    // host-only URL with query: empty path still becomes "/"
    assert(parts("https://a.com?id=1")._1 === "https://a.com/?id=1")
  }

  test("registered domain: suffix set, IP hosts, label-count edges") {
    assert(parts("https://news.blogs.bbc.co.uk/x")._3 === "bbc.co.uk")
    assert(parts("https://a.b.example.com/x")._3 === "example.com")
    assert(parts("https://co.uk/")._3 === "co.uk") // bare 2-label suffix
    assert(parts("https://localhost:9090/x")._3 === "localhost")
    assert(parts("http://192.168.0.1:8080/a") ===
      (("http://192.168.0.1:8080/a", "192.168.0.1", "192.168.0.1")))
  }

  test("private-registry witness: platform subdomains are DISTINCT registered domains") {
    // the PSL PRIVATE DOMAINS semantics q148's cap depends on: every
    // *.github.io site is its own registrant — two users must NOT
    // collapse into one "github.io" group and get capped collectively
    assert(parts("https://user1.github.io/p")._3 === "user1.github.io")
    assert(parts("https://user2.github.io/p")._3 === "user2.github.io")
    assert(parts("https://user1.github.io/p")._3 !==
      parts("https://user2.github.io/p")._3)
    // deeper subdomains still roll up to the site, not the platform
    assert(parts("https://a.b.user1.github.io/p")._3 === "user1.github.io")
    // depth-3 private suffix: bucket.s3.amazonaws.com is the registrant
    assert(parts("https://assets.bucket.s3.amazonaws.com/k")._3 ===
      "bucket.s3.amazonaws.com")
    // a host that IS a private suffix passes through verbatim
    assert(parts("https://github.io/")._3 === "github.io")
    // longest match wins: blogspot.com beats the implicit .com rule
    assert(parts("https://me.blogspot.com/x")._3 === "me.blogspot.com")
    assert(parts("https://me.example.com/x")._3 === "example.com")
  }

  test("suffix-set parameterization: a custom PSL snapshot overrides the built-in") {
    GraftFunctions.ensureRegistered(spark)
    val custom = Seq("co.uk", "pages.example", "cdn.pages.example")
    val df = Seq("https://u1.pages.example/a", "https://x.cdn.pages.example/b",
        "https://me.github.io/c").toDF("url")
      .select(TextAnalysis.registeredDomain(col("url"), custom).as("d"))
    assert(df.as[String].collect().toSeq ===
      // longest match: cdn.pages.example (depth 3) beats pages.example;
      // github.io is NOT in the custom set → implicit last-2 rule
      Seq("u1.pages.example", "x.cdn.pages.example", "github.io"))
  }

  test("vendored PSL snapshot: multi-label + .us-grid suffixes resolve eTLD+1") {
    GraftFunctions.ensureRegistered(spark)
    def rd(url: String): String =
      Seq(Tuple1(url)).toDF("url")
        .select(TextAnalysis.registeredDomain(col("url"),
          graft.functions.PublicSuffixes.snapshot))
        .collect()(0).getString(0)
    // the r19 verdict's named class: 4-label Massachusetts school registry
    assert(rd("https://www.lincoln.pvt.k12.ma.us/calendar") ===
      "lincoln.pvt.k12.ma.us")
    assert(rd("https://a.b.whitmore.chtr.k12.ma.us/") ===
      "whitmore.chtr.k12.ma.us")
    // the 3-label state grids
    assert(rd("https://portal.district.k12.ca.us/x") === "district.k12.ca.us")
    assert(rd("https://www.branch.lib.tx.us/") === "branch.lib.tx.us")
    // 2-label state locality root
    assert(rd("https://www.springfield.ma.us/") === "springfield.ma.us")
    // ccTLD second-level registries the built-in subset lacks
    assert(rd("https://shop.example.com.au/p") === "example.com.au")
    assert(rd("https://news.corp.co.th/") === "corp.co.th")
    assert(rd("https://x.y.firm.co.at/") === "firm.co.at")
    assert(rd("https://www.city.waw.pl/") === "city.waw.pl")
    // Canada provincial suffixes
    assert(rd("https://www.toronto.on.ca/") === "toronto.on.ca")
    // private registries still ride along in the snapshot
    assert(rd("https://user1.github.io/p") === "user1.github.io")
    // unlisted TLDs keep the implicit last-two-labels rule
    assert(rd("https://a.b.example.dev/") === "example.dev")
    // the DEFAULT built-in path is untouched (q146's oracle contract)
    assert(parts("https://news.blogs.bbc.co.uk/x")._3 === "bbc.co.uk")
    // snapshot sanity: deduped, lowercase, multi-label-or-state entries
    val snap = graft.functions.PublicSuffixes.snapshot
    assert(snap.distinct.size === snap.size, "snapshot has duplicate entries")
    assert(snap.forall(s => s == s.toLowerCase), "snapshot must be lowercase")
    assert(graft.functions.PublicSuffixes.usGrid.size === 51 * 4 + 3)
  }

  test("percent-encoding normalization: unreserved decode, reserved uppercase") {
    // %7E/~ and case variants of one page collapse to ONE canonical URL
    assert(parts("https://a.com/%7Euser")._1 === "https://a.com/~user")
    assert(parts("https://a.com/%7euser")._1 === "https://a.com/~user")
    assert(parts("https://a.com/~user")._1 === "https://a.com/~user")
    // reserved escapes keep % form, hex uppercased (%2f is '/', %3a ':')
    assert(parts("https://a.com/a%2fb%3a1")._1 === "https://a.com/a%2Fb%3A1")
    // applies inside surviving query segments too; malformed % untouched
    assert(parts("https://a.com/p?x=%41%4a&gclid=%7e")._1 ===
      "https://a.com/p?x=AJ")
    assert(parts("https://a.com/p%g1%7")._1 === "https://a.com/p%g1%7")
    // digit escape decodes (unreserved DIGIT)
    assert(parts("https://a.com/v%31")._1 === "https://a.com/v1")
  }

  test("unparseable input → NULL triple; NULL propagates") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq("no-scheme.com/x", "ht!tp://x.com", "https:///nohost",
        "://x", "")
      .toDF("url")
      .select(TextAnalysis.canonicalUrl(col("url")).as("c"),
        TextAnalysis.urlHost(col("url")).as("h"),
        TextAnalysis.registeredDomain(col("url")).as("d"))
    assert(df.filter(col("c").isNotNull || col("h").isNotNull ||
      col("d").isNotNull).count() === 0)
    val n = Seq(Tuple1(null: String)).toDF("url")
      .select(TextAnalysis.canonicalUrl(col("url"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("domainBlocked: literal gate, lowercase contract, NULL gates false") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(Some("bad.com"), Some("good.org"), None).toDF("domain")
      .withColumn("b", TextAnalysis.domainBlocked(col("domain"), Seq("BAD.com")))
    assert(df.orderBy("domain").select("b").as[Boolean].collect().toSeq ===
      Seq(false, true, false)) // NULL sorts first in orderBy asc
  }

  test("perDomainCap: ≤k per domain, deterministic, rank 1-based") {
    val docs = (0L until 200L).map(i => (i, s"dom${i % 7}.com")).toDF("doc_id", "domain")
    val kept = Sampling.perDomainCap(docs, col("domain"), col("doc_id"), k = 9)
    val byDom = kept.groupBy("domain").count().collect()
    assert(byDom.length === 7 && byDom.forall(_.getLong(1) === 9L))
    assert(kept.filter(col("rank") < 1 || col("rank") > 9).count() === 0)
    // deterministic under repartition
    val again = Sampling.perDomainCap(docs.repartition(13), col("domain"),
      col("doc_id"), k = 9)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // NULL domain rows are dropped, not capped as a pseudo-group
    val withNull = docs.withColumn("domain",
      when(col("doc_id") % 2 === 0, col("domain")))
    val keptN = Sampling.perDomainCap(withNull, col("domain"), col("doc_id"), k = 9)
    assert(keptN.filter(col("domain").isNull).count() === 0)
  }

  test("perDomainCap priority variant keeps the k best, ties by id") {
    val docs = (0L until 60L).map(i => (i, s"d${i % 3}", (i % 10).toDouble))
      .toDF("doc_id", "domain", "score")
    val kept = Sampling.perDomainCap(docs, col("domain"), col("doc_id"),
      k = 4, priority = Some(col("score")))
    // every kept row's score must be in that domain's top-4 score set
    assert(kept.count() === 12)
    assert(kept.filter(col("score") < 8.0).count() === 0)
    // NULL priority rows are never kept
    val np = docs.withColumn("score",
      when(col("score") > 0, col("score")))
    val keptNp = Sampling.perDomainCap(np, col("domain"), col("doc_id"),
      k = 4, priority = Some(col("score")))
    assert(keptNp.filter(col("score").isNull).count() === 0)
  }

  test("urlParts fuzz: kernel == independent regex reference parser") {
    // second implementation from the RFC-3986-style decomposition regex
    // (the DuckDB oracle's shape, in Scala) — shares no code with the
    // walker; divergence on any generated URL fails with the input
    val suffixByDepth = graft.functions.TextKernels.defaultSuffixList
      .groupBy(_.count(_ == '.') + 1).view.mapValues(_.toSet).toMap
    val tracking = graft.functions.TextKernels.trackingKeyList.toSet
    // independent percent-normalizer: regex tokenization (the oracle's
    // shape), not the kernel's char walk
    def pctRef(s: String): String =
      "%[0-9A-Fa-f]{2}|[^%]+|%".r.findAllIn(s).map { t =>
        if (t.length == 3 && t.startsWith("%")) {
          val code = Integer.parseInt(t.substring(1), 16)
          if (code.toChar.isLetterOrDigit && code < 128 ||
              "-._~".contains(code.toChar)) code.toChar.toString
          else "%" + t.substring(1).toUpperCase
        } else t
      }.mkString
    def ref(url: String): (String, String, String) = {
      var t = url.dropWhile(c => c == ' ' || c == '\t')
        .reverse.dropWhile(c => c == ' ' || c == '\t').reverse
      t = t.takeWhile(_ != '#')
      val m = "^([A-Za-z][A-Za-z0-9+.\\-]*)://(.*)$".r.findFirstMatchIn(t)
        .getOrElse(return (null, null, null))
      val scheme = m.group(1).toLowerCase
      val rest = m.group(2)
      val hostport = rest.takeWhile(c => c != '/' && c != '?')
      val pathquery = rest.drop(hostport.length)
      val pm = ":([0-9]+)$".r.findFirstMatchIn(hostport)
      val portD = pm.map(_.group(1)).getOrElse("")
      val host0 = if (portD.nonEmpty) hostport.dropRight(portD.length + 1) else hostport
      var host = host0.toLowerCase.reverse.dropWhile(_ == '.').reverse
      if (host.startsWith("www.") && host.length > 4) host = host.drop(4)
      if (host.isEmpty) return (null, null, null)
      val port = if ((scheme == "http" && portD == "80") ||
        (scheme == "https" && portD == "443")) "" else portD
      val qi = pathquery.indexOf('?')
      val path0 = if (qi >= 0) pathquery.take(qi) else pathquery
      val q0 = if (qi >= 0) pathquery.drop(qi + 1) else ""
      val path = if (path0.isEmpty) "/" else path0
      val kept = q0.split("&", -1).filter(_.nonEmpty).filter { seg =>
        val key = seg.takeWhile(_ != '=').toLowerCase
        !key.startsWith("utm_") && !tracking.contains(key)
      }.mkString("&")
      val canon = pctRef(scheme + "://" + host +
        (if (port.nonEmpty) ":" + port else "") + path +
        (if (kept.nonEmpty) "?" + kept else ""))
      val domain =
        if (host.forall(c => c.isDigit || c == '.')) host
        else {
          val labs = host.split("\\.", -1)
          // longest-match PSL replay: deepest listed suffix + one label
          val hit = suffixByDepth.keys.toSeq.sorted.reverse.collectFirst {
            case d if labs.length >= d &&
              suffixByDepth(d).contains(labs.takeRight(d).mkString(".")) =>
              labs.takeRight(math.min(d + 1, labs.length)).mkString(".")
          }
          hit.getOrElse(
            if (labs.length >= 2) labs.takeRight(2).mkString(".") else host)
        }
      (canon, host, domain)
    }
    def kernel(url: String): (String, String, String) = {
      val a = graft.functions.TextKernels.urlParts(
        org.apache.spark.unsafe.types.UTF8String.fromString(url))
      def g(i: Int) = if (a.isNullAt(i)) null else a.getUTF8String(i).toString
      (g(0), g(1), g(2))
    }
    val rnd = new scala.util.Random(20260816L)
    val schemes = Seq("https", "HTTP", "ftp", "h2", "")
    val hosts = Seq("Example.COM", "www.a.b.co.uk", "WWW.x.ORG", "127.0.0.1",
      "a.com.", "localhost", "www.", "x..y.io", "co.uk", "a.com:abc",
      "u1.GitHub.IO", "www.me.Blogspot.com", "b.s3.amazonaws.com",
      "a.b.s3.amazonaws.com", "s3.amazonaws.com", "github.io.evil.com")
    val ports = Seq("", ":80", ":443", ":8080", ":0443", ":")
    val paths = Seq("", "/", "/p/q", "/p?x=1?y=2", "?id=1", "/p?utm_a=1&b=2&",
      "?UTM_X=1&gclid=z", "?a=1&&b==2&REF=x", "?u=http://b.com/c",
      "/%7Euser/%2fa", "/a%3ab%GG%4", "/x?q=%41%zz&id=%7e", "/%", "/100%25")
    val frags = Seq("", "#f", "#f://x", "#")
    for (_ <- 1 to 4000) {
      def pick[T](s: Seq[T]) = s(rnd.nextInt(s.length))
      val url = (if (rnd.nextBoolean()) " " else "") + pick(schemes) +
        (if (rnd.nextInt(10) == 0) ":/" else "://") + pick(hosts) +
        pick(ports) + pick(paths) + pick(frags) +
        (if (rnd.nextBoolean()) "\t" else "")
      assert(kernel(url) === ref(url), s"url=<$url>")
    }
  }

  test("q146 plan: one shuffle-free codegen projection, ONE kernel walk per row") {
    val df = Queries.all("q146_url_canonicalize")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join") && !p.contains("Sort"),
      p.take(1500))
    assert(p.contains("*(1)"), p.take(1500)) // whole-stage codegen
    // the three projections (canon/host/domain) must collapse to ONE
    // urlParts call under subexpression elimination — a refactor that
    // breaks CSE (e.g. per-projection aliases that defeat semanticEquals)
    // would silently triple the walk
    val code = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert("urlParts".r.findAllIn(code).size === 1, code.take(2000))
  }

  test("q148 plan: bounded-heap agg — no window sort, one exchange") {
    val p = Queries.all("q148_per_domain_cap")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("Window") && !p.contains("SortAggregate"), p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
  }
}
