package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WebOpsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(WebOps.canonicalizeUrl(col("url")))
      .collect().map(_.getString(0)).toSeq

  test("urlParts: full URL decomposes; missing parts are empty strings") {
    val r = Seq("https://Host.Example.com:8443/a/b?x=1&y=2#frag")
      .toDF("url").select(WebOps.urlParts(col("url")).as("p")).select("p.*").head
    assert(r.getAs[String]("scheme") == "https")
    assert(r.getAs[String]("host") == "Host.Example.com")
    assert(r.getAs[String]("port") == "8443")
    assert(r.getAs[String]("path") == "/a/b")
    assert(r.getAs[String]("query") == "x=1&y=2")
    assert(r.getAs[String]("fragment") == "frag")

    val bare = Seq("http://h").toDF("url")
      .select(WebOps.urlParts(col("url")).as("p")).select("p.*").head
    assert(bare.getAs[String]("port") == "" && bare.getAs[String]("path") == "" &&
      bare.getAs[String]("query") == "" && bare.getAs[String]("fragment") == "")
  }

  test("urlParts: a '?' inside the fragment is not a query") {
    val r = Seq("http://h/p#frag?notquery").toDF("url")
      .select(WebOps.urlParts(col("url")).as("p")).select("p.*").head
    assert(r.getAs[String]("query") == "")
    assert(r.getAs[String]("fragment") == "frag?notquery")
  }

  test("canonicalizeUrl applies each rule") {
    assert(canon(
      "HTTP://WWW.Site.COM:80/Path/#f", // case, default port, fragment, trailing slash
      "https://h.com:443/",             // https default port; root path survives
      "https://h.com:8443/x",           // non-default port kept
      "http://h.com",                   // empty path → "/"
      "http://h.com/p?utm_source=a&id=3&gclid=b", // tracking params drop, real one stays
      "http://h.com/p?utm_source=a",    // query empties → '?' dropped
      "not a url"                       // unparseable → empty
    ) == Seq(
      "http://www.site.com/Path", // path case is preserved (paths are case-sensitive)
      "https://h.com/",
      "https://h.com:8443/x",
      "http://h.com/",
      "http://h.com/p?id=3",
      "http://h.com/p",
      ""))
  }

  test("canonical URL is a fixpoint: canonicalizing twice changes nothing") {
    val urls = Seq(
      "HTTP://A.B.COM:80/x/?utm_source=1&k=2#z",
      "https://x.co.uk/deep/path//",
      "http://h.com").toDF("url")
    val once = urls.select(WebOps.canonicalizeUrl(col("url")).as("url"))
    val twice = once.select(WebOps.canonicalizeUrl(col("url")).as("url"))
    assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
  }

  test("registrableDomain: longest suffix wins; bare suffix and no match yield empty") {
    val r = Seq(
      "blog.x.co.uk",     // multi-label suffix beats .uk
      "a.b.example.com",  // deep subdomain collapses
      "user.github.io",   // site-as-suffix (github.io)
      "example.com",      // already registrable
      "co.uk",            // bare suffix — not registrable
      "localhost"         // no suffix
    ).toDF("host").select(WebOps.registrableDomain(col("host")))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("x.co.uk", "example.com", "user.github.io", "example.com", "", ""))
  }

  test("blockDomains: registrable-domain entries kill subdomains, host entries kill one host") {
    val df = Seq(
      (1L, "https://a.b.example.com/x"),     // rd example.com — blocked
      (2L, "https://example.com/y"),         // exact rd — blocked
      (3L, "https://sub.other.com/z"),       // survives
      (4L, "http://news.x.org/a"),           // exact host entry — blocked
      (5L, "http://blog.x.org/b"),           // same rd, different host — survives
      (6L, "https://EXAMPLE.COM/case"),      // case-folded — blocked
      (7L, null))                            // no URL — matches no entry, KEPT
      .toDF("id", "url")
    val blocked = Seq("example.com", "news.x.org")
    val kept = WebOps.blockDomains(df, "url", blocked)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 5L, 7L),
      s"subdomain collapse + exact-host + null-url semantics: $kept")
    // the broadcast anti-join twin is semantics-identical
    val viaJoin = WebOps.blockDomainsJoin(df, "url", blocked.toDF("domain"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaJoin == kept, "join twin must match the literal predicate")
    assert(WebOps.blockDomainsJoin(df, "url", blocked.toDF("domain"))
      .columns.toSeq == df.columns.toSeq, "helper columns must not leak")
  }

  test("capPerDomainIncremental: advance == full recompute; replay is a no-op") {
    // three daily batches over shared + disjoint domains; the advance
    // chain must equal capping the full union at every step (top-k
    // merge-associativity), untouched domains must pass through, and
    // re-ingesting a batch must change nothing
    val day1 = Seq((1L, "a.com", 5.0), (2L, "a.com", 9.0), (3L, "a.com", 7.0),
      (4L, "b.org", 1.0)).toDF("id", "dom", "score")
    val day2 = Seq((5L, "a.com", 8.0), (6L, "c.net", 2.0)).toDF("id", "dom", "score")
    val day3 = Seq((7L, "a.com", 9.0), (8L, "b.org", 0.5)).toDF("id", "dom", "score")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    var store = WebOps.capPerDomain(day1, "dom", "id", "score", 2)
    var full = day1
    for (b <- Seq(day2, day3)) {
      store = WebOps.capPerDomainIncremental(b, store, "dom", "id", "score", 2)
      full = full.unionByName(b)
      assert(snap(store) == snap(WebOps.capPerDomain(full, "dom", "id", "score", 2)),
        "advance must equal the full recompute")
    }
    // ties broke deterministically: day3's (7, 9.0) beats (2, 9.0)? no —
    // equal score, smaller id wins, so 2 stays and 7 joins over 5/3
    assert(snap(store).map(_._1) == Set(2L, 7L, 4L, 8L, 6L), s"got ${snap(store)}")
    val replayed = WebOps.capPerDomainIncremental(day3, store, "dom", "id", "score", 2)
    assert(snap(replayed) == snap(store), "a re-delivered batch must be a no-op")
    val disjoint = WebOps.capPerDomainIncremental(
      Seq((9L, "d.io", 1.0)).toDF("id", "dom", "score"), store, "dom", "id", "score", 2)
    assert(snap(disjoint) == snap(store) + ((9L, "d.io", 1.0)),
      "untouched domains pass through untouched")
  }

  test("capPerDomain keeps the top-k by score with deterministic ties") {
    val df = Seq(
      ("a.com", 1L, 10), ("a.com", 2L, 30), ("a.com", 3L, 20), ("a.com", 4L, 30),
      ("b.com", 5L, 5)).toDF("domain", "doc_id", "score")
    val kept = WebOps.capPerDomain(df, "domain", "doc_id", "score", k = 2)
      .orderBy("domain", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // a.com: scores 30(id 2), 30(id 4), 20, 10 — tie at 30 keeps smaller id first
    assert(kept.toSeq == Seq(("a.com", 2L), ("a.com", 4L), ("b.com", 5L)))
  }

  test("capPerDomain: domains under k are untouched; output bounded by k per domain") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("domain", concat(lit("www."), col("source"), lit(".com")))
      .withColumn("domain", WebOps.registrableDomain(col("domain")))
    val capped = WebOps.capPerDomain(docs, "domain", "doc_id", "n_chars", k = 4)
    val sizes = capped.groupBy("domain").count().collect()
    assert(sizes.forall(_.getLong(1) <= 4))
    val small = docs.groupBy("domain").count().filter(col("count") <= 4)
      .select("domain").as[String].collect().toSet
    val keptSmall = capped.filter(col("domain").isin(small.toSeq: _*))
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val origSmall = docs.filter(col("domain").isin(small.toSeq: _*))
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptSmall == origSmall)
  }

  test("robotsRules: group runs, agent prefix specificity, empty-pattern no-ops") {
    import spark.implicits._
    val txt = Seq(
      "# policy",
      "User-agent: *",
      "Disallow: /",
      "",
      "User-agent: graftbot",
      "User-agent: otherbot", // run of UA lines = ONE group
      "Disallow: /deep/",
      "Allow: /deep/pub",
      "Disallow:",            // empty pattern = no-op, must drop
      "Disallow: /*.pdf$").mkString("\n")
    val robots = Seq(("Ex.COM", txt)).toDF("host", "robots_txt")
    // graftbot-1.0 starts with 'graftbot' (len 8) > '*' (0) -> only the
    // specific group's rules survive; host lowercased
    val rules = WebOps.robotsRules(robots, "host", "robots_txt", "Graftbot-1.0".toLowerCase)
      .orderBy("pattern").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2), r.getLong(3)))
    assert(rules.toSeq == Seq(
      ("ex.com", "/*.pdf$", false, 7L),
      ("ex.com", "/deep/", false, 6L),
      ("ex.com", "/deep/pub", true, 9L)), s"got ${rules.toSeq}")
    // an unmatched agent falls back to the '*' group
    val fallback = WebOps.robotsRules(robots, "host", "robots_txt", "strangebot")
      .collect().map(r => (r.getString(1), r.getBoolean(2)))
    assert(fallback.toSeq == Seq(("/", false)))
  }

  test("robotsDecision: longest match wins, allow wins ties, $ anchors, no-robots allows") {
    import spark.implicits._
    val txt = Seq(
      "User-agent: *",
      "Disallow: /deep/",
      "Allow: /deep/pub",
      "Disallow: /*.pdf$",
      "Allow: /mixed",
      "Disallow: /mixed").mkString("\n")
    val rules = WebOps.robotsRules(
      Seq(("ex.com", txt)).toDF("host", "robots_txt"), "host", "robots_txt", "anybot")
    val urls = Seq(
      (1L, "https://ex.com/open/x"),          // no match -> allowed
      (2L, "https://ex.com/deep/secret"),     // /deep/ -> disallowed
      (3L, "https://ex.com/deep/pub/a"),      // /deep/pub (9) beats /deep/ (6) -> allowed
      (4L, "https://ex.com/files/r.pdf"),     // /*.pdf$ -> disallowed
      (5L, "https://ex.com/files/r.pdfx"),    // $ anchor must NOT match -> allowed
      (6L, "https://ex.com/mixed"),           // allow/disallow tie -> allow wins
      (7L, "https://nobots.net/anything"))    // host without robots -> allowed
      .toDF("id", "url")
    val got = WebOps.robotsDecision(urls, "url", rules)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), Option(r.get(3))))
    assert(got.toSeq == Seq(
      (1L, true, None),
      (2L, false, Some("/deep/")),
      (3L, true, Some("/deep/pub")),
      (4L, false, Some("/*.pdf$")),
      (5L, true, None),
      (6L, true, Some("/mixed")),
      (7L, true, None)), s"got ${got.toSeq}")
  }
  test("robotsDecision: patterns match path PLUS query (RFC 9309 §2.2.2)") {
    import spark.implicits._
    val txt = Seq(
      "User-agent: *",
      "Disallow: /search?q=",
      "Disallow: /*?*session=").mkString("\n")
    val rules = WebOps.robotsRules(
      Seq(("ex.com", txt)).toDF("host", "robots_txt"), "host", "robots_txt", "anybot")
    val urls = Seq(
      (1L, "https://ex.com/search?q=cats"),       // literal ?-pattern fires
      (2L, "https://ex.com/search"),              // same path, no query -> allowed
      (3L, "https://ex.com/p?a=1&session=9"),     // wildcard query pattern fires
      (4L, "https://ex.com/p?a=1"))               // query present, pattern misses
      .toDF("id", "url")
    val got = WebOps.robotsDecision(urls, "url", rules)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), Option(r.get(3))))
    assert(got.toSeq == Seq(
      (1L, false, Some("/search?q=")),
      (2L, true, None),
      (3L, false, Some("/*?*session=")),
      (4L, true, None)), s"got ${got.toSeq}")
  }

  test("frontierAdvance: advance ∘ advance ≡ one-shot; transition, counts, gate, cap") {
    import spark.implicits._
    val txt = Seq("User-agent: *", "Disallow: /private/").mkString("\n")
    val rules = WebOps.robotsRules(
      Seq(("a.com", txt), ("b.com", txt)).toDF("host", "robots_txt"),
      "host", "robots_txt", "anybot")
    // batch 1 crawls p1/p2; batch 2 crawls p3 AND the a.com/x that
    // batch 1 discovered (the candidate-then-crawled transition)
    val b1Edges = Seq(
      "https://a.com/x", "https://a.com/x",      // 2 refs accumulate
      "https://b.com/y",
      "https://a.com/private/z",                 // robots drops at entry
      "https://a.com/p1").toDF("url")            // already crawled this batch
    val b1Crawled = Seq("https://a.com/p1", "https://b.com/p2").toDF("url")
    val b2Edges = Seq(
      "https://a.com/x",                          // 3rd ref — but crawled below
      "https://b.com/y", "https://b.com/y",       // grows 1 -> 3
      "https://c.org/new").toDF("url")            // no robots -> allowed
    val b2Crawled = Seq("https://a.com/p3", "https://a.com/x").toDF("url")

    val (f1, v1) = WebOps.frontierAdvance(b1Edges, b1Crawled, rules,
      WebOps.emptyFrontierStore(spark), WebOps.emptyVisitedStore(spark))
    val (f2, v2) = WebOps.frontierAdvance(b2Edges, b2Crawled, rules, f1, v1)

    val gotF = f2.orderBy("url").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(gotF == Seq(
      ("https://b.com/y", "b.com", 3L),
      ("https://c.org/new", "c.org", 1L)), s"got $gotF")
    assert(v2.as[String].collect().sorted.toSeq == Seq(
      "https://a.com/p1", "https://a.com/p3", "https://a.com/x",
      "https://b.com/p2"))

    // one-shot over the union ≡ the two-step advance (the q277 identity)
    val (fAll, vAll) = WebOps.frontierAdvance(
      b1Edges.unionByName(b2Edges), b1Crawled.unionByName(b2Crawled), rules,
      WebOps.emptyFrontierStore(spark), WebOps.emptyVisitedStore(spark))
    assert(fAll.orderBy("url").collect().toSeq == f2.orderBy("url").collect().toSeq)
    assert(vAll.orderBy("url").collect().toSeq == v2.orderBy("url").collect().toSeq)

    // politeness emission: top-k per host by (n_refs desc, url asc),
    // never mutating the store
    val manyB = (1 to 5).map(i => s"https://b.com/m$i").toDF("url")
    val (f3, _) = WebOps.frontierAdvance(manyB, b2Crawled.limit(0), rules, f2, v2)
    val next = WebOps.frontierNext(f3, 2).orderBy("url").collect()
      .map(_.getString(0)).toSeq
    assert(next == Seq("https://b.com/y", "https://b.com/m1", "https://c.org/new")
      .sorted, s"got $next") // y (3 refs) + m1 (tie broken by url) + c.org's only
    assert(f3.count() == 7, "emission must not shrink the store")
  }

  test("robotsSitemaps group-free; robotsCrawlDelay follows the chosen group") {
    import spark.implicits._
    val txt = Seq(
      "Sitemap: https://ex.com/sitemap.xml", // before any group
      "User-agent: *",
      "Disallow: /",
      "Crawl-delay: 10",
      "",
      "User-agent: graftbot",
      "Allow: /",
      "Crawl-delay: 2.5",
      "Crawl-delay: fast",                   // non-numeric drops
      "Sitemap: https://ex.com/sm/extra.xml" // inside a group — still global
    ).mkString("\n")
    val robots = Seq(("Ex.COM", txt)).toDF("host", "robots_txt")
    val sm = WebOps.robotsSitemaps(robots, "host", "robots_txt")
      .orderBy("sitemap_url").collect().map(r => (r.getString(0), r.getString(1)))
    assert(sm.toSeq == Seq(
      ("ex.com", "https://ex.com/sitemap.xml"),
      ("ex.com", "https://ex.com/sm/extra.xml")), s"got ${sm.toSeq}")
    def delay(agent: String): Option[Double] =
      WebOps.robotsCrawlDelay(robots, "host", "robots_txt", agent)
        .collect().headOption.map(_.getDouble(1))
    assert(delay("graftbot/1.0").contains(2.5),
      "the specific group's delay binds the matching agent")
    assert(delay("strangebot").contains(10.0),
      "an unmatched agent falls back to the '*' group's delay")
    // the extra line kinds must not disturb the rule reader
    val rules = WebOps.robotsRules(robots, "host", "robots_txt", "graftbot/1.0")
      .collect().map(r => (r.getString(1), r.getBoolean(2)))
    assert(rules.toSeq == Seq(("/", true)), s"got ${rules.toSeq}")
  }

  test("capPerDomainBudget: per-group budget column; non-positive budgets emit nothing") {
    import spark.implicits._
    val df = Seq(
      ("a.com", 1L, 9.0, 2L), ("a.com", 2L, 8.0, 2L), ("a.com", 3L, 7.0, 2L),
      ("b.com", 4L, 5.0, 1L), ("b.com", 5L, 6.0, 1L),
      ("c.org", 6L, 1.0, 0L))
      .toDF("domain", "id", "score", "budget")
    val kept = WebOps.capPerDomainBudget(df, "domain", "id", "score", "budget")
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 5L), s"got $kept")
  }

  test("recrawlCandidates: new + stale kept, fresh and unknown-lastmod fetched drop") {
    import spark.implicits._
    val seeds = Seq(
      ("https://ex.com/a", "2026-02-01"), // fetched earlier -> stale
      ("https://ex.com/b", "2026-01-01"), // fetched later -> fresh, drops
      ("https://ex.com/c", ""),           // fetched, no lastmod -> drops
      ("https://ex.com/d", "2026-01-10"), // never fetched -> new
      ("https://ex.com/e", ""))           // never fetched, no lastmod -> still new
      .toDF("loc", "lastmod")
    val visited = Seq(
      ("https://ex.com/a", "2026-01-15"),
      ("https://ex.com/b", "2026-01-15"),
      ("https://ex.com/c", "2026-01-15"))
      .toDF("url", "fetch_ts")
    val got = WebOps.recrawlCandidates(seeds, visited)
      .orderBy("loc").collect()
      .map(r => (r.getString(0), r.getAs[String]("reason"))).toSeq
    assert(got == Seq(
      ("https://ex.com/a", "stale"),
      ("https://ex.com/d", "new"),
      ("https://ex.com/e", "new")), s"got $got")
  }

  test("sitemap entries: whitespace, entities, optional lastmod, kind separation") {
    import spark.implicits._
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc> https://ex.com/a?x=1&amp;y=2 </loc>
        |    <lastmod>2026-01-05</lastmod>
        |  </url>
        |  <url><loc>https://ex.com/b</loc></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex>
        |  <sitemap>
        |    <loc>https://ex.com/sm/1.xml</loc>
        |  </sitemap>
        |  <sitemap><loc>https://ex.com/sm/2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val r = Seq((urlset, index)).toDF("us", "ix")
      .select(WebOps.sitemapUrlEntries(col("us")).as("e"),
        WebOps.sitemapIndexEntries(col("us")).as("usIdx"),
        WebOps.sitemapUrlEntries(col("ix")).as("ixUrls"),
        WebOps.sitemapIndexEntries(col("ix")).as("kids")).head
    val entries = r.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getString(1)))
    assert(entries == Seq(
      ("https://ex.com/a?x=1&y=2", "2026-01-05"), // decoded &, trimmed
      ("https://ex.com/b", "")),                  // optional lastmod -> empty
      s"got $entries")
    assert(r.getSeq[String](1).isEmpty && r.getSeq[org.apache.spark.sql.Row](2).isEmpty,
      "kind separation: urlset has no index entries, index has no url entries")
    assert(r.getSeq[String](3) ==
      Seq("https://ex.com/sm/1.xml", "https://ex.com/sm/2.xml"))
  }

  test("sitemapSeeds: index recursion from unreferenced roots; cycles stop at the bound") {
    import spark.implicits._
    def urlset(locs: String*): String =
      "<urlset>" + locs.map(l => s"<url><loc>$l</loc></url>").mkString + "</urlset>"
    def index(kids: String*): String =
      "<sitemapindex>" + kids.map(k => s"<sitemap><loc>$k</loc></sitemap>").mkString +
        "</sitemapindex>"
    val frame = Seq(
      ("https://ex.com/sitemap.xml", index("https://ex.com/sm/a.xml", "https://ex.com/sm/missing.xml")),
      ("https://ex.com/sm/a.xml", urlset("https://ex.com/1", "https://ex.com/2")),
      ("https://other.org/root.xml", urlset("https://other.org/solo")), // root WITH entries
      ("https://loop.net/self.xml", index("https://loop.net/self.xml")) // self-cycle
    ).toDF("url", "xml")
    val got = WebOps.sitemapSeeds(frame, "url", "xml", maxDepth = 3)
      .orderBy("loc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSeq
    assert(got == Seq(
      ("https://ex.com/sm/a.xml", "https://ex.com/1", 1L),
      ("https://ex.com/sm/a.xml", "https://ex.com/2", 1L),
      ("https://other.org/root.xml", "https://other.org/solo", 0L)),
      s"missing child contributes nothing, self-cycle terminates: $got")
  }

  test("resolveHref: every resolution arm, non-fetchable schemes drop, dir-relative") {
    import spark.implicits._
    val rows = Seq(
      ("https://Ex.COM:8080/a/b/page.html", "https://other.org/x"),   // absolute
      ("https://ex.com/a/b/page.html", "//CDN.ex.com/w.js"),          // protocol-relative
      ("https://ex.com/a/b/page.html", "/rooted?q=1"),                // root-relative
      ("https://ex.com/a/b/page.html", "sib.html"),                   // dir-relative
      ("https://ex.com", "sib.html"),                                 // empty base path -> '/'
      ("https://ex.com/a/", "#frag"),                                 // fragment drops
      ("https://ex.com/a/", "mailto:x@y.z"),                          // mailto drops
      ("https://ex.com/a/", "data:text/plain;base64,AA"),             // data drops
      ("not a url", "sib.html"))                                      // unparseable base
      .toDF("base", "href")
    val got = rows.select(WebOps.resolveHref(col("base"), col("href")).as("r"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(
      Some("https://other.org/x"),
      Some("https://CDN.ex.com/w.js"),     // scheme attached; canonicalize lowercases later
      Some("https://ex.com/rooted?q=1"),
      Some("https://ex.com/a/b/sib.html"),
      Some("https://ex.com/sib.html"),
      None, None, None, None), s"got ${got.toSeq}")
  }
}
