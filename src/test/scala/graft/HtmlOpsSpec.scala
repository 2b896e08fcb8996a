package graft

import graft.ops.HtmlOps

/** HTML extraction semantics — the parser half of the generator/parser
  * pair (the DuckDB oracle proves the round trip corpus-wide; these pin
  * the parser's behavior on adversarial markup the corpus can't carry).
  */
class HtmlOpsSpec extends SparkSpec {

  private def texts(html: String): Vector[String] =
    HtmlOps.parseHtml(html).blocks.map(_.text)

  test("nested inline tags stay one block, one word where glued") {
    assert(texts("<p>Hello <b>wor<i>ld</i></b> again today</p>") ==
      Vector("Hello world again today"))
    // block tags DO split; inline b/i/em/span/a do not
    assert(texts("<div>one two three</div><div>four five six</div>") ==
      Vector("one two three", "four five six"))
    assert(texts("<p>x <em>y</em> <span>z</span> w</p>") ==
      Vector("x y z w"))
  }

  test("script and style content is excluded WHOLE, decoy markup included") {
    assert(texts(
      "<p>before now</p><script>var s = \"<p>ghost block here</p>\"; if (1 < 2) {}</script><p>after words too</p>") ==
      Vector("before now", "after words too"))
    assert(texts("<style>p { color: red; } /* <p>nope</p> */</style><p>kept text here</p>") ==
      Vector("kept text here"))
    // unterminated script swallows the rest (total, no exception)
    assert(texts("<p>seen here now</p><script>var x = 1;") ==
      Vector("seen here now"))
  }

  test("entity decode: named, decimal, hex; junk passes through literally") {
    assert(texts("<p>salt &amp; pepper</p>") == Vector("salt & pepper"))
    assert(texts("<p>1 &lt; 2 &gt; 0 &quot;q&quot; &apos;a&apos;</p>") ==
      Vector("1 < 2 > 0 \"q\" 'a'"))
    assert(texts("<p>&#97;bc &#x41;BC</p>") == Vector("abc ABC"))
    // unknown entity, bare ampersand, unterminated entity: literal
    assert(texts("<p>&nope; AT&T tom &amp jerry</p>") ==
      Vector("&nope; AT&T tom &amp jerry"))
    // the generator's encoder round-trips through the parser
    val s = "a man and a plan and a canal"
    assert(texts("<p>" + HtmlOps.enc(s) + "</p>") == Vector(s))
    assert(HtmlOps.enc("a&b<c>d") == "&#97;&amp;b&lt;c&gt;d")
  }

  test("boilerplate triage: link density and min words") {
    val blocks = HtmlOps.parseHtml(
      "<nav><a href='/'>Home</a> <a href='/d'>Docs</a></nav>" +
        "<h1>Hi</h1>" +
        "<p>real content words here with <a href='/x'>one link</a> inside</p>")
      .blocks
    val nav = blocks(0); val h1 = blocks(1); val p = blocks(2)
    assert(nav.linkChars == nav.chars) // pure links -> density 1.0
    assert(h1.words == 1)
    assert(p.words == 8 && p.linkChars == "onelink".length)
    assert(p.linkChars.toDouble / p.chars < 0.4) // mixed block survives
  }

  test("stray '<' and junk tags are content, parse stays total") {
    assert(texts("<p>2 < 3 and x <= y</p>") == Vector("2 < 3 and x <= y"))
    assert(texts("a < b") == Vector("a < b"))
  }

  test("prefix totality: every prefix of a full page parses (jpegSof discipline)") {
    val page = HtmlOps.synthPage(7L,
      "the quick brown fox jumps over the lazy dog again and again")
    (0 to page.length).foreach { n =>
      HtmlOps.parseHtml(page.substring(0, n)) // must not throw
    }
  }

  test("generator/parser round trip recovers the text, tallies are the page constants") {
    val text = "the quick brown fox jumps over the lazy dog once more today"
    val blocks = HtmlOps.parseHtml(HtmlOps.synthPage(3L, text)).blocks
    assert(blocks.size == 8) // title nav h1 p1 p2 li li footer
    val kept = blocks.filter(b =>
      b.words >= 3 && b.linkChars.toDouble / b.chars <= 0.4)
    assert(kept.size == 2)
    assert(kept.map(_.text).mkString(" ") == text)
    // nothing from the script's decoy paragraph leaks anywhere
    assert(blocks.forall(!_.text.contains("ghost")))
  }

  test("href capture: all three quote styles, region-bounded, total on truncation") {
    val links = HtmlOps.parseHtml(
      """<a href="/dq">x</a><a href='/sq'>y</a><a href=/uq>z</a>""" +
        """<a class="k" href = "/sp">w</a><a>none</a><a href="/unterm""").links
    assert(links.map(_.href) ==
      Vector("/dq", "/sq", "/uq", "/sp", "/unterm"))
    // the synthetic page plants exactly 9 links in document order
    val page = HtmlOps.parseHtml(HtmlOps.synthPage(10L, "ten words here"))
    assert(page.links.map(_.href) == Vector("/", "/docs", "/about",
      "/r/1", "/r/3", "/privacy", "/terms", "legal/cookies#s1",
      "https://cdn.example.org/brand.png?v=2#top"))
  }

  test("anchor-text capture: collapse, entities, inline tags, nesting, totality") {
    // whitespace collapses, entities decode, inline tags vanish
    val p = HtmlOps.parseHtml(
      """<a href="/a">  read  <b>&amp;</b>
        | more </a><a href="/b">second</a>""".stripMargin)
    assert(p.links.map(_.anchor) == Vector("read & more", "second"))
    // a nested span labels every link it opened with the full text
    val nested = HtmlOps.parseHtml(
      """<a href="/out">one <a href="/in">two</a> three</a>""")
    assert(nested.links.map(_.anchor) ==
      Vector("one two three", "one two three"))
    // unterminated <a>: totality — label is whatever accumulated
    val cut = HtmlOps.parseHtml("""<a href="/u">dangling tex""")
    assert(cut.links.map(_.anchor) == Vector("dangling tex"))
    // block boundary inside an anchor keeps one label
    val blocky = HtmlOps.parseHtml("""<a href="/p"><p>x</p><p>y</p></a>""")
    assert(blocky.links.map(_.anchor) == Vector("x y"))
    // generator anchors are the planted constants
    val page = HtmlOps.parseHtml(HtmlOps.synthPage(10L, "ten words here"))
    assert(page.links.map(_.anchor) == Vector("Home", "Docs", "About",
      "read more about this", "also see that page", "Privacy", "Terms",
      "Cookie Policy", "Brand"))
  }

  test("crawl policy: robots tokens and rel=nofollow, attribute probes token-anchored") {
    // rel=nofollow marks the link; class="related" must NOT satisfy a
    // "rel" probe (token-anchored attribute scan)
    val p = HtmlOps.parseHtml(
      """<a class="related" href="/a">x</a>""" +
        """<a rel="nofollow" href="/b">y</a>""" +
        """<a rel="noopener NOFOLLOW" href="/c">z</a>""")
    assert(p.links.map(l => (l.href, l.nofollow)) ==
      Vector(("/a", false), ("/b", true), ("/c", true)))
    // robots meta is name-gated and token-exact; charset/viewport
    // metas and non-robots names never register
    val m = HtmlOps.parseHtml(
      """<meta charset="utf-8"><meta name="viewport" content="w">""" +
        """<meta name="robots" content="noindex, follow">""" +
        """<meta name="description" content="noindex">""")
    assert(m.robotsMeta == Vector("noindex, follow"))
    // token-exactness: nosnippet/index must not read as noindex
    def noindexOf(content: String) = content.toLowerCase
      .split(",").map(_.trim).contains("noindex")
    assert(noindexOf("noindex, follow") && noindexOf("NOINDEX"))
    assert(!noindexOf("nosnippet,index"))
    // generator: id 0 is noindex+nofollow, id 9 only nofollow, id 10 neither
    val p0 = HtmlOps.parseHtml(HtmlOps.synthPage(0L, "a b c"))
    assert(p0.robotsMeta.nonEmpty && p0.links.count(_.nofollow) == 1)
    val p9 = HtmlOps.parseHtml(HtmlOps.synthPage(9L, "a b c"))
    assert(p9.robotsMeta.isEmpty && p9.links.count(_.nofollow) == 1)
    val p10 = HtmlOps.parseHtml(HtmlOps.synthPage(10L, "a b c"))
    assert(p10.robotsMeta.isEmpty && p10.links.count(_.nofollow) == 0)
  }

  test("url resolution: absolute, rooted, relative, dot-segments, fragments") {
    val base = "https://example.com/docs/42"
    def r(h: String) = HtmlOps.resolveUrl(base, h)
    assert(r("https://other.org/x#y") == "https://other.org/x")
    assert(r("/rooted/path") == "https://example.com/rooted/path")
    assert(r("rel/page") == "https://example.com/docs/rel/page")
    assert(r("../up/one") == "https://example.com/up/one")
    assert(r("./same/dir") == "https://example.com/docs/same/dir")
    assert(r("../../../past/root") == "https://example.com/past/root")
    assert(r("#frag") == base)
    assert(r("a?q=1#frag") == "https://example.com/docs/a?q=1")
  }

  test("robots.txt: grouping, longest-match, wildcards, agent shadowing") {
    import HtmlOps.{parseRobots, robotsMatch, robotsVerdict}
    // pattern matcher: prefix, mid-run wildcard, end anchor
    assert(robotsMatch("/", "/anything"))
    assert(robotsMatch("/a/*/c", "/a/b/c") && robotsMatch("/a/*/c", "/a/x/y/cz"))
    assert(!robotsMatch("/a/*/c", "/a/b/d"))
    assert(robotsMatch("/*.json$", "/data.json") &&
      !robotsMatch("/*.json$", "/data.json5"))
    assert(robotsMatch("/tmp$", "/tmp") && !robotsMatch("/tmp$", "/tmp/z"))
    assert(!robotsMatch("/priv", "/x/priv")) // prefix, not substring
    // parse: comments, case-insensitive keys, consecutive UA lines
    // sharing one group, rules-before-any-group dropped
    val g = parseRobots(
      "Disallow: /orphan # no group yet — dropped\n" +
        "USER-AGENT: Alpha\nuser-agent: beta\n" +
        "DISALLOW: /x # comment\nAllow: /x/pub\nCrawl-Delay: 4\n" +
        "User-agent: *\nDisallow: /y\nDisallow:\n")
    assert(g.length == 2)
    assert(g(0).agents == Vector("alpha", "beta") && g(0).delay == 4)
    assert(g(0).rules == Vector(HtmlOps.RobotsRule(false, "/x"),
      HtmlOps.RobotsRule(true, "/x/pub")))
    assert(g(1).rules == Vector(HtmlOps.RobotsRule(false, "/y")),
      "empty Disallow must be dropped")
    // verdicts: longest match wins; allow wins a length tie; the
    // specific-agent group fully shadows * (including crawl-delay)
    assert(robotsVerdict(g, "BETA", "/x/pub/file") ==
      ((true, "/x/pub", 4)))
    assert(robotsVerdict(g, "beta", "/x/other") == ((false, "/x", 4)))
    assert(robotsVerdict(g, "other", "/y/z") == ((false, "/y", -1)))
    assert(robotsVerdict(g, "other", "/free") == ((true, "", -1)))
    val tie = parseRobots(
      "User-agent: *\nDisallow: /ab\nAllow: /ab\n")
    assert(robotsVerdict(tie, "bot", "/abc")._1,
      "allow must win an equal-length tie")
    // generator classes: blocked-bot domain, carve-back, json anchor
    val blocked = parseRobots(HtmlOps.synthRobots(15L))
    assert(robotsVerdict(blocked, "graftbot", "/page") == ((false, "/", -1)))
    assert(robotsVerdict(blocked, "otherbot", "/page") == ((true, "", 6)))
    val carve = parseRobots(HtmlOps.synthRobots(14L))
    assert(robotsVerdict(carve, "graftbot", "/private/public/y")._1)
    assert(!robotsVerdict(carve, "graftbot", "/data.json")._1)
    assert(robotsVerdict(carve, "graftbot", "/data.json5")._1)
  }

  test("utf8 structural scan: overlongs, surrogates, planes, truncation") {
    import HtmlOps.utf8Scan
    def bs(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // valid: ASCII, 2/3/4-byte sequences at the boundaries
    assert(utf8Scan("plain ascii".getBytes("UTF-8")).valid)
    assert(utf8Scan(bs(0xc2, 0x80)).valid)            // U+0080
    assert(utf8Scan(bs(0xe0, 0xa0, 0x80)).valid)      // U+0800
    assert(utf8Scan(bs(0xed, 0x9f, 0xbf)).valid)      // U+D7FF
    assert(utf8Scan(bs(0xf0, 0x90, 0x80, 0x80)).valid) // U+10000
    assert(utf8Scan(bs(0xf4, 0x8f, 0xbf, 0xbf)).valid) // U+10FFFF
    // invalid mid-stream: overlongs, surrogates, above-plane, strays
    assert(!utf8Scan(bs(0xc0, 0xaf)).valid)           // overlong '/'
    assert(!utf8Scan(bs(0xe0, 0x9f, 0xbf)).valid)     // overlong 3-byte
    assert(!utf8Scan(bs(0xf0, 0x8f, 0xbf, 0xbf)).valid) // overlong 4-byte
    assert(!utf8Scan(bs(0xed, 0xa0, 0x80)).valid)     // surrogate D800
    assert(!utf8Scan(bs(0xf4, 0x90, 0x80, 0x80)).valid) // > U+10FFFF
    assert(!utf8Scan(bs(0xf5, 0x80, 0x80, 0x80)).valid)
    assert(!utf8Scan(bs(0x80)).valid)                 // stray continuation
    assert(utf8Scan(bs(0xc0, 0xaf)).truncatedAt == -1)
    // truncation: ONLY defect is an incomplete final sequence
    val t2 = utf8Scan("ab".getBytes("UTF-8") ++ bs(0xc3))
    assert(!t2.valid && t2.truncatedAt == 2)
    val t3 = utf8Scan(bs(0xe0, 0xa0)) // half a 3-byte seq
    assert(!t3.valid && t3.truncatedAt == 0)
    // a bad continuation before the cut is corruption, not truncation
    assert(utf8Scan(bs(0xe0, 0x20)).truncatedAt == -1)
    // multibyte tally drives the double-encode probe
    assert(utf8Scan("café é".getBytes("UTF-8")).nMulti == 2)
  }

  test("charset detect+repair: all four classes, probes don't misfire") {
    import HtmlOps.{detectRepair, encBytes}
    // the four generator classes all repair to the same text
    val text = "plain words follow the accent"
    for (id <- 0L to 7L) {
      val (cls, rep) = detectRepair(encBytes(id, text))
      val want = Seq("utf8", "cp1252", "double_utf8",
        "truncated_utf8")((id % 4).toInt)
      assert(cls == want, s"id=$id")
      assert(rep == "café " + text, s"id=$id")
    }
    // plain ASCII must stay utf8 (zero multibyte → probe skipped)
    assert(detectRepair("no accents at all".getBytes("UTF-8"))._1 == "utf8")
    // a genuine UTF-8 accent must NOT read as double-encoded (its
    // 1252 re-encode is a bare 0xE9 — structurally invalid)
    assert(detectRepair("café".getBytes("UTF-8"))._1 == "utf8")
    // real double mojibake round-trips: Ã© on the wire → é repaired
    val wire = new String("é".getBytes("UTF-8"), "windows-1252")
      .getBytes("UTF-8")
    assert(detectRepair(wire) == (("double_utf8", "é")))
    // astral chars (outside 1252) never trip the probe
    assert(detectRepair("emoji 😀 tail".getBytes("UTF-8"))._1
      == "utf8")
  }

  test("q_html_extract composes with the factored qualityKeep gate") {
    val rows = HtmlOps.htmlExtract(spark, sfTiny).collect()
    val src = Tables.documents(spark, sfTiny)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty && rows.length == src.size)
    rows.foreach { r =>
      assert(r.getString(5) == src(r.getLong(0))) // extracted == original
      assert(r.getInt(1) == 8 && r.getInt(2) == 2 &&
        r.getInt(3) == 4 && r.getInt(4) == 2)
    }
  }

  test("crawl frontier == brute-force per-host schedule") {
    val docs = Tables.documents(spark, sfTiny)
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // brute force: re-emit every outlink through the same page walk
    val urls = docs.flatMap { case (id, src, _) =>
      Seq(s"https://$src.example.org/", s"https://$src.example.org/docs",
        s"https://$src.example.org/about", s"https://$src.example.org/r/1",
        s"https://$src.example.org/r/${id % 7}",
        s"https://$src.example.org/privacy", s"https://$src.example.org/terms",
        s"https://$src.example.org/docs/legal/cookies",
        "https://cdn.example.org/brand.png?v=2")
    }
    val byHost = urls.groupBy(u => u.drop("https://".length).takeWhile(_ != '/'))
    val rows = graft.ops.HtmlOps.crawlFrontier(spark, sfTiny).collect()
    assert(rows.length == byHost.size, "host shard count diverges")
    rows.foreach { r =>
      val host = r.getString(0)
      val hostUrls = byHost(host)
      val distinct = hostUrls.distinct
      val delay = 1L + host.length % 5
      assert(r.getLong(1) == distinct.length, s"$host n_urls")
      assert(r.getLong(2) == hostUrls.length, s"$host n_refs")
      assert(r.getLong(3) == delay, s"$host delay")
      assert(r.getLong(4) == (distinct.length - 1) * delay, s"$host makespan")
      // first fetch = most-referenced URL, lexicographic tiebreak
      val counts = hostUrls.groupBy(identity).view.mapValues(_.length).toMap
      val want = distinct.sortBy(u => (-counts(u), u)).head
      assert(r.getString(5) == want, s"$host first_fetch")
    }
  }

  test("warc codec: synth → parse round-trips records, bodies, and uris") {
    import graft.sources.WarcFiles
    val docs = Seq(
      (13L, "<html><body><p>alpha beta</p></body></html>"),
      (14L, "<html><body><p>gamma</p></body></html>"),
      (26L, "<html><body><p>delta</p></body></html>"))
      .map { case (id, h) => (id, h.getBytes("UTF-8")) }
    val warc = WarcFiles.synthWarc(7L, docs)
    val scan = WarcFiles.parseWarc(warc)
    assert(scan.clean && scan.trailing == 0)
    // 1 warcinfo + 3 requests + 3 responses + 2 revisits (13, 26)
    val byType = scan.records.groupBy(_.recType).view.mapValues(_.size).toMap
    assert(byType == Map("warcinfo" -> 1, "request" -> 3,
      "response" -> 3, "revisit" -> 2), s"got $byType")
    // response bodies recover the exact HTML through the HTTP split
    val resp = scan.records.filter(_.recType == "response")
    assert(resp.map(_.targetUri) ==
      docs.map { case (id, _) => s"https://example.org/doc/$id" })
    resp.zip(docs).foreach { case (r, (_, html)) =>
      val body = WarcFiles.httpBody(r.body)
      assert(body.exists(_.sameElements(html)), "HTTP body mismatch")
    }
    // a non-200 payload is rejected, not half-parsed
    assert(WarcFiles.httpBody(
      "HTTP/1.1 404 Not Found\r\n\r\nnope".getBytes("UTF-8")).isEmpty)
  }

  test("warc replay coordinates: [offset, offset+len) re-parses to the record") {
    import graft.sources.WarcFiles
    val docs = Seq((13L, "<p>alpha beta</p>"), (14L, "<p>gamma</p>"))
      .map { case (id, h) => (id, h.getBytes("UTF-8")) }
    val warc = WarcFiles.synthWarc(3L, docs)
    val scan = WarcFiles.parseWarc(warc)
    assert(scan.clean)
    // offsets tile the file exactly: contiguous, gap-free, full cover
    val sorted = scan.records.sortBy(_.offset)
    assert(sorted.head.offset == 0L)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.offset + a.recLen == b.offset)
      case _ =>
    }
    assert(sorted.last.offset + sorted.last.recLen == warc.length)
    // the CDX contract: a range-read of [offset, offset+recLen) parses
    // back to exactly that one record, byte-identical body
    scan.records.foreach { r =>
      val slice = java.util.Arrays.copyOfRange(warc,
        r.offset.toInt, (r.offset + r.recLen).toInt)
      val re = WarcFiles.parseWarc(slice)
      assert(re.clean && re.records.size == 1)
      assert(re.records.head.recType == r.recType)
      assert(re.records.head.targetUri == r.targetUri)
      assert(re.records.head.body.sameElements(r.body))
    }
  }

  test("warc record walk: total and monotone on every prefix") {
    import graft.sources.WarcFiles
    val docs = Seq((0L, "<p>a</p>"), (5L, "<p>bb</p>"))
      .map { case (id, h) => (id, h.getBytes("UTF-8")) }
    val full = WarcFiles.synthWarc(0L, docs)
    var prev = 0
    (0 to full.length).foreach { n =>
      val scan = WarcFiles.parseWarc(java.util.Arrays.copyOf(full, n))
      // never throws (reaching here), never loses a previously
      // complete record, and consumed + trailing == n always
      assert(scan.records.size >= prev || scan.records.size == prev,
        s"prefix $n lost records")
      prev = math.max(prev, scan.records.size)
      assert(scan.trailing >= 0 && scan.trailing <= n)
      if (n < full.length) assert(!scan.clean || scan.trailing == 0)
    }
    val whole = WarcFiles.parseWarc(full)
    assert(whole.clean && whole.records.size == 6) // info + 2×(req+resp) + rev-0
    // corrupt Content-Length: walk stops cleanly at the bad record
    val corrupt = full.clone()
    val cl = new String(full, "UTF-8").indexOf("Content-Length: ")
    corrupt(cl + 16) = 'x'.toByte
    val cs = WarcFiles.parseWarc(corrupt)
    assert(!cs.clean && cs.records.isEmpty && cs.trailing == corrupt.length)
  }

  test("tar codec: roundtrip, block arithmetic, checksum triage") {
    import graft.sources.TarFiles
    // sizes straddle the padding corners: 0, <512, exactly 512, >512
    val docs = Seq((1L, "x" * 100), (17L, "y" * 512), (18L, ""),
      (40L, "z" * 513)).map { case (id, t) => (id, t.getBytes("UTF-8")) }
    val tar = TarFiles.synthTar(docs)
    // closed-form size: dir hdr + Σ(hdr + padded payload) + end marker
    val expectBytes = 512 +
      docs.map { case (_, b) => 512 + 512 * ((b.length + 511) / 512) }.sum +
      1024
    assert(tar.length == expectBytes, s"${tar.length} != $expectBytes")
    val scan = TarFiles.parseTar(tar)
    assert(scan.clean && scan.trailing == 0)
    assert(scan.members.map(_.name) ==
      Vector("docs/") ++ docs.map { case (id, _) => s"docs/doc_$id.txt" })
    assert(scan.members.map(_.typeflag) == Vector('5', '0', '0', '0', '0'))
    assert(scan.members.drop(1).map(_.size) ==
      docs.map(_._2.length.toLong))
    // exactly doc 17's member carries the broken checksum; the walk
    // still recovers every member after it
    assert(scan.members.filterNot(_.checksumOk).map(_.name) ==
      Vector("docs/doc_17.txt"))
  }

  test("tar member walk: total and monotone on every prefix") {
    import graft.sources.TarFiles
    val docs = Seq((2L, "aa"), (3L, "b" * 600))
      .map { case (id, t) => (id, t.getBytes("UTF-8")) }
    val full = TarFiles.synthTar(docs)
    var prev = 0
    (0 to full.length).foreach { n =>
      val scan = TarFiles.parseTar(java.util.Arrays.copyOf(full, n))
      assert(scan.members.size >= prev, s"prefix $n lost members")
      prev = math.max(prev, scan.members.size)
      assert(scan.trailing >= 0 && scan.trailing <= n)
      if (n < full.length) assert(!scan.clean)
    }
    // malformed size field: walk stops cleanly at the bad header,
    // keeping everything before it
    val corrupt = full.clone()
    corrupt(512 + 124) = 'x'.toByte // second header's size field
    val cs = TarFiles.parseTar(corrupt)
    assert(!cs.clean && cs.members.map(_.name) == Vector("docs/") &&
      cs.trailing == corrupt.length - 512)
  }

  test("zip codec: roundtrip, byte arithmetic, crc triage") {
    import graft.sources.ZipFiles
    val docs = Seq((1L, "x" * 100), (17L, "y" * 512), (18L, ""),
      (40L, "z" * 513)).map { case (id, t) => (id, t.getBytes("UTF-8")) }
    val zip = ZipFiles.synthZip(docs)
    // closed form: Σ(local 30 + name + payload) + Σ(cd 46 + name) + EOCD 22
    val expectBytes = docs.map { case (id, b) =>
      76 + 2 * s"docs/doc_$id.txt".length + b.length
    }.sum + 22
    assert(zip.length == expectBytes, s"${zip.length} != $expectBytes")
    val scan = ZipFiles.parseZip(zip)
    assert(scan.clean && scan.declared == docs.length.toLong)
    assert(scan.entries.map(_.name) ==
      docs.map { case (id, _) => s"docs/doc_$id.txt" }.toVector)
    assert(scan.entries.map(_.size) == docs.map(_._2.length.toLong).toVector)
    assert(scan.entries.forall(_.localOk))
    // exactly doc 17 carries the flipped CRC; the walk keeps going —
    // and the clean members prove the hand-rolled CRC table against
    // the generator's java.util.zip.CRC32
    assert(scan.entries.filterNot(_.crcOk).map(_.name) ==
      Vector("docs/doc_17.txt"))
  }

  test("zip walk: total on every prefix, triage on corruption") {
    import graft.sources.ZipFiles
    val docs = Seq((2L, "aa"), (3L, "b" * 600))
      .map { case (id, t) => (id, t.getBytes("UTF-8")) }
    val full = ZipFiles.synthZip(docs)
    (0 to full.length).foreach { n =>
      val scan = ZipFiles.parseZip(java.util.Arrays.copyOf(full, n))
      // a prefix can never be clean: EOCD's comment-length rule pins
      // the record to exact end-of-input, so truncation loses it
      if (n < full.length) assert(!scan.clean, s"prefix $n claimed clean")
      assert(scan.entries.size <= docs.length)
    }
    // flip one payload byte: that member's CRC fails, walk continues
    val corrupt = full.clone()
    corrupt(30 + "docs/doc_2.txt".length) = 'X'.toByte
    val cs = ZipFiles.parseZip(corrupt)
    assert(cs.clean) // structure intact — only the checksum is wrong
    assert(cs.entries.map(_.crcOk) == Vector(false, true))
    // break a directory signature: walk stops, keeping prior entries
    val cdStart = full.length - 22 - 2 * (46 + "docs/doc_2.txt".length)
    val bad = full.clone()
    bad(cdStart + 46 + "docs/doc_2.txt".length) = 0 // 2nd cd entry sig
    val bs = ZipFiles.parseZip(bad)
    assert(!bs.clean && bs.entries.size == 1)
  }

  test("tfrecord codec: framing arithmetic, crc32c cross-check, proto skip") {
    import graft.sources.TfRecordFiles
    // ids straddle the varint width corner (127/128) and hit both the
    // 17-stride crc break and the 7-stride unknown field
    val docs = Seq((7L, "a" * 127), (17L, "b" * 128), (127L, ""),
      (128L, "c" * 300)).map { case (id, t) => (id, t.getBytes("UTF-8")) }
    val shard = TfRecordFiles.synthTfRecords(docs)
    def vlen(v: Long): Int = if (v < 128) 1 else if (v < 16384) 2 else 3
    val expectBytes = docs.map { case (id, b) =>
      16 + 2 + vlen(id) + vlen(b.length.toLong) + b.length +
        (if (id % 7 == 0) 9 else 0)
    }.sum
    assert(shard.length == expectBytes, s"${shard.length} != $expectBytes")
    val scan = TfRecordFiles.parseTfRecords(shard)
    assert(scan.clean && scan.trailing == 0)
    // every record's proto decodes despite the unknown fixed64 field,
    // and every CLEAN record's hand-rolled crc32c matches the
    // generator's java.util.zip.CRC32C
    assert(scan.records.forall(_.protoOk))
    assert(scan.records.map(_.docId) == docs.map(_._1).toVector)
    assert(scan.records.map(_.textLen) ==
      docs.map(_._2.length.toLong).toVector)
    assert(scan.records.filterNot(_.crcOk).map(_.docId) == Vector(17L))
  }

  test("tfrecord walk: total on every prefix, length-crc kills framing") {
    import graft.sources.TfRecordFiles
    val docs = Seq((2L, "aa"), (3L, "b" * 200))
      .map { case (id, t) => (id, t.getBytes("UTF-8")) }
    val full = TfRecordFiles.synthTfRecords(docs)
    // TFRecord is pure concatenation with no end marker, so a prefix
    // cut exactly at a record boundary IS a valid (shorter) shard —
    // unlike tar/zip. Everything else must be unclean.
    val boundaries = docs.map { case (id, b) =>
      16 + 2 + (if (id < 128) 1 else 2) +
        (if (b.length < 128) 1 else 2) + b.length +
        (if (id % 7 == 0) 9 else 0)
    }.scanLeft(0)(_ + _).toSet
    (0 to full.length).foreach { n =>
      val scan =
        TfRecordFiles.parseTfRecords(java.util.Arrays.copyOf(full, n))
      assert(scan.clean == boundaries.contains(n),
        s"prefix $n clean=${scan.clean}")
      assert(scan.trailing >= 0 && scan.trailing <= n)
    }
    // flip a byte in the FIRST record's length field: the length crc
    // fails and the walk must stop immediately — untrusted framing
    val corrupt = full.clone()
    corrupt(0) = (corrupt(0) ^ 0x01).toByte
    val cs = TfRecordFiles.parseTfRecords(corrupt)
    assert(!cs.clean && cs.records.isEmpty && cs.trailing == corrupt.length)
  }

  test("avro codec: block walk, zigzag grammar, count-bug triage") {
    import graft.sources.AvroFiles
    // 13 docs ⇒ two blocks (10 + 3); first block's head id 17 plants
    // the declared-count bug; ids/lengths straddle the zigzag corner
    // (63/64 ⇒ 1/2 bytes)
    val docs = (Seq((17L, "x" * 63), (18L, "y" * 64), (63L, ""),
      (64L, "z" * 100)) ++ (70L to 78L).map(i => (i, "a" * i.toInt)))
      .map { case (id, t) => (id, t.getBytes("UTF-8")) }
    val ocf = AvroFiles.synthAvro(3L, docs)
    def zl(v: Long): Int = if (v < 64) 1 else if (v < 8192) 2 else 3
    val header = 4 + 1 + (1 + 10) + (1 + 4) + (1 + 11) +
      (zl(AvroFiles.SchemaJson.length.toLong) +
        AvroFiles.SchemaJson.length) + 1 + 16
    val blockBytes = docs.grouped(10).map { blk =>
      val s = blk.map { case (id, b) => zl(id) + zl(b.length.toLong) +
        b.length }.sum
      1 + zl(s.toLong) + s + 16
    }.sum
    assert(ocf.length == header + blockBytes,
      s"${ocf.length} != ${header + blockBytes}")
    val scan = AvroFiles.parseAvro(3L, ocf)
    assert(scan.clean && scan.codec == "null")
    assert(scan.blocks.size == 2)
    // the bugged block: 11 declared, 10 decoded, data intact
    assert(scan.blocks.map(_.declared) == Vector(11L, 3L))
    assert(scan.blocks.map(_.decoded) == Vector(10L, 3L))
    assert(scan.blocks.map(_.countOk) == Vector(false, true))
    assert(scan.blocks.map(_.idSum).sum == docs.map(_._1).sum)
    assert(scan.blocks.map(_.textBytes).sum ==
      docs.map(_._2.length.toLong).sum)
    // wrong sync (different file id) refuses the whole file
    assert(!AvroFiles.parseAvro(4L, ocf).clean)
  }

  test("avro walk: total on every prefix, sync kills framing") {
    import graft.sources.AvroFiles
    val docs = Seq((2L, "aa"), (3L, "b" * 70))
      .map { case (id, t) => (id, t.getBytes("UTF-8")) }
    val full = AvroFiles.synthAvro(0L, docs)
    // blocks repeat until EOF with no terminator, so a prefix cut at
    // the header end or after a block's sync IS a valid shorter file;
    // every other cut must be unclean
    def zl(v: Long): Int = if (v < 64) 1 else if (v < 8192) 2 else 3
    val header = 4 + 1 + (1 + 10) + (1 + 4) + (1 + 11) +
      (zl(AvroFiles.SchemaJson.length.toLong) +
        AvroFiles.SchemaJson.length) + 1 + 16
    val s = docs.map { case (id, b) =>
      zl(id) + zl(b.length.toLong) + b.length }.sum
    val boundaries = Set(header, header + 1 + zl(s.toLong) + s + 16)
    (0 to full.length).foreach { n =>
      val scan = AvroFiles.parseAvro(0L, java.util.Arrays.copyOf(full, n))
      assert(scan.clean == boundaries.contains(n),
        s"prefix $n clean=${scan.clean}")
    }
    // flip a byte in the block's trailing sync: walk stops, unclean,
    // but the block's decoded data is kept
    val corrupt = full.clone()
    corrupt(full.length - 1) = (corrupt(full.length - 1) ^ 0x7f).toByte
    val cs = AvroFiles.parseAvro(0L, corrupt)
    assert(!cs.clean && cs.blocks.size == 1 && cs.blocks.head.decoded == 2L)
  }

  test("gzip codec: member walk, FLG grammar, crc triage") {
    import graft.sources.GzipFiles
    // ids hit every FLG stride: 5 (FEXTRA), 11 (FCOMMENT), 13 (FHCRC),
    // 17 (broken trailer crc), and a plain one; bodies include empty
    // and >8KB (multiple inflate buffers)
    val docs = Seq((5L, "x" * 100), (11L, ""), (13L, "y" * 9000),
      (17L, "z" * 50), (19L, "w")).map { case (id, t) =>
      (id, t.getBytes("UTF-8"))
    }
    val gz = GzipFiles.synthGzip(docs)
    val scan = GzipFiles.parseGzip(gz)
    assert(scan.clean && scan.trailing == 0)
    assert(scan.members.map(_.name) ==
      docs.map { case (id, _) => s"doc_$id.txt" }.toVector)
    assert(scan.members.map(_.rawLen) == docs.map(_._2.length.toLong))
    assert(scan.members.forall(_.isizeOk))
    // exactly doc 17's trailer crc fails; the walk re-aligns and keeps
    // every member after it
    assert(scan.members.filterNot(_.crcOk).map(_.name) ==
      Vector("doc_17.txt"))
    // a parse with a flipped FHCRC byte must refuse the member stream
    // at doc 13's header (hand-rolled header crc catches it)
    val hdrCrcPos = {
      // locate member 13's FHCRC: walk two clean members then its header
      val idx = gz.indexOfSlice("doc_13.txt".getBytes("UTF-8"))
      idx + "doc_13.txt".length + 1 // FNAME NUL, FHCRC next (no comment)
    }
    val bad = gz.clone()
    bad(hdrCrcPos) = (bad(hdrCrcPos) ^ 0x55).toByte
    val bs = GzipFiles.parseGzip(bad)
    assert(!bs.clean && bs.members.size == 2)
  }

  test("gzip walk: total on every prefix") {
    import graft.sources.GzipFiles
    val docs = Seq((2L, "aa"), (13L, "b" * 300))
      .map { case (id, t) => (id, t.getBytes("UTF-8")) }
    val full = GzipFiles.synthGzip(docs)
    var cleanCount = 0
    (0 to full.length).foreach { n =>
      val scan = GzipFiles.parseGzip(java.util.Arrays.copyOf(full, n))
      if (scan.clean) cleanCount += 1
      assert(scan.members.size <= 2)
      assert(scan.trailing >= 0 && scan.trailing <= n)
    }
    // clean only at member boundaries: empty, after member 1, full
    assert(cleanCount == 3)
  }

  test("zstd codec: frame grammar, fcs encodings, skippable + triage") {
    import graft.sources.ZstdFiles
    // lengths straddle the FCS width corner (255/256 with and without
    // the 17-stride bias) and the block split (0, 100, 201)
    val docs = Seq((5L, "s" * 255), (17L, "t" * 255), (18L, ""),
      (20L, "u" * 100), (34L, "v" * 201), (40L, "w" * 256))
      .map { case (id, t) => (id, t.getBytes("UTF-8")) }
    val z = ZstdFiles.synthZstd(docs)
    def blocks(n: Int) = math.max(1, (n + 99) / 100)
    val expect = docs.map { case (id, b) =>
      (if (id % 5 == 0) 12 else 0) + 5 +
        (if (b.length + (if (id % 17 == 0) 1 else 0) < 256) 1 else 2) +
        3 * blocks(b.length) + b.length
    }.sum
    assert(z.length == expect, s"${z.length} != $expect")
    val scan = ZstdFiles.parseZstd(z)
    assert(scan.clean && scan.trailing == 0)
    assert(scan.frames.size == docs.size && scan.skippable == 3L)
    assert(scan.frames.map(_.decoded) == docs.map(_._2.length.toLong))
    assert(scan.frames.map(_.nBlocks) ==
      docs.map(d => blocks(d._2.length).toLong))
    // the 17-stride frames lie about content size; data still decodes
    assert(scan.frames.map(_.fcsOk) ==
      Vector(true, false, true, true, false, true))
    // prefix totality
    (0 to z.length).foreach { n =>
      ZstdFiles.parseZstd(java.util.Arrays.copyOf(z, n))
    }
    // unknown magic stops the walk cleanly, keeping prior frames
    val bad = z.clone()
    bad(12 + 5 + 2 + 3 * 3 + 255) = 0x77 // second frame's magic byte 0
    val bs = ZstdFiles.parseZstd(bad)
    assert(!bs.clean && bs.frames.size == 1)
  }

  test("sitemap codec: roundtrip, entity decode, unknown-tag skip") {
    // ids hit the &-query stride (3), the changefreq stride (17), and
    // both lastmod-day digits
    val ids = Seq(3L, 17L, 28L, 40L)
    val xml = HtmlOps.synthSitemap("srcX", ids)
    val got = HtmlOps.parseSitemap(xml)
    assert(got.size == 4)
    assert(got.map(_._1) == Vector(
      "https://srcX.example.org/doc/3?a=1&b=2", // &amp; decoded
      "https://srcX.example.org/doc/17",
      "https://srcX.example.org/doc/28",
      "https://srcX.example.org/doc/40"))
    assert(got.map(_._2) == ids.map(i => f"2024-01-${1 + i % 28}%02d"))
    assert(got.map(_._3) == ids.map(i => s"0.${i % 10}"))
    // truncation mid-entry: clean stop keeping complete entries
    val cut = xml.substring(0, xml.indexOf("</url>", xml.indexOf("<url>",
      xml.indexOf("</url>") + 1)) + 3)
    assert(HtmlOps.parseSitemap(cut).size == 1)
  }

  test("crawl funnel: ledger coherence across the composed stages") {
    val row = HtmlOps.crawlFunnel(spark, sfTiny).collect().head
    def L(c: String) = row.getLong(row.fieldIndex(c))
    // container walk consumed every file cleanly
    assert(L("n_clean_files") == L("n_files") && L("n_files") > 0)
    // every response lands in exactly one encoding class
    assert(L("n_enc_utf8") + L("n_enc_cp1252") + L("n_enc_double") +
      L("n_enc_truncated") == L("n_responses"))
    // funnel is monotone and the final arithmetic closes
    assert(L("n_quality_keep") <= L("n_responses") - L("n_eval"))
    assert(L("n_dedup_keep") <= L("n_quality_keep"))
    assert(L("n_train_ready") == L("n_dedup_keep") - L("n_decontam_drop"))
    // each gate must WITNESS something at fixture scale — a stage
    // dropping nothing would pass the hash even if its join broke
    assert(L("n_quality_keep") < L("n_responses") - L("n_eval"),
      "quality gate dropped nothing")
    assert(L("n_dedup_keep") < L("n_quality_keep"),
      "dedup keeper dropped nothing")
    assert(L("n_decontam_drop") > 0, "decontamination witnessed nothing")
    assert(L("train_tokens") > 0)
    spark.catalog.clearCache()
  }

  test("canonicalUrl: every RFC 3986 rule, totality, and idempotence") {
    import graft.ops.HtmlOps.canonicalUrl
    val cases = Seq(
      // case + default port
      "HTTPS://Site.Example:443/a" -> "https://site.example/a",
      "http://HOST.example:80/x" -> "http://host.example/x",
      // non-default port kept
      "https://site.example:8443/a" -> "https://site.example:8443/a",
      // dot segments, incl. over-popping past root
      "https://s.example/a/./b/../c" -> "https://s.example/a/c",
      "https://s.example/../../x" -> "https://s.example/x",
      // empty path
      "https://s.example" -> "https://s.example/",
      "https://s.example?a=1" -> "https://s.example/?a=1",
      // fragment off, empty query off
      "https://s.example/a#frag" -> "https://s.example/a",
      "https://s.example/a?" -> "https://s.example/a",
      // percent-decoding: unreserved decoded, reserved kept UPPERCASED
      "https://s.example/p%61th/%41%2fB" -> "https://s.example/path/A%2FB",
      // malformed escapes pass through (totality, not an exception)
      "https://s.example/a%zz%4" -> "https://s.example/a%zz%4",
      // tracking strip + param sort (key then value within dups)
      "https://s.example/a?utm_source=x&b=2&a=9&a=10" ->
        "https://s.example/a?a=10&a=9&b=2",
      "https://s.example/a?gclid=1&fbclid=2&utm_term=t" ->
        "https://s.example/a",
      // scheme-less strings untouched
      "not a url at all" -> "not a url at all",
      "mailto:x@example.com" -> "mailto:x@example.com")
    cases.foreach { case (in, want) =>
      assert(canonicalUrl(in) == want, s"canonicalUrl($in)")
      // idempotence: canonical form is a fixed point
      assert(canonicalUrl(want) == want, s"not a fixed point: $want")
    }
  }
  test("xml codec: roundtrip censuses, entity decode, CDATA suppression") {
    import graft.sources.XmlFiles
    val docs = Seq((3L, "alpha beta"), (4L, "gamma"), (5L, "delta eps"),
      (12L, "zeta"), (17L, "eta theta"))
    val xml = XmlFiles.synthXml("src_a", docs)
    val scan = XmlFiles.parseXml(xml)
    assert(scan.clean)
    assert(scan.items.size == 5)
    // id attribute and the char-ref-decoded title agree on every item
    scan.items.zip(docs.sortBy(_._1)).foreach { case (it, (id, t)) =>
      assert(it.idAttr == id && it.titleId == id, s"id mismatch at $id")
      assert(it.bodyLen == t.length.toLong, s"body len at $id")
    }
    // censuses: feed + per-item (item,title,body) + meta on %4 + em/strong on %3
    val e = 1 + docs.map { case (id, _) =>
      3 + (if (id % 4 == 0) 1 else 0) + (if (id % 3 == 0) 2 else 0) }.sum
    assert(scan.nElem == e.toLong)
    assert(scan.maxDepth == 5L) // id=3/12 carry em>strong under body
    assert(scan.nCdata == docs.count(_._1 % 5 == 0).toLong)
    assert(scan.nSelfClose == docs.count(_._1 % 4 == 0).toLong)
    assert(scan.nAttr == (1 + docs.map { case (id, _) =>
      2 + (if (id % 4 == 0) 1 else 0) }.sum).toLong)
    // entities: one per id digit + the flag amp, NOTHING from CDATA
    assert(scan.nEnt == docs.map { case (id, _) =>
      id.toString.length + 1 }.sum.toLong)
    // a CDATA body containing entity syntax must NOT decode it
    val cd = XmlFiles.parseXml(XmlFiles.synthXml("s",
      Seq((10L, "a &amp; b"))))
    assert(cd.clean && cd.items.head.bodyLen == "a &amp; b".length.toLong)
    val esc = XmlFiles.parseXml(XmlFiles.synthXml("s",
      Seq((11L, "a & b"))))
    assert(esc.clean && esc.items.head.bodyLen == "a & b".length.toLong)
  }

  test("xml parse: total on every prefix, damage flips clean") {
    import graft.sources.XmlFiles
    val full = XmlFiles.synthXml("s", Seq((3L, "aa bb"), (20L, "cc")))
    (0 to full.length).foreach { n =>
      val scan = XmlFiles.parseXml(java.util.Arrays.copyOf(full, n))
      // never throws (reaching here); a strict prefix with any open
      // construct cannot be clean with a non-empty stack
      if (n == full.length) assert(scan.clean)
    }
    assert(!XmlFiles.parseXml(
      new String(full, "UTF-8").replace("</feed>", "</fee>")
        .getBytes("UTF-8")).clean)
    assert(!XmlFiles.parseXml(
      new String(full, "UTF-8").replace("&amp;", "&nosuch;")
        .getBytes("UTF-8")).clean)
  }
}
