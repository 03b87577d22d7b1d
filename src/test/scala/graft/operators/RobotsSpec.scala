package graft.operators

import graft.SparkTestBase

/** RFC 9309 robots.txt evaluation: group selection, pattern grammar
  * (* and $ with greedy anchoring), longest-match precedence, and the
  * protocol's permissive defaults. */
class RobotsSpec extends SparkTestBase {

  private val txt =
    """# a comment line
      |User-agent: googlebot
      |Disallow: /g-only
      |
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |Crawl-delay: 10
      |Disallow: /tmp
      |Sitemap: https://example.com/sitemap.xml
      |
      |User-agent: badbot
      |User-agent: otherbot
      |Disallow: /
      |""".stripMargin

  test("group selection: exact agent beats *, consecutive User-agent " +
    "lines share a group, unknown agents fall back to *") {
    assert(!Robots.allowed(txt, "/g-only/x", "GoogleBot")) // exact group
    assert(Robots.allowed(txt, "/private/x", "googlebot")) // * ignored
    assert(!Robots.allowed(txt, "/private/x", "somebot"))  // * applies
    assert(!Robots.allowed(txt, "/anything", "badbot"))    // shared group
    assert(!Robots.allowed(txt, "/anything", "otherbot"))
  }

  test("longest pattern wins; an equal-length tie resolves to Allow; " +
    "no match allows") {
    assert(!Robots.allowed(txt, "/private/x"))
    assert(Robots.allowed(txt, "/private/ok/deep"))
    assert(!Robots.allowed(txt, "/tmp/z"))
    assert(Robots.allowed(txt, "/public"))
    val tie = "User-agent: *\nDisallow: /same\nAllow: /same\n"
    assert(Robots.allowed(tie, "/same/x"))
  }

  test("pattern grammar: * spans octets, $ anchors, the anchored form " +
    "is greedy (a first-occurrence scan would fail)") {
    assert(Robots.patternMatches("/a*b", "/axxb"))
    assert(Robots.patternMatches("/a*b", "/axxbyy")) // unanchored
    assert(!Robots.patternMatches("/a*b$", "/axxbyy"))
    assert(Robots.patternMatches("/a*b$", "/axbxb")) // greedy anchor
    assert(Robots.patternMatches("/*.php$", "/x/y.php"))
    assert(!Robots.patternMatches("/*.php$", "/x/y.phpx"))
    assert(Robots.patternMatches("/a*", "/a/anything"))
    assert(Robots.patternMatches("/a*$", "/a/anything")) // *$ == *
    assert(Robots.patternMatches("/a**b", "/axb"))       // doubled *
    assert(!Robots.patternMatches("a*a$", "a"))          // overlap guard
    val wc = "User-agent: *\nDisallow: /*.gif$\nAllow: /img\n"
    assert(!Robots.allowed(wc, "/img/x.gif"))  // longer match: 7 > 4
    assert(Robots.allowed(wc, "/img/x.gifs"))  // $ fails, /img allows
  }

  test("permissive defaults: empty Disallow is a no-op, missing file/" +
    "null/junk allows, directives are case-insensitive") {
    assert(Robots.allowed("User-agent: *\nDisallow:\n", "/anything"))
    assert(Robots.allowed(null, "/x"))
    assert(Robots.allowed("", "/x"))
    assert(Robots.allowed("complete junk\nno colons here", "/x"))
    assert(!Robots.allowed("USER-AGENT: *\nDISALLOW: /x\n", "/x/y"))
  }

  test("the SQL surface agrees with the kernel on the fixture shapes") {
    graft.Graft.init(spark)
    val rows = spark.range(0, 35).selectExpr(
        "id",
        "concat('User-agent: *', chr(10), 'Disallow: /private', " +
          "chr(10), 'Allow: /private/ok') AS robots",
        "CASE CAST(id % 3 AS INT) WHEN 0 THEN '/private/x' " +
          "WHEN 1 THEN '/private/ok/y' ELSE '/pub' END AS path")
      .selectExpr("id", "path", "robots_allowed(robots, path) AS a")
      .collect()
    rows.foreach { r =>
      val expected = (r.getLong(0) % 3) != 0
      assert(r.getBoolean(2) == expected, r.toString)
    }
  }
}
