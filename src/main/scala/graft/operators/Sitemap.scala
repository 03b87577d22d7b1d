package graft.operators

/** Sitemap XML extraction (sitemaps.org protocol) — the discovery
  * half of crawl governance: robots.txt says what MAY be fetched,
  * the sitemap says what EXISTS. Both `<urlset>` (leaf sitemaps,
  * `<url>` entries) and `<sitemapindex>` (`<sitemap>` entries
  * pointing at child sitemaps) parse to (loc, lastmod, priority)
  * rows.
  *
  * The parser is a structural tag scanner for exactly this schema —
  * entry blocks delimited by their element tags, child elements
  * located inside each block only (a `<loc>` outside an entry is a
  * protocol violation and fails the file), XML entities decoded in
  * the fixed double-escape-safe order ([[graft.functions]]'
  * html_text discipline), CDATA honored. Dirty input → None. */
object Sitemap {

  final case class Entry(loc: String, lastmod: String, priority: Double)

  final case class Parsed(isIndex: Boolean, entries: Vector[Entry])

  private val MaxEntries = 65536

  def parse(raw: String): Option[Parsed] = {
    try {
      if (raw == null) return None
      val s = raw.trim
      val (container, entryTag) =
        if (s.contains("<urlset")) ("urlset", "url")
        else if (s.contains("<sitemapindex")) ("sitemapindex", "sitemap")
        else return None
      val bodyStart = s.indexOf('>', s.indexOf("<" + container))
      val bodyEnd = s.lastIndexOf("</" + container + ">")
      if (bodyStart < 0 || bodyEnd < bodyStart) return None
      val body = s.substring(bodyStart + 1, bodyEnd)
      val entries = Vector.newBuilder[Entry]
      var at = 0
      var n = 0
      var going = true
      while (going) {
        val open = body.indexOf("<" + entryTag + ">", at)
        if (open < 0) {
          // no further entries; any stray <loc> outside one is a
          // protocol violation
          if (body.indexOf("<loc>", at) >= 0) return None
          going = false
        } else {
          val close = body.indexOf("</" + entryTag + ">", open)
          if (close < 0) return None
          val block = body.substring(open + entryTag.length + 2, close)
          val loc = child(block, "loc").getOrElse(return None)
          if (loc.isEmpty) return None
          val lastmod = child(block, "lastmod").getOrElse("")
          val priority = child(block, "priority") match {
            case Some(p) => p.toDouble
            case None => 0.5 // the protocol's documented default
          }
          entries += Entry(loc, lastmod, priority)
          at = close + entryTag.length + 3
          n += 1
          if (n > MaxEntries) return None
        }
      }
      val v = entries.result()
      if (v.isEmpty) None else Some(Parsed(container == "sitemapindex", v))
    } catch { case _: Exception => None }
  }

  /** One child element's decoded text inside an entry block. */
  private def child(block: String, tag: String): Option[String] = {
    val open = block.indexOf("<" + tag + ">")
    if (open < 0) return None
    val close = block.indexOf("</" + tag + ">", open)
    if (close < 0) throw new IllegalArgumentException
    var v = block.substring(open + tag.length + 2, close).trim
    if (v.startsWith("<![CDATA[") && v.endsWith("]]>"))
      v = v.substring(9, v.length - 3)
    else
      // fixed order, &amp; LAST — the double-escape-safe discipline
      v = v.replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&apos;", "'")
        .replace("&amp;", "&")
    Some(v)
  }

  // ---------------------------------------------------------------- writer

  def urlset(entries: Seq[(String, String, Double)]): String = {
    val body = entries.map { case (loc, lastmod, prio) =>
      val lm = if (lastmod.isEmpty) "" else s"<lastmod>$lastmod</lastmod>"
      val escaped = loc.replace("&", "&amp;")
      s"<url><loc>$escaped</loc>$lm<priority>$prio</priority></url>"
    }.mkString("\n")
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      body + "\n</urlset>\n"
  }

  def index(locs: Seq[String]): String = {
    val body = locs.map(l =>
      s"<sitemap><loc>${l.replace("&", "&amp;")}</loc></sitemap>")
      .mkString("\n")
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
      body + "\n</sitemapindex>\n"
  }
}
