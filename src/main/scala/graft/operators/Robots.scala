package graft.operators

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) —
  * the governance step of every crawl pipeline: before a URL is
  * fetched (or kept, when re-filtering a crawl dump), the site's
  * robots.txt decides. This is the real REP matching algorithm:
  *
  *  - groups: consecutive `User-agent:` lines share the rules that
  *    follow; the group for the MOST SPECIFIC matching agent applies
  *    (exact product token beats `*`); multiple groups for the same
  *    agent merge, per the RFC;
  *  - rules: `Allow:` / `Disallow:` path patterns with `*` wildcards
  *    and the `$` end anchor;
  *  - decision: the longest-pattern match wins (octet length of the
  *    pattern, not the matched span); an Allow/Disallow tie at the
  *    same length resolves to Allow; no match → allowed; an empty
  *    Disallow value is a no-op rule.
  *
  * Unknown directives (Crawl-delay, Sitemap, comments) are skipped,
  * as the RFC requires. Parsing never throws — a robots.txt is
  * attacker-supplied text by definition. */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** Rules for `agent` (case-insensitive product token): the exact
    * group if present, else the `*` group, else no rules. */
  def rulesFor(robotsTxt: String, agent: String): Vector[Rule] = {
    if (robotsTxt == null) return Vector.empty
    val want = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = Vector.newBuilder[Rule]
    val star = Vector.newBuilder[Rule]
    var hasExact = false
    // group state: which agents the current rule block applies to
    var curExact = false
    var curStar = false
    var inAgentRun = false // consecutive User-agent lines extend the group
    robotsTxt.linesIterator.foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw
        case i => raw.substring(0, i)
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) { curExact = false; curStar = false }
            inAgentRun = true
            val v = value.toLowerCase(java.util.Locale.ROOT)
            if (v == want) { curExact = true; hasExact = true }
            else if (v == "*") curStar = true
          case "allow" | "disallow" =>
            inAgentRun = false
            if (value.nonEmpty) { // empty Disallow = no rule
              val rule = Rule(key == "allow", value)
              if (curExact) exact += rule
              if (curStar) star += rule
            }
          case _ => inAgentRun = false // Crawl-delay, Sitemap, ...
        }
      }
    }
    if (hasExact) exact.result() else star.result()
  }

  /** REP pattern match: `*` spans any octets, a trailing `$` anchors
    * the end, everything else is literal. The anchored form matches
    * the LAST literal against the path suffix (greedy semantics — a
    * first-occurrence scan would miss `/a*b$` on `/axbxb`). */
  def patternMatches(pattern: String, path: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val parts = pat.split("\\*", -1) // -1 keeps trailing empties
    if (parts.length == 1)
      return if (anchored) path == pat else path.startsWith(pat)
    if (!path.startsWith(parts(0))) return false
    val last = parts(parts.length - 1)
    // anchored: the final literal must sit at the very end, and the
    // middle literals must all fit before it
    val endLimit =
      if (anchored) {
        if (!path.endsWith(last)) return false
        path.length - last.length
      } else path.length
    var at = parts(0).length
    val middleEnd = if (anchored) parts.length - 1 else parts.length
    var i = 1
    while (i < middleEnd) {
      val p = parts(i)
      if (p.nonEmpty) { // empty = doubled '**', matches in place
        val idx = path.indexOf(p, at)
        if (idx < 0 || idx + p.length > endLimit) return false
        at = idx + p.length
      }
      i += 1
    }
    if (anchored) at <= endLimit else true
  }

  /** The RFC 9309 decision for `path` under `rules`: longest pattern
    * wins (octet length of the pattern), an equal-length tie resolves
    * to Allow, no match → allowed. */
  def isAllowed(rules: Vector[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (patternMatches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen) { bestLen = len; bestAllow = r.allow }
        else if (len == bestLen && r.allow) bestAllow = true
      }
    }
    bestAllow
  }

  /** One-call form: parse + decide. Dirty input → allowed (the RFC
    * default for an unparseable robots.txt is allow). */
  def allowed(robotsTxt: String, path: String, agent: String = "*"): Boolean =
    try {
      if (path == null) return true
      isAllowed(rulesFor(robotsTxt, agent), path)
    } catch { case _: Exception => true }
}
