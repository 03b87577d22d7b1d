package graft.operators

/** Rule-based sentence splitting (the punkt-lite every chunking /
  * dedup / quality stage wants upstream): a boundary is a run of
  * terminal punctuation `[.!?]` (plus trailing quotes), then
  * whitespace, then an uppercase letter or digit — UNLESS the token
  * ending at the period is a known abbreviation (Dr., e.g., Fig.)
  * — so decimals ("3.14") and honorifics don't shatter sentences.
  * Pure per-row function: map-only at any scale, streams unchanged.
  */
object Sentences {

  /** Abbreviations whose trailing period is not a boundary. */
  val Abbrev: Set[String] = Set(
    "Dr", "Mr", "Mrs", "Ms", "Prof", "St", "vs", "e.g", "i.e",
    "Fig", "Eq", "No", "cf", "al")

  /** Sentences in order, punctuation kept, inter-sentence
    * whitespace dropped. Empty/blank input → empty array. */
  def split(text: String): Array[String] = {
    if (text == null) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        // absorb the punctuation run and any closing quotes
        var j = i + 1
        while (j < n && (text.charAt(j) == '.' || text.charAt(j) == '!' ||
          text.charAt(j) == '?' || text.charAt(j) == '"' ||
          text.charAt(j) == '’' || text.charAt(j) == '\'')) j += 1
        // require whitespace, then an upper/digit opener
        var k = j
        while (k < n && Character.isWhitespace(text.charAt(k))) k += 1
        // the opener may sit behind opening quotes/brackets
        var o = k
        while (o < n && (text.charAt(o) == '"' || text.charAt(o) == '\'' ||
          text.charAt(o) == '‘' || text.charAt(o) == '“' ||
          text.charAt(o) == '(' || text.charAt(o) == '[')) o += 1
        val opens = k > j && o < n &&
          (Character.isUpperCase(text.charAt(o)) ||
            Character.isDigit(text.charAt(o)))
        // the token ending at the period (abbreviation guard; only
        // periods abbreviate — ! and ? always close)
        val guard = c == '.' && {
          var t = i - 1
          while (t >= start && !Character.isWhitespace(text.charAt(t)))
            t -= 1
          Abbrev.contains(text.substring(t + 1, i))
        }
        if (opens && !guard) {
          val s = text.substring(start, j).trim
          if (s.nonEmpty) out += s
          start = k
          i = k
        } else i = j
      } else i += 1
    }
    if (start < n) {
      val tail = text.substring(start).trim
      if (tail.nonEmpty) out += tail
    }
    out.toArray
  }
}
