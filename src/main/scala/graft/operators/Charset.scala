package graft.operators

/** Charset triage and repair for crawled text — the ftfy-class
  * cleanup every web-scale corpus runs before tokenization:
  *
  *  - [[sniff]]: BOM-driven UTF-16 detection, strict UTF-8
  *    validation (a real DFA: overlongs, surrogates, and range
  *    violations all reject), ASCII fast path, and the WHATWG
  *    fallback verdict (windows-1252) for everything else — the
  *    order browsers actually apply;
  *  - [[decode]]: bytes → string under the sniffed charset, total
  *    for text inputs (WHATWG windows-1252 maps all 256 bytes, the
  *    five undefined ones to their C1 controls), null only for
  *    binary (NUL-bearing) or structurally broken UTF-16;
  *  - [[fixMojibake]]: the classic double-encoding repair — text
  *    whose UTF-8 bytes were once mis-read as windows-1252
  *    ("Ã©" for "é", "â€™" for "'") is re-encoded through the
  *    inverse 1252 table and re-decoded as UTF-8 when, and only
  *    when, the bytes round-trip as valid multibyte UTF-8; bounded
  *    at two rounds (double mojibake is real, triple is noise).
  *
  * Everything here is a pure per-row function — map-only, streams
  * unchanged, no state — so at 100 TB the cost is the scan.
  * Reference capability: text ingestion/cleanup in front of the
  * reference's embedding pipeline (weaviate.py:129 `index()` takes
  * already-clean text; this is the stage that makes it so). */
object Charset {

  /** WHATWG windows-1252: byte → codepoint, all 256 defined. */
  val Cp1252: Array[Int] = {
    val t = Array.tabulate(256)(identity)
    val hi = Array(
      0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
      0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
      0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
      0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178)
    var i = 0
    while (i < 32) { t(0x80 + i) = hi(i); i += 1 }
    t
  }

  private val Cp1252Inv: java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    var b = 0
    while (b < 256) { m.put(Cp1252(b), b); b += 1 }
    m
  }

  /** Strict UTF-8 validity: multibyte sequences complete, no
    * overlongs, no surrogates, max U+10FFFF. */
  def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation or overlong lead
      else {
        val n = if (c < 0xe0) 1 else if (c < 0xf0) 2
          else if (c < 0xf5) 3 else return false
        if (i + n >= b.length) return false
        var k = 1
        var cp = c & (0x3f >> n)
        while (k <= n) {
          val cc = b(i + k) & 0xff
          if ((cc & 0xc0) != 0x80) return false
          cp = (cp << 6) | (cc & 0x3f)
          k += 1
        }
        val min = if (n == 1) 0x80 else if (n == 2) 0x800 else 0x10000
        if (cp < min || cp > 0x10ffff ||
          (cp >= 0xd800 && cp <= 0xdfff)) return false
        i += n + 1
      }
    }
    true
  }

  /** True if the bytes hold at least one multibyte UTF-8 sequence —
    * the guard that keeps [[fixMojibake]] from "repairing" ASCII. */
  def hasMultibyte(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xff) >= 0x80) return true
      i += 1
    }
    false
  }

  def cp1252Decode(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      sb.appendCodePoint(Cp1252(b(i) & 0xff))
      i += 1
    }
    sb.toString
  }

  /** Inverse of [[cp1252Decode]]; None when any char has no 1252
    * byte (genuine non-Western text must not be "repaired"). */
  def cp1252Encode(s: String): Option[Array[Byte]] = {
    val out = new Array[Byte](s.codePointCount(0, s.length))
    var i = 0
    var o = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val b = Cp1252Inv.get(cp)
      if (b == null) return None
      out(o) = b.intValue.toByte
      o += 1
      i += Character.charCount(cp)
    }
    Some(out)
  }

  /** The browser-order charset verdict: utf-16le / utf-16be (BOM),
    * binary (NUL), ascii, utf-8 (validated), cp1252 (fallback). */
  def sniff(b: Array[Byte]): String = {
    if (b == null) return null
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe)
      return "utf-16le"
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      return "utf-16be"
    var i = 0
    var ascii = true
    while (i < b.length) {
      if (b(i) == 0) return "binary"
      if ((b(i) & 0xff) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) "ascii"
    else if (isValidUtf8(b)) "utf-8"
    else "cp1252"
  }

  /** Decode under the sniffed charset. Null for binary and for
    * odd-length UTF-16 — never an exception, never replacement
    * characters (a U+FFFD in a corpus is a silent data bug). */
  def decode(b: Array[Byte]): String = {
    if (b == null) return null
    sniff(b) match {
      case "utf-16le" =>
        if ((b.length & 1) != 0) null
        else new String(b, 2, b.length - 2,
          java.nio.charset.StandardCharsets.UTF_16LE)
      case "utf-16be" =>
        if ((b.length & 1) != 0) null
        else new String(b, 2, b.length - 2,
          java.nio.charset.StandardCharsets.UTF_16BE)
      case "binary" => null
      case "ascii" | "utf-8" =>
        val off = if (b.length >= 3 && (b(0) & 0xff) == 0xef &&
          (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf) 3 else 0
        new String(b, off, b.length - off,
          java.nio.charset.StandardCharsets.UTF_8)
      case _ => cp1252Decode(b)
    }
  }

  /** Undo UTF-8-read-as-1252 double encoding, at most `rounds`
    * times. A round fires only when the 1252 re-encoding exists AND
    * is valid multibyte UTF-8 — clean text is a fixed point. */
  def fixMojibake(s: String, rounds: Int = 2): String = {
    var cur = s
    var r = 0
    var going = true
    while (r < rounds && going) {
      cp1252Encode(cur) match {
        case Some(bytes) if hasMultibyte(bytes) && isValidUtf8(bytes) =>
          cur = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        case _ => going = false
      }
      r += 1
    }
    cur
  }
}
