package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Charset triage and mojibake repair: the sniff order, the strict
  * UTF-8 DFA, the WHATWG 1252 table, decode totality, and the
  * bounded repair loop with its fixed points. */
class CharsetSpec extends AnyFunSuite {

  private val rich = "café münchen ’q’ €5"

  test("sniff follows browser order: BOM beats NUL beats ASCII " +
    "beats UTF-8 beats the 1252 fallback") {
    import java.nio.charset.StandardCharsets._
    assert(Charset.sniff("plain".getBytes(US_ASCII)) == "ascii")
    assert(Charset.sniff(rich.getBytes(UTF_8)) == "utf-8")
    assert(Charset.sniff(Charset.cp1252Encode(rich).get) == "cp1252")
    val le = Array[Byte](0xff.toByte, 0xfe.toByte) ++ rich.getBytes(UTF_16LE)
    val be = Array[Byte](0xfe.toByte, 0xff.toByte) ++ rich.getBytes(UTF_16BE)
    assert(Charset.sniff(le) == "utf-16le")
    assert(Charset.sniff(be) == "utf-16be")
    assert(Charset.sniff(Array[Byte]('a', 0, 'b')) == "binary")
    // a UTF-16 BOM wins even though the payload is full of NULs
    assert(Charset.decode(le) == rich && Charset.decode(be) == rich)
  }

  test("the UTF-8 DFA is strict: overlongs, surrogates, range " +
    "violations, and truncations all fall back to 1252") {
    def bad(bytes: Int*): Unit = {
      val b = bytes.map(_.toByte).toArray
      assert(!Charset.isValidUtf8(b), bytes.map(x => f"$x%02x").mkString(" "))
      assert(Charset.sniff(Array[Byte]('a') ++ b) == "cp1252")
    }
    bad(0xc0, 0xaf)             // overlong '/'
    bad(0xc1, 0xbf)             // overlong
    bad(0xe0, 0x80, 0xaf)       // overlong 3-byte
    bad(0xed, 0xa0, 0x80)       // UTF-16 surrogate D800
    bad(0xf4, 0x90, 0x80, 0x80) // above U+10FFFF
    bad(0xf5, 0x80, 0x80, 0x80) // lead out of range
    bad(0xc3)                   // truncated tail
    bad(0x80)                   // bare continuation
    assert(Charset.isValidUtf8("é’€ plain".getBytes("UTF-8")))
  }

  test("the WHATWG 1252 table: smart-quote block exact, the five " +
    "undefined bytes map to C1 controls, and all 256 bytes round-trip") {
    assert(Charset.Cp1252(0x80) == 0x20ac) // euro
    assert(Charset.Cp1252(0x92) == 0x2019) // right single quote
    assert(Charset.Cp1252(0x99) == 0x2122) // trademark
    assert(Charset.Cp1252(0x9f) == 0x0178) // Y umlaut
    for (u <- Seq(0x81, 0x8d, 0x8f, 0x90, 0x9d))
      assert(Charset.Cp1252(u) == u, f"$u%02x")
    val all = Array.tabulate[Byte](256)(_.toByte)
    val round = Charset.cp1252Encode(Charset.cp1252Decode(all)).get
    assert(java.util.Arrays.equals(round, all))
    // a codepoint with no 1252 byte refuses to encode
    assert(Charset.cp1252Encode("ру").isEmpty) // Cyrillic
  }

  test("decode is total for text, null for binary and broken UTF-16, " +
    "and never emits U+FFFD") {
    assert(Charset.decode(Array[Byte](1, 0, 2)) == null)
    assert(Charset.decode(
      Array[Byte](0xff.toByte, 0xfe.toByte, 'a', 0, 'b')) == null) // odd len
    val utf8bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "bom text".getBytes("UTF-8")
    assert(Charset.decode(utf8bom) == "bom text")
    // raw 1252 high bytes decode to their table codepoints, not FFFD
    assert(Charset.decode(Array[Byte]('a', 0x97.toByte, 'b')) ==
      "a—b")
  }

  test("fixMojibake: single and double mojibake repair; clean " +
    "western, non-western, and ASCII text are fixed points") {
    val clean = "café ’quote’"
    // mojibake = utf8 bytes mis-decoded through the 1252 table
    def garble(s: String): String =
      Charset.cp1252Decode(s.getBytes("UTF-8"))
    assert(Charset.fixMojibake(garble(clean)) == clean)
    assert(Charset.fixMojibake(garble(garble(clean))) == clean)
    assert(Charset.fixMojibake(clean) == clean)
    assert(Charset.fixMojibake("plain ascii") == "plain ascii")
    val cyr = "привет"
    assert(Charset.fixMojibake(cyr) == cyr)
    // triple mojibake is out of contract: two rounds peel two layers
    val triple = garble(garble(garble(clean)))
    assert(Charset.fixMojibake(triple) == garble(clean))
  }

  test("fixtures follow the closed forms the oracle re-derives") {
    for (id <- 0L to 9L) {
      val b = MediaFixtures.encMediaFor(id)
      val expected =
        if (id % 5 == 0) s"doc $id plain ascii text"
        else s"doc $id café münchen ’quote’ " +
          s"€${id % 10}"
      assert(Charset.decode(b) == expected, s"id=$id")
      val label = Seq("ascii", "utf-8", "cp1252", "utf-16le",
        "utf-16be")((id % 5).toInt)
      assert(Charset.sniff(b) == label, s"id=$id")
    }
  }
}
