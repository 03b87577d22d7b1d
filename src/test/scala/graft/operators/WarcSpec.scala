package graft.operators

import graft.SparkTestBase

/** WARC + gzip: real inflate with CRC, exact Content-Length record
  * accounting, and the dirty-crawl-bytes contract. */
class WarcSpec extends SparkTestBase {

  test("gzip round-trips arbitrary bytes; a flipped payload bit fails " +
    "the CRC; multi-member streams concatenate") {
    val rnd = new scala.util.Random(55)
    (0 until 10).foreach { _ =>
      val data = new Array[Byte](rnd.nextInt(5000))
      rnd.nextBytes(data)
      val gz = Warc.gzip(data)
      assert(Warc.gunzip(gz).get.sameElements(data))
    }
    val data = "the quick brown fox".getBytes
    val gz = Warc.gzip(data)
    // flip a DEFLATE payload bit (after the 10-byte header)
    val bad = gz.clone()
    bad(12) = (bad(12) ^ 0x40).toByte
    assert(Warc.gunzip(bad).isEmpty)
    // two members back to back decode as the concatenation
    val two = Warc.gzip("abc".getBytes) ++ Warc.gzip("def".getBytes)
    assert(new String(Warc.gunzip(two).get) == "abcdef")
    assert(Warc.gunzip("not gzip".getBytes).isEmpty)
    assert(Warc.gunzip(null).isEmpty)
  }

  test("warc parse walks records by exact Content-Length; headers " +
    "are case-insensitive; payload bytes are preserved verbatim") {
    val r1 = Warc.record("warcinfo", "", "software: x".getBytes)
    val r2 = Warc.record("response", "http://a.com/p",
      "<html>hi \r\n not a header</html>".getBytes)
    val rs = Warc.parse(r1 ++ r2).get
    assert(rs.length == 2)
    assert(rs(0).recType == "warcinfo" && rs(0).targetUri == "")
    assert(rs(1).recType == "response" &&
      rs(1).targetUri == "http://a.com/p")
    assert(new String(rs(1).payload) == "<html>hi \r\n not a header</html>")
    assert(rs(1).contentLength == rs(1).payload.length)
  }

  test("a Content-Length off by one desynchronizes the stream and " +
    "fails the whole parse (validator, not sniff)") {
    val good = Warc.record("response", "http://x/", "0123456789".getBytes) ++
      Warc.record("response", "http://y/", "abcdef".getBytes)
    assert(Warc.parse(good).get.length == 2)
    // find 'Content-Length: 10' and make it 9
    val s = new String(good, "ISO-8859-1")
    val idx = s.indexOf("Content-Length: 10")
    val bad = good.clone()
    bad(idx + 16) = '9'; bad(idx + 17) = '\r'
    // shifting the header length breaks CRLF accounting -> None
    assert(Warc.parse(java.util.Arrays.copyOfRange(bad, 0, bad.length))
      .isEmpty)
  }

  test("fixture end-to-end: gunzip + parse recovers the two records " +
    "and the closed-form page") {
    (0L until 8L).foreach { id =>
      val rs = Warc.parse(Warc.gunzip(MediaFixtures.warcMediaFor(id)).get).get
      assert(rs.length == 2)
      assert(rs(0).recType == "warcinfo")
      assert(rs(1).recType == "response")
      assert(rs(1).targetUri ==
        s"http://site${id % 37}.example.com/p/$id")
      val html = new String(rs(1).payload, "UTF-8")
      assert(html.startsWith(s"<html><body><h1>Page $id</h1>"))
    }
  }

  test("dirty bytes: truncations, garbage, bare-LF line endings -> " +
    "None, never a throw") {
    val clean = Warc.gunzip(MediaFixtures.warcMediaFor(3L)).get
    (0 until clean.length by 17).foreach { cut =>
      Warc.parse(java.util.Arrays.copyOf(clean, cut))
    }
    assert(Warc.parse("WARC/1.0\nWARC-Type: x\n\n".getBytes).isEmpty)
    assert(Warc.parse("HTTP/1.1 200 OK\r\n\r\n".getBytes).isEmpty)
    assert(Warc.parse(null).isEmpty)
    val rnd = new scala.util.Random(9)
    (0 until 150).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      Warc.parse(b); Warc.gunzip(b)
    }
  }
}
