package graft.operators

import graft.SparkTestBase

/** Zstd frame-header triage + sitemap extraction: bit-layout round
  * trips, skippable frames, both sitemap container forms, entity
  * decoding, rejection. */
class CrawlMetaSpec extends SparkTestBase {

  test("zstd: all four FCS widths round-trip, incl. the 2-byte bias " +
    "and the undeclared-size form") {
    val a = Zstd.parse(Zstd.zstHeader(-1L, 3, 2, 0L, checksum = false,
      nSkippable = 0)).get
    assert(!a.hasContentSize && a.contentSize == 0L)
    assert(a.windowSize == (1L << 13) + 2 * (1L << 10))
    val b = Zstd.parse(Zstd.zstHeader(700L, 0, 0, 0L, checksum = true,
      nSkippable = 0)).get
    assert(b.hasContentSize && b.contentSize == 700L && b.hasChecksum)
    val c = Zstd.parse(Zstd.zstHeader(1000000L, 7, 7, 0L,
      checksum = false, nSkippable = 0)).get
    assert(c.contentSize == 1000000L)
    val d = Zstd.parse(Zstd.zstHeader(8000000000L, 1, 1, 0L,
      checksum = false, nSkippable = 0)).get
    assert(d.contentSize == 8000000000L)
  }

  test("zstd: dictionary-ID widths, skippable frames stepped over " +
    "and counted, dirty bytes reject") {
    val m = Zstd.parse(Zstd.zstHeader(300L, 2, 1, 45000L,
      checksum = false, nSkippable = 2)).get
    assert(m.dictId == 45000L && m.skippableFrames == 2)
    val one = Zstd.parse(Zstd.zstHeader(300L, 2, 1, 7L,
      checksum = false, nSkippable = 0)).get
    assert(one.dictId == 7L)
    assert(Zstd.parse(null).isEmpty)
    assert(Zstd.parse(Array[Byte](1, 2, 3, 4, 5)).isEmpty)
    val good = Zstd.zstHeader(300L, 2, 1, 0L, checksum = false,
      nSkippable = 0)
    val badMagic = good.clone(); badMagic(0) = 0
    assert(Zstd.parse(badMagic).isEmpty)
    // reserved descriptor bit set -> reject
    val reserved = good.clone(); reserved(4) = (reserved(4) | 0x08).toByte
    assert(Zstd.parse(reserved).isEmpty)
    // skippable frame whose declared size overruns -> reject
    val skip = Zstd.zstHeader(300L, 2, 1, 0L, checksum = false,
      nSkippable = 1)
    assert(Zstd.parse(skip.take(10)).isEmpty)
  }

  test("sitemap: urlset entries with entities, CDATA, lastmod, and " +
    "the 0.5 priority default; sitemapindex recognized") {
    val u = Sitemap.parse(
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://a.com/?x=1&amp;y=2</loc>
        |<lastmod>2026-02-03</lastmod><priority>0.8</priority></url>
        |<url><loc><![CDATA[https://b.com/raw&amp;kept]]></loc></url>
        |</urlset>""".stripMargin).get
    assert(!u.isIndex && u.entries.length == 2)
    assert(u.entries(0).loc == "https://a.com/?x=1&y=2")
    assert(u.entries(0).lastmod == "2026-02-03" &&
      u.entries(0).priority == 0.8)
    assert(u.entries(1).loc == "https://b.com/raw&amp;kept") // CDATA raw
    assert(u.entries(1).priority == 0.5)
    val i = Sitemap.parse(Sitemap.index(Seq("https://x.com/a.xml"))).get
    assert(i.isIndex && i.entries.head.loc == "https://x.com/a.xml")
  }

  test("sitemap: protocol violations reject — stray loc outside an " +
    "entry, unclosed entries, missing loc, junk") {
    assert(Sitemap.parse(null).isEmpty)
    assert(Sitemap.parse("just text").isEmpty)
    assert(Sitemap.parse("<urlset></urlset>").isEmpty) // no entries
    assert(Sitemap.parse(
      "<urlset><loc>https://x</loc></urlset>").isEmpty) // stray loc
    assert(Sitemap.parse(
      "<urlset><url><loc>https://x</loc></urlset>").isEmpty) // unclosed
    assert(Sitemap.parse(
      "<urlset><url><lastmod>2026</lastmod></url></urlset>").isEmpty)
  }

  test("media_kind routes every fixture family correctly and answers " +
    "'unknown'/'tar'/'riff' on the edges") {
    import graft.functions.MediaKind.kind
    assert(kind(MediaFixtures.pixelMediaFor(3L)) == "png")
    assert(kind(MediaFixtures.zipMediaFor(3L)) == "zip")
    assert(kind(MediaFixtures.tarGzMediaFor(3L)) == "gzip")
    assert(kind(Tar.tar(Seq(("a.txt", "x".getBytes)))) == "tar")
    assert(kind(MediaFixtures.zstMediaFor(1L)) == "zstd") // skippable lead
    assert(kind(MediaFixtures.zstMediaFor(3L)) == "zstd")
    assert(kind(MediaFixtures.parquetMediaFor(3L)) == "parquet")
    assert(kind(MediaFixtures.pdfMediaFor(3L)) == "pdf")
    assert(kind(MediaFixtures.oggMediaFor(3L)) == "ogg")
    assert(kind(MediaFixtures.mp3MediaFor(2L)) == "mp3") // ID3 header
    assert(kind(MediaFixtures.mp3MediaFor(3L)) == "mp3") // frame sync
    assert(kind(Vp8Fixtures.ivfFor(0L)) == "ivf") // DKIF (r12)
    assert(kind(null) == "unknown")
    assert(kind("no".getBytes) == "unknown")
    assert(kind("random text bytes here".getBytes) == "unknown")
    // an unrecognized RIFF form stays in the family without lying
    val riff = "RIFF0000XXXX".getBytes("US-ASCII")
    assert(kind(riff) == "riff")
  }

  test("fixtures follow the closed forms the oracle re-derives") {
    for (id <- 0L to 9L) {
      val z = Zstd.parse(MediaFixtures.zstMediaFor(id)).get
      assert(z.hasContentSize == (id % 4 != 0))
      assert(z.skippableFrames == id % 3)
      assert(z.hasChecksum == (id % 2 == 1))
      val sm = Sitemap.parse(MediaFixtures.sitemapMediaFor(id)).get
      if (id % 5 == 4) {
        assert(sm.isIndex && sm.entries.length == 1 + id % 3)
        assert(sm.entries.head.loc == s"https://ex$id.com/s0.xml.gz")
      } else {
        assert(!sm.isIndex && sm.entries.length == 1 + id % 4)
        assert(sm.entries.head.loc == s"https://ex$id.com/p0?a=1&b=2")
      }
    }
  }
}
