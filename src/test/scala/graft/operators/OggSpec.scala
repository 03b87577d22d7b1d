package graft.operators

import graft.SparkTestBase

/** Ogg page walk: round trips for both codecs, the known CRC test
  * vector behavior (a flipped byte anywhere fails), lacing
  * continuation accounting, and dirty-byte rejection. */
class OggSpec extends SparkTestBase {

  test("round-trips the writer for Vorbis and Opus, counting pages, " +
    "packets (across 255-lace continuations) and the final granule") {
    for (opus <- Seq(false, true)) {
      val b = Ogg.ogg(opus, channels = 2, rate = if (opus) 48000 else 44100,
        nPages = 3, packetsPerPage = 4, granuleStep = 1024, seed = 9)
      val m = Ogg.parse(b).getOrElse(fail(s"opus=$opus did not parse"))
      assert(m.codec == (if (opus) "opus" else "vorbis"))
      assert(m.channels == 2)
      assert(m.sampleRate == (if (opus) 48000 else 44100))
      assert(m.pages == 4)          // BOS + 3 audio pages
      assert(m.packets == 1 + 12)   // id + 3*4
      assert(m.lastGranule == 3 * 1024)
    }
  }

  test("the page CRC is real: ANY flipped body or header byte fails " +
    "the file; a recomputed CRC over the same bytes matches") {
    val b = Ogg.ogg(opus = false, 1, 8000, 2, 2, 960, seed = 3)
    assert(Ogg.parse(b).isDefined)
    // flip one byte in the middle of the last page's body
    val bad = b.clone()
    bad(b.length - 5) = (bad(b.length - 5) ^ 0x10).toByte
    assert(Ogg.parse(bad).isEmpty)
    val badHdr = b.clone()
    badHdr(6) = (badHdr(6) ^ 0x1).toByte // granule byte of page 0
    assert(Ogg.parse(badHdr).isEmpty)
    // the stored CRC equals an independent recompute with the field
    // zeroed (self-consistency of the direct 0x04c11db7 algorithm)
    val stored = (b(22) & 0xff) | ((b(23) & 0xff) << 8) |
      ((b(24) & 0xff) << 16) | ((b(25) & 0xff) << 24)
    val firstPageLen = {
      val nsegs = b(26) & 0xff
      var l = 27 + nsegs
      var i = 0
      while (i < nsegs) { l += b(27 + i) & 0xff; i += 1 }
      l
    }
    assert(Ogg.crc(b, 0, firstPageLen, 22) == stored)
  }

  test("dirty bytes reject: truncation, bad capture, bad version, " +
    "missing BOS id packet, foreign codec") {
    val b = Ogg.ogg(opus = true, 1, 48000, 2, 2, 960, seed = 5)
    assert(Ogg.parse(null).isEmpty)
    assert(Ogg.parse(b.take(20)).isEmpty)
    assert(Ogg.parse(b.take(b.length - 3)).isEmpty) // truncated body
    val cap = b.clone(); cap(0) = 'X'
    assert(Ogg.parse(cap).isEmpty)
    // an id packet that is neither vorbis nor OpusHead → None
    val junk = Ogg.page(0x02, 0, 7L, 0, Seq(8),
      "notacode".getBytes("US-ASCII"))
    assert(Ogg.parse(junk).isEmpty)
  }

  test("fixtures follow the closed forms the oracle re-derives") {
    for (id <- 0L to 8L) {
      val m = Ogg.parse(MediaFixtures.oggMediaFor(id)).get
      assert(m.codec == (if (id % 2 == 1) "opus" else "vorbis"))
      assert(m.channels == 1 + id % 2)
      assert(m.sampleRate ==
        (if (id % 2 == 1) 48000L else 8000L * (1 + id % 3)))
      assert(m.pages == 2 + id % 3)
      assert(m.packets == 1 + (1 + id % 3) * (2 + id % 2))
      assert(m.lastGranule == (1 + id % 3) * 960L * (1 + id % 4))
    }
  }
}
