package graft.operators

import graft.SparkTestBase

/** SRT/WebVTT parsing: both timing grammars, skip blocks, multi-line
  * cues, validator rejection, fixture closed forms. */
class SubtitlesSpec extends SparkTestBase {

  test("SRT round-trips: comma decimals, hour arithmetic, multi-line " +
    "cue text") {
    val cues = Seq(
      (0L, 1500L, "first"),
      (3_725_042L, 3_730_000L, "one hour in\nsecond line")) // 01:02:05,042
    val parsed = Subtitles.parse(Subtitles.srt(cues)).get
    assert(parsed.map(c => (c.startMs, c.endMs, c.text)) == cues.toVector)
    assert(parsed.map(_.idx) == Vector(1, 2))
  }

  test("WebVTT: dot decimals, optional hours, cue ids, settings after " +
    "the arrow, NOTE blocks skipped") {
    val v = "WEBVTT\n\nNOTE a comment\nspanning lines\n\n" +
      "00:01.000 --> 00:02.500 align:start position:10%\nshort form\n\n" +
      "id-7\n01:00:00.000 --> 01:00:01.000\nwith id\n"
    val parsed = Subtitles.parse(v).get
    assert(parsed.length == 2)
    assert(parsed(0).startMs == 1000L && parsed(0).endMs == 2500L)
    assert(parsed(0).text == "short form")
    assert(parsed(1).startMs == 3600000L && parsed(1).text == "with id")
  }

  test("a malformed timing line fails the FILE (validator stance)") {
    val good = Subtitles.srt(Seq((0L, 1000L, "a"), (2000L, 3000L, "b")))
    assert(Subtitles.parse(good).isDefined)
    assert(Subtitles.parse(good.replace("00:00:02,000", "00:00:02,0x0"))
      .isEmpty)
    assert(Subtitles.parse(good.replace("-->", "=>")).isEmpty)
    // end before start rejects
    assert(Subtitles.parse(
      "1\n00:00:05,000 --> 00:00:01,000\nx\n").isEmpty)
    assert(Subtitles.parse(null).isEmpty)
    assert(Subtitles.parse("").isEmpty)
    assert(Subtitles.parse("WEBVTT\n\n").isEmpty) // no cues
    assert(Subtitles.parse("random prose, not a subtitle file").isEmpty)
  }

  test("fixtures follow the closed forms the oracle re-derives") {
    for (id <- 0L to 8L) {
      val cues = Subtitles.parse(MediaFixtures.subtitleMediaFor(id)).get
      assert(cues.length == 1 + id % 4)
      cues.zipWithIndex.foreach { case (c, k) =>
        assert(c.idx == k + 1)
        assert(c.startMs == k * 2000L + (id % 7) * 10)
        assert(c.endMs == c.startMs + 1500)
        val expect = s"cue $k of $id" +
          (if (k % 2 == 1) "\nline two" else "")
        assert(c.text == expect)
      }
    }
  }
}
