package graft.operators

import graft.SparkTestBase

/** Cross-codec garbage sweep: EVERY media kernel must map arbitrary
  * crawl bytes to null/None — never an exception, never an executor
  * kill. Inputs: seeded random blobs, every valid fixture truncated at
  * random offsets, and valid fixtures with random byte flips (the
  * three corruption modes a real crawl serves). This is the one spec
  * that exercises every decode entry point against the same dirt. */
class CodecFuzzSpec extends SparkTestBase {

  private val rnd = new scala.util.Random(20260814L)

  private def validFixtures: Seq[Array[Byte]] = Seq(
    MediaFixtures.pixelMediaFor(5L),
    MediaFixtures.webPixelMediaFor(7L),
    MediaFixtures.jpegPixelMediaFor(6L),
    MediaFixtures.jpegAcMediaFor(9L),
    MediaFixtures.gifMediaFor(4L),
    MediaFixtures.gifDeltaMediaFor(3L),
    MediaFixtures.wavMediaFor(8L),
    MediaFixtures.wavGainMediaFor(11L),
    MediaFixtures.mixedPixelMediaFor(10L),
    MediaFixtures.bmpMediaFor(6L),
    MediaFixtures.flacMediaFor(5L),
    MediaFixtures.mp4MediaFor(7L),
    MediaFixtures.mp4MultiMediaFor(4L),
    MediaFixtures.mp3MediaFor(6L),
    MediaFixtures.ulawMediaFor(9L),
    MediaFixtures.webpMediaFor(3L),
    MediaFixtures.warcMediaFor(5L),
    Vp8Fixtures.ivfFor(0L),
    Vp8Fixtures.webmFor(1L),
    Vp8Fixtures.webmSubsFor(3L),
    Mp3Fixtures.mp3CoverageMediaFor(5L),
    VorbisEnc.fixture(16000L, 4, 5L),
    VorbisEnc.webmFixture(16000L, 4, 5L))

  private def dirtyInputs: Seq[Array[Byte]] = {
    val random = (0 until 40).map { _ =>
      val b = new Array[Byte](rnd.nextInt(4000))
      rnd.nextBytes(b); b
    }
    val truncated = validFixtures.flatMap { v =>
      (0 until 6).map(_ => v.take(rnd.nextInt(v.length)))
    }
    val flipped = validFixtures.flatMap { v =>
      (0 until 6).map { _ =>
        val b = v.clone()
        (0 until 1 + rnd.nextInt(8)).foreach { _ =>
          val i = rnd.nextInt(b.length)
          b(i) = (b(i) ^ (1 + rnd.nextInt(255))).toByte
        }
        b
      }
    }
    random ++ truncated ++ flipped ++
      Seq(Array.emptyByteArray, "GIF89a".getBytes, "RIFF".getBytes,
        Array[Byte](0x89.toByte, 'P', 'N', 'G'),
        Array[Byte](0xff.toByte, 0xd8.toByte))
  }

  test("every decode kernel survives random, truncated, and bit-flipped " +
    "bytes without throwing (null/None is the only failure mode)") {
    val inputs = dirtyInputs
    assert(inputs.size > 130)
    inputs.zipWithIndex.foreach { case (b, idx) =>
      def check(label: String)(f: => Any): Unit =
        try f
        catch { case e: Throwable =>
          fail(s"$label threw on dirty input #$idx " +
            s"(${b.length} bytes): $e")
        }
      check("PngPixels.decode")(PngPixels.decode(b))
      check("JpegDc.decode")(JpegDc.decode(b))
      check("Gif.decode")(Gif.decode(b))
      check("Gif.decodeComposited")(Gif.decodeComposited(b))
      check("WavPcm.decode")(WavPcm.decode(b))
      check("Avi.decode")(Avi.decode(b))
      check("Flac.decode")(Flac.decode(b))
      check("Mp4.decode")(Mp4.decode(b))
      check("Mp4.meta")(Mp4.meta(b))
      check("Mp3.meta")(Mp3.meta(b))
      check("Warc.gunzip")(Warc.gunzip(b))
      check("Warc.parse")(Warc.parse(b))
      check("HtmlText")(graft.functions.HtmlText.compute(
        org.apache.spark.unsafe.types.UTF8String.fromBytes(
          b.map(x => (x & 0x7f).toByte))))
      check("MediaCodec.parse")(MediaCodec.parse(b))
      check("Bmp.decode")(Bmp.decode(b))
      check("PngStats")(graft.functions.PngStats.statsToRow(b))
      check("PngHistogram")(graft.functions.PngHistogram.compute(b, 16))
      check("ImageDhash")(graft.functions.ImageDhash.compute(b))
      check("WavSpectral")(graft.functions.WavSpectral.compute(b, 16))
      check("WavWindows")(graft.functions.WavWindows.compute(b, 64))
      check("GifCompositeStats")(
        graft.functions.GifCompositeStats.compute(b))
      check("GifFrameStats")(graft.functions.GifFrameStats.compute(b))
      check("Vp8Inter.decodeIvf")(Vp8Inter.decodeIvf(b))
      check("IvfMeta.compute")(graft.functions.IvfMeta.compute(b))
      check("Webm.meta")(Webm.meta(b))
      check("Webm.decode")(Webm.decode(b))
      check("Webm.subtitleCues")(Webm.subtitleCues(b))
      check("Mp3Pcm.coverage")(Mp3Pcm.coverage(b))
      check("Mp3Pcm.decode")(Mp3Pcm.decode(b))
      check("Vorbis.decodeOgg")(Vorbis.decodeOgg(b))
      check("Vorbis.decodeWebm")(Vorbis.decodeWebm(b))
      check("Webm.audioPackets")(Webm.audioPackets(b))
    }
  }

  test("the same dirt through the SQL surface: every kernel column " +
    "yields nulls, not task failures") {
    graft.Graft.init(spark)
    import spark.implicits._
    val df = dirtyInputs.map(b => Tuple1(b)).toDF("b")
    val out = df.selectExpr(
      "pixel_stats(b) IS NULL AS a",
      "image_dhash(b) IS NULL AS c",
      "wav_spectral(b, 16) IS NULL AS d",
      "flac_wav(b) IS NULL AS g",
      "mp4_meta(b) IS NULL AS h",
      "mp4_frame_stats(b) IS NULL AS i",
      "gif_composite_stats(b) IS NULL AS e",
      "media_features(b, 8) IS NOT NULL AS f") // features falls back
    // the action itself passing IS the assertion (no task throw);
    // count the all-null rows for a sanity signal
    val n = out.count()
    assert(n == dirtyInputs.size.toLong)
  }
}
