package graft.operators

import graft.SparkTestBase

/** Real MJPEG-AVI container-video codec: decoded frames must equal
  * the per-frame DC block contract after a genuine RIFF chunk walk
  * plus a real baseline-JPEG entropy decode per frame; `rec ` nesting
  * and word alignment follow the spec; dirty, truncated, and
  * over-budget bytes are rejected, never thrown on — and
  * [[Multimodal.sampleFrames]] serves REAL decoded frames for AVI. */
class AviSpec extends SparkTestBase {

  /** Every pixel of every frame against the block contract: frame f
    * of doc id is [[JpegDc.blockVal]] at seed [[Avi.frameSeed]]. */
  private def checkFrames(id: Long, d: Avi.Decoded): Unit =
    d.frames.zipWithIndex.foreach { case (fr, f) =>
      val seed = Avi.frameSeed(id, f)
      var y = 0
      while (y < fr.height) {
        var x = 0
        while (x < fr.width) {
          var c = 0
          while (c < fr.channels) {
            val got =
              fr.pixels((y * fr.width + x) * fr.channels + c) & 0xff
            assert(got == JpegDc.blockVal(seed, x / 8, y / 8, c),
              s"id=$id f=$f x=$x y=$y c=$c")
            c += 1
          }
          x += 1
        }
        y += 1
      }
    }

  test("decode(encode) recovers the exact pixel contract for every " +
    "frame — fixture dims, frame counts, and both component layouts") {
    (0L until 10L).foreach { id =>
      val d = Avi.decode(MediaFixtures.aviMediaFor(id)).getOrElse(
        fail(s"id=$id did not decode"))
      assert(d.frames.length == 2 + id % 3)
      assert(d.width == 8 * (1 + math.floorMod(id * 3, 4)).toInt)
      assert(d.height == 8 * (1 + math.floorMod(id * 5, 3)).toInt)
      assert(d.frames.head.channels == (if (id % 2 == 0) 3 else 1))
      assert(d.usPerFrame == 33333)
      checkFrames(id, d)
    }
  }

  test("seeded fuzz: 50 random (id, w, h, frames, comps) combos " +
    "round-trip bit-exact through the container + entropy decode") {
    val rnd = new scala.util.Random(2718)
    (0 until 50).foreach { _ =>
      val id = rnd.nextInt(100000).toLong
      val w = 8 * (1 + rnd.nextInt(6))
      val h = 8 * (1 + rnd.nextInt(5))
      val nf = 1 + rnd.nextInt(5)
      val nc = if (rnd.nextBoolean()) 3 else 1
      val d = Avi.decode(Avi.aviWithFrames(id, w, h, nf, nc)).getOrElse(
        fail(s"id=$id w=$w h=$h nf=$nf nc=$nc did not decode"))
      assert(d.frames.length == nf && d.frames.head.width == w &&
        d.frames.head.height == h && d.frames.head.channels == nc)
      checkFrames(id, d)
    }
  }

  // chunk/list builders mirroring the spec grammar, local to the
  // tests that hand-assemble containers
  private def le32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }
  private def chunk(o: java.io.ByteArrayOutputStream, id4: String,
      body: Array[Byte]): Unit = {
    o.write(id4.getBytes("US-ASCII")); le32(o, body.length)
    o.write(body, 0, body.length)
    if ((body.length & 1) == 1) o.write(0)
  }
  private def list(o: java.io.ByteArrayOutputStream, lt: String,
      body: Array[Byte]): Unit = {
    o.write("LIST".getBytes("US-ASCII")); le32(o, 4 + body.length)
    o.write(lt.getBytes("US-ASCII")); o.write(body, 0, body.length)
    if ((body.length & 1) == 1) o.write(0)
  }
  /** Reassemble a fixture AVI with a custom movi body (keeps hdrl). */
  private def withMovi(base: Array[Byte],
      movi: Array[Byte]): Array[Byte] = {
    val moviAt = base.indexOfSlice("movi".getBytes("US-ASCII"))
    assert(moviAt > 0, "movi not found in base fixture")
    val listAt = moviAt - 8 // LIST <size> movi
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 12, listAt - 12) // hdrl (skip RIFF header)
    list(out, "movi", movi)
    val body = out.toByteArray
    val full = new java.io.ByteArrayOutputStream()
    full.write("RIFF".getBytes("US-ASCII")); le32(full, 4 + body.length)
    full.write("AVI ".getBytes("US-ASCII")); full.write(body, 0, body.length)
    full.toByteArray
  }

  test("frames nested inside a `rec ` LIST (interleave grouping) " +
    "decode identically to flat movi chunks") {
    val id = 21L
    val base = Avi.aviWithFrames(id, 16, 8, 3, 1)
    val flat = Avi.decode(base).getOrElse(fail("flat base did not decode"))
    // rebuild movi: frame 0 flat, frames 1-2 inside one rec LIST
    val jpegs = (0 until 3)
      .map(f => JpegDc.jpegWithPixels(Avi.frameSeed(id, f), 16, 8, 1))
    val rec = new java.io.ByteArrayOutputStream()
    chunk(rec, "01dc", jpegs(1)); chunk(rec, "01dc", jpegs(2))
    val movi = new java.io.ByteArrayOutputStream()
    chunk(movi, "00dc", jpegs(0))
    list(movi, "rec ", rec.toByteArray)
    val d = Avi.decode(withMovi(base, movi.toByteArray))
      .getOrElse(fail("rec-nested did not decode"))
    assert(d.frames.length == 3)
    d.frames.zip(flat.frames).foreach { case (a, b) =>
      assert(a.pixels.toSeq == b.pixels.toSeq)
    }
    checkFrames(id, d)
  }

  test("mixed frame geometries decode per-frame; the SAD kernel " +
    "skips unequal-dim pairs") {
    val base = Avi.aviWithFrames(3L, 16, 16, 1, 1)
    val movi = new java.io.ByteArrayOutputStream()
    chunk(movi, "00dc", JpegDc.jpegWithPixels(7L, 16, 16, 1))
    chunk(movi, "00dc", JpegDc.jpegWithPixels(8L, 24, 8, 1)) // other dims
    chunk(movi, "00dc", JpegDc.jpegWithPixels(9L, 16, 16, 1))
    val bytes = withMovi(base, movi.toByteArray)
    val d = Avi.decode(bytes).getOrElse(fail("mixed-dims did not decode"))
    assert(d.frames.map(f => (f.width, f.height)) ==
      Vector((16, 16), (24, 8), (16, 16)))
    // only pairs (0,1) and (1,2) exist adjacently; both straddle the
    // dim change, so the diff array is empty — no pair is fabricated
    assert(graft.functions.AviFrameDiffs.compute(bytes).numElements() == 0)
  }

  test("out-of-subset and corrupt bytes are rejected, never thrown on") {
    val good = Avi.aviWithFrames(5L, 16, 8, 2, 3)
    assert(Avi.decode(null).isEmpty)
    assert(Avi.decode(Array[Byte]()).isEmpty)
    // RIFF but not AVI: the WAV fixture takes the audio path, not this
    assert(Avi.decode(MediaFixtures.wavMediaFor(2L)).isEmpty)
    assert(Avi.decode(good.take(good.length / 2)).isEmpty) // truncated
    // declared RIFF size beyond the buffer
    val oversize = good.clone(); oversize(4) = (oversize(4) + 16).toByte
    assert(Avi.decode(oversize).isEmpty)
    // a corrupt frame poisons the file (silent skip would shift indices)
    val jpegAt = good.indexOfSlice(Array[Byte](0xff.toByte, 0xd8.toByte))
    val bad = good.clone(); bad(jpegAt) = 0x00
    assert(Avi.decode(bad).isEmpty)
    // no avih header → reject
    val headerless = {
      val movi = new java.io.ByteArrayOutputStream()
      chunk(movi, "00dc", JpegDc.jpegWithPixels(1L, 8, 8, 1))
      val form = new java.io.ByteArrayOutputStream()
      list(form, "movi", movi.toByteArray)
      val body = form.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII")); le32(out, 4 + body.length)
      out.write("AVI ".getBytes("US-ASCII")); out.write(body, 0, body.length)
      out.toByteArray
    }
    assert(Avi.decode(headerless).isEmpty)
  }

  test("a crafted blob of deeply nested LIST strl headers is rejected " +
    "by the explicit depth cap — None, not a StackOverflowError (an " +
    "Error would escape the catch-Exception contract and kill the task)") {
    // 4000 nested `LIST strl` shells around an empty core: each shell
    // is 12 bytes (id + size + type), total ~48 KB — small enough for
    // a crawl row, deep enough to blow an unguarded recursion
    var body = Array[Byte]()
    (0 until 4000).foreach { _ =>
      val out = new java.io.ByteArrayOutputStream()
      out.write("LIST".getBytes("US-ASCII")); le32(out, 4 + body.length)
      out.write("strl".getBytes("US-ASCII")); out.write(body, 0, body.length)
      body = out.toByteArray
    }
    val blob = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII")); le32(out, 4 + body.length)
      out.write("AVI ".getBytes("US-ASCII")); out.write(body, 0, body.length)
      out.toByteArray
    }
    assert(Avi.decode(blob).isEmpty)
    // the cap is far above anything grammatical: the nested-rec
    // fixture (depth 3) still decodes
    assert(Avi.decode(Avi.aviWithFrames(5L, 16, 8, 2, 3)).nonEmpty)
  }

  test("the cumulative decode budget rejects a container whose many " +
    "in-cap frames sum past MaxDecodedBytes — before the builder grows") {
    // 65 gray 2048×2048 frames = 4 MiB raster each; frame 65 pushes
    // the running total past the 256 MiB cap (each frame alone is
    // fine — the per-frame JPEG cap never fires)
    val bytes = Avi.aviWithFrames(1L, 2048, 2048, 65, 1)
    assert(Avi.decode(bytes).isEmpty)
    // the same geometry under the budget decodes
    val ok = Avi.decode(Avi.aviWithFrames(1L, 2048, 2048, 2, 1))
    assert(ok.exists(_.frames.length == 2))
  }

  test("luma: identity for gray frames, integer Rec.601 for truecolor") {
    val gray = Avi.decode(Avi.aviWithFrames(2L, 8, 8, 1, 1)).get.frames.head
    assert(Avi.luma(gray).toSeq == gray.pixels.toSeq)
    val rgb = Avi.decode(Avi.aviWithFrames(2L, 8, 8, 1, 3)).get.frames.head
    val lm = Avi.luma(rgb)
    assert(lm.length == 64)
    val exp = (299 * JpegDc.blockVal(Avi.frameSeed(2L, 0), 0, 0, 0) +
      587 * JpegDc.blockVal(Avi.frameSeed(2L, 0), 0, 0, 1) +
      114 * JpegDc.blockVal(Avi.frameSeed(2L, 0), 0, 0, 2)) / 1000
    assert((lm(0) & 0xff) == exp)
  }

  test("sampleFrames serves REAL decoded AVI frames (n-spaced, all " +
    "when n >= count) — the container-video modality is no longer " +
    "the byte-window stub") {
    import org.apache.spark.sql.functions._
    val avi = MediaFixtures.aviMediaFor(7L) // 3 frames
    val decoded = Avi.decode(avi).get
    val all = Multimodal.sampleFramesKernel(avi, 5, 64)
    assert(all.length == decoded.frames.length)
    all.zip(decoded.frames).foreach { case (a, fr) =>
      assert(a.toSeq == Avi.luma(fr).toSeq)
    }
    val two = Multimodal.sampleFramesKernel(avi, 2, 64)
    assert(two.length == 2 &&
      two.head.toSeq == Avi.luma(decoded.frames.head).toSeq)
    // the DataFrame surface wires the kernel in
    val df = spark.range(4, 5).selectExpr("id AS doc_id",
      "avi_media_for_id(id) AS media")
    graft.Graft.init(spark)
    val rows = Multimodal.sampleFrames(df, "media", 8)
      .select(size(col("frames")).as("n")).head()
    assert(rows.getInt(0) == (2 + 4 % 3))
  }

  test("avi_frame_stats kernel matches a direct fold over decoded " +
    "frames and is callable from verbatim SQL") {
    graft.Graft.init(spark)
    val rows = spark.sql(
      """SELECT f.frame, f.width, f.height, f.channels, f.pix_sum
        |FROM (SELECT explode(avi_frame_stats(
        |        avi_media_for_id(CAST(6 AS BIGINT)))) AS f)""".stripMargin)
      .collect()
    val d = Avi.decode(MediaFixtures.aviMediaFor(6L)).get
    assert(rows.length == d.frames.length)
    rows.zipWithIndex.foreach { case (r, f) =>
      val fr = d.frames(f)
      assert(r.getInt(0) == f && r.getInt(1) == fr.width &&
        r.getInt(2) == fr.height && r.getInt(3) == fr.channels)
      assert(r.getLong(4) == fr.pixels.map(_ & 0xff).map(_.toLong).sum)
    }
    // dirty bytes null out
    assert(spark.sql("SELECT avi_frame_stats(CAST('x' AS BINARY)) AS f")
      .head().isNullAt(0))
  }

  test("avi_frame_diffs (scene-cut SAD) matches a direct fold over " +
    "adjacent decoded luma rasters") {
    graft.Graft.init(spark)
    (0L until 6L).foreach { id =>
      val d = Avi.decode(MediaFixtures.aviMediaFor(id)).get
      val rows = spark.sql(
        s"""SELECT d.frame, d.sad
           |FROM (SELECT explode(avi_frame_diffs(
           |        avi_media_for_id(CAST($id AS BIGINT)))) AS d)"""
          .stripMargin).collect()
      assert(rows.length == d.frames.length - 1, s"id=$id")
      val lumas = d.frames.map(Avi.luma)
      rows.zipWithIndex.foreach { case (r, i) =>
        val f = i + 1
        val sad = lumas(f).zip(lumas(f - 1))
          .map { case (b, a) => math.abs((b & 0xff) - (a & 0xff)).toLong }
          .sum
        assert(r.getInt(0) == f && r.getLong(1) == sad, s"id=$id f=$f")
      }
    }
  }

  test("mixed-track round trip: decodeAv recovers every video frame " +
    "AND every PCM16 audio sample from the interleaved 01wb chunks") {
    for (id <- 0L until 8L) {
      val bytes = MediaFixtures.aviAvMediaFor(id)
      val av = Avi.decodeAv(bytes).get
      // video identical to the video-only fixture contract
      val nf = (2 + id % 3).toInt
      assert(av.video.frames.length == nf, s"id=$id")
      val a = av.audio.get
      val aFrames = (40 + math.floorMod(id * 11, 100)).toInt
      val aCh = (1 + id % 2).toInt
      assert(a.channels == aCh && a.sampleRate == (8000 * (1 + id % 3)).toInt)
      assert(a.samples.length == aFrames * aCh, s"id=$id")
      a.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s.toInt == WavPcm.samp(id, i), s"id=$id i=$i")
      }
      // the video-only reader skips the audio chunks: same frames
      val vOnly = Avi.decode(bytes).get
      assert(vOnly.frames.map(_.pixels.toSeq) ==
        av.video.frames.map(_.pixels.toSeq))
    }
  }

  test("decodeAv contract edges: no auds stream -> audio None; " +
    "non-PCM strf -> unrouted; torn sample bytes -> None") {
    val vOnly = MediaFixtures.aviMediaFor(3L)
    val av = Avi.decodeAv(vOnly).get
    assert(av.audio.isEmpty && av.video.frames.nonEmpty)
    val mixed = MediaFixtures.aviAvMediaFor(2L) // stereo: block = 4 bytes
    // flip the strf wFormatTag (PCM=1) to 2: audio must unroute but
    // video still decodes — find the 16-byte WAVEFORMAT after 'auds'
    val tagIdx = {
      val s = mixed.indexOfSlice("auds".getBytes("US-ASCII"))
      val strfTag = mixed.indexOfSlice("strf".getBytes("US-ASCII"), s)
      strfTag + 8
    }
    val nonPcm = mixed.clone(); nonPcm(tagIdx) = 2
    val np = Avi.decodeAv(nonPcm).get
    assert(np.audio.isEmpty && np.video.frames.nonEmpty)
    // shrink the LAST 01wb chunk by 2 bytes (half a stereo block):
    // the reassembled stream tears mid-block -> whole file is dirty
    val lastWb = {
      var i = -1; var at = mixed.indexOfSlice("01wb".getBytes("US-ASCII"))
      while (at >= 0) { i = at
        at = mixed.indexOfSlice("01wb".getBytes("US-ASCII"), at + 1) }
      i
    }
    val torn = java.util.Arrays.copyOf(mixed, mixed.length - 2)
    val oldSize = (torn(lastWb + 4) & 0xff) | ((torn(lastWb + 5) & 0xff) << 8)
    torn(lastWb + 4) = ((oldSize - 2) & 0xff).toByte
    val riffSz = ((torn(4) & 0xff) | ((torn(5) & 0xff) << 8) |
      ((torn(6) & 0xff) << 16) | ((torn(7) & 0xff) << 24)) - 2
    torn(4) = (riffSz & 0xff).toByte; torn(5) = ((riffSz >> 8) & 0xff).toByte
    torn(6) = ((riffSz >> 16) & 0xff).toByte
    torn(7) = ((riffSz >> 24) & 0xff).toByte
    assert(Avi.decodeAv(torn).isEmpty)
  }

  test("avi_av_features (SQL) reduces both tracks to the exact " +
    "integer statistics the oracle re-derives") {
    graft.Graft.init(spark)
    val rows = spark.sql(
      """SELECT f.n_frames, f.pix_sum, f.a_channels, f.a_rate,
        |       f.a_samples, f.a_sum, f.a_abs_sum
        |FROM (SELECT avi_av_features(
        |        avi_av_media_for_id(CAST(5 AS BIGINT))) AS f)""".stripMargin)
      .head()
    val av = Avi.decodeAv(MediaFixtures.aviAvMediaFor(5L)).get
    assert(rows.getInt(0) == av.video.frames.length)
    assert(rows.getLong(1) ==
      av.video.frames.map(_.pixels.map(_ & 0xff).map(_.toLong).sum).sum)
    val a = av.audio.get
    assert(rows.getInt(2) == a.channels && rows.getInt(3) == a.sampleRate)
    assert(rows.getLong(4) == a.samples.length.toLong)
    assert(rows.getLong(5) == a.samples.map(_.toLong).sum)
    assert(rows.getLong(6) == a.samples.map(s => math.abs(s.toLong)).sum)
    // a video-only container has no audio track to featurize: null
    assert(spark.sql(
      "SELECT avi_av_features(avi_media_for_id(CAST(3 AS BIGINT))) AS f")
      .head().isNullAt(0))
    // dirty bytes null out
    assert(spark.sql("SELECT avi_av_features(CAST('x' AS BINARY)) AS f")
      .head().isNullAt(0))
  }

  test("avi_audio_wav bridges container audio into the WAV toolkit: " +
    "the re-wrapped track round-trips through WavPcm.decode and " +
    "wav_stats/wav_windows serve it like any .wav") {
    graft.Graft.init(spark)
    val av = Avi.decodeAv(MediaFixtures.aviAvMediaFor(4L)).get
    val a = av.audio.get
    // direct kernel: decode(re-wrap) == the track
    val wav = graft.functions.AviAudioWav.compute(
      MediaFixtures.aviAvMediaFor(4L))
    val rt = WavPcm.decode(wav).get
    assert(rt.channels == a.channels && rt.sampleRate == a.sampleRate)
    assert(rt.samples.toSeq == a.samples.toSeq)
    // SQL composition: wav_stats over the bridge matches the track
    val st = spark.sql(
      """SELECT wav_stats(avi_audio_wav(
        |  avi_av_media_for_id(CAST(4 AS BIGINT)))) AS s""".stripMargin)
      .head().getStruct(0)
    assert(st.getInt(0) == a.channels && st.getInt(1) == a.sampleRate)
    assert(st.getLong(3) == a.samples.map(_.toLong).sum)
    // a video-only container bridges to null
    assert(spark.sql(
      "SELECT avi_audio_wav(avi_media_for_id(CAST(3 AS BIGINT))) AS w")
      .head().isNullAt(0))
  }

  test("avi_meta triage (r14): header + chunk-table walk only — " +
    "counts agree with the full decode on A/V and video-only " +
    "containers, and no pixel/PCM decode happens (corrupt frame " +
    "payloads still triage)") {
    (0L until 6L).foreach { id =>
      val av = MediaFixtures.aviAvMediaFor(id)
      val m = Avi.meta(av).getOrElse(fail(s"meta None id=$id"))
      val d = Avi.decodeAv(av).get
      assert(m.videoChunks == d.video.frames.length, s"id=$id")
      assert(m.videoChunks == (2 + id % 3).toInt, s"id=$id")
      assert(m.audioChunks == m.videoChunks, s"id=$id (1 01wb/frame)")
      assert(m.audioChannels == d.audio.get.channels, s"id=$id")
      assert(m.audioRate == d.audio.get.sampleRate, s"id=$id")
      assert(m.audioBytes == 2L * d.audio.get.samples.length, s"id=$id")
      assert(m.nStreams == 2 && m.width == d.video.width)
      // video-only: audio fields report the no-audio sentinel
      val vo = Avi.meta(MediaFixtures.aviMediaFor(id)).get
      assert(vo.nStreams == 1 && vo.audioChunks == 0 &&
        vo.audioChannels == 0 && vo.audioRate == 0 && vo.audioBytes == 0L)
    }
    // triage never decodes: corrupting every JPEG payload byte leaves
    // meta intact while the decoder rejects
    val b = MediaFixtures.aviAvMediaFor(1L)
    val m0 = Avi.meta(b).get
    val broken = b.clone()
    // find the first 00dc chunk and zero its payload
    val idx = broken.indexOfSlice("00dc".getBytes("US-ASCII"))
    assert(idx > 0)
    java.util.Arrays.fill(broken, idx + 8, idx + 16, 0.toByte)
    assert(Avi.decodeAv(broken).isEmpty, "decode must reject")
    assert(Avi.meta(broken).contains(m0), "triage must not care")
    // dirty bytes reject, never throw
    assert(Avi.meta("RIFFxxxx".getBytes).isEmpty)
    assert(Avi.meta(b.take(30)).isEmpty)
  }

  test("media_features on AVI bytes is the L1-normalized luminance " +
    "histogram over ALL decoded frames — not the byte-sum fallback") {
    graft.Graft.init(spark)
    val id = 9L
    val feats = spark.sql(
      s"SELECT media_features(avi_media_for_id(CAST($id AS BIGINT)), 16) AS f")
      .head().getSeq[Float](0)
    val d = Avi.decode(MediaFixtures.aviMediaFor(id)).get
    val counts = new Array[Long](16)
    d.frames.foreach { fr =>
      Avi.luma(fr).foreach(b => counts((b & 0xff) * 16 / 256) += 1)
    }
    val total = counts.sum.toFloat
    counts.zip(feats).foreach { case (c, f) =>
      assert(math.abs(c / total - f) < 1e-6f)
    }
  }
}
