package graft.operators

import graft.SparkTestBase

/** Real WAV/PCM codec: decoded samples must equal the contract after a
  * genuine RIFF round-trip; unknown chunks skip; dirty and
  * out-of-subset bytes are rejected, never thrown on. */
class WavPcmSpec extends SparkTestBase {

  test("decode(encode) recovers the exact sample contract — mono and " +
    "stereo, varied frame counts and rates") {
    (0L until 10L).foreach { id =>
      val d = WavPcm.decode(MediaFixtures.wavMediaFor(id)).getOrElse(
        fail(s"id=$id did not decode"))
      assert(d.frames == 100 + (id * 13 % 400))
      assert(d.channels == 1 + id % 2)
      assert(d.sampleRate == 8000 * (1 + id % 3))
      var i = 0
      while (i < d.samples.length) {
        assert(d.samples(i) == WavPcm.samp(id, i), s"id=$id i=$i")
        i += 1
      }
    }
  }

  test("seeded fuzz: 50 random (id, frames, channels, rate) combos " +
    "round-trip bit-exact") {
    val rnd = new scala.util.Random(777)
    (0 until 50).foreach { _ =>
      val id = rnd.nextInt(100000).toLong
      val frames = 1 + rnd.nextInt(2000)
      val ch = 1 + rnd.nextInt(8)
      val rate = 1 + rnd.nextInt(96000)
      val d = WavPcm.decode(WavPcm.wavWithSamples(id, frames, ch, rate)).get
      assert(d.frames == frames && d.channels == ch && d.sampleRate == rate)
      var i = 0
      while (i < d.samples.length) {
        assert(d.samples(i) == WavPcm.samp(id, i),
          s"id=$id frames=$frames ch=$ch i=$i")
        i += 1
      }
    }
  }

  test("unknown RIFF chunks are skipped by size (LIST metadata before " +
    "data), odd sizes padded") {
    val base = WavPcm.wavWithSamples(3L, 50, 2, 8000)
    // splice a LIST chunk (odd payload size -> 1 pad byte) between
    // fmt (ends at offset 12+8+16=36) and data
    val meta = "INFOx".getBytes("US-ASCII") // 5 bytes, odd
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 36)
    out.write("LIST".getBytes("US-ASCII"))
    out.write(Array[Byte](5, 0, 0, 0)) // LE size 5
    out.write(meta); out.write(0) // pad to even
    out.write(base, 36, base.length - 36)
    val spliced = out.toByteArray
    // patch the RIFF size (offset 4): grew by 8 + 5 + 1
    val grown = spliced.length - 8
    spliced(4) = (grown & 0xff).toByte
    spliced(5) = ((grown >> 8) & 0xff).toByte
    val d = WavPcm.decode(spliced).getOrElse(fail("spliced did not decode"))
    assert(d.frames == 50 && d.channels == 2)
    assert((0 until d.samples.length).forall(i =>
      d.samples(i) == WavPcm.samp(3L, i)))
  }

  test("out-of-subset and corrupt bytes are rejected, never thrown on") {
    val good = WavPcm.wavWithSamples(1L, 100, 1, 16000)
    assert(WavPcm.decode(Array[Byte]()).isEmpty)
    assert(WavPcm.decode("RIFFxxxx".getBytes("US-ASCII")).isEmpty)
    assert(WavPcm.decode(good.take(good.length / 2)).isEmpty) // truncated
    // float PCM (format 3) is outside the subset
    val float = good.clone(); float(20) = 3
    assert(WavPcm.decode(float).isEmpty)
    // 8-bit depth is outside the subset
    val depth8 = good.clone(); depth8(34) = 8
    assert(WavPcm.decode(depth8).isEmpty)
    // a data length that is not whole frames
    val ragged = good.clone()
    ragged(40) = ((ragged(40) & 0xff) - 1).toByte
    assert(WavPcm.decode(ragged).isEmpty)
    // PNG bytes are not a WAV
    assert(WavPcm.decode(MediaFixtures.pixelMediaFor(2L)).isEmpty)
  }

  test("wav_stats kernel matches a direct fold over decoded samples " +
    "and is callable from verbatim SQL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.Graft.init(spark)
    val row = spark.sql(
      """SELECT wav_stats(wav_media_for_id(CAST(5 AS BIGINT))) AS st""")
      .select("st.channels", "st.n_frames", "st.samp_sum", "st.samp_energy")
      .head()
    val d = WavPcm.decode(MediaFixtures.wavMediaFor(5L)).get
    val sum = d.samples.map(_.toLong).sum
    val energy = d.samples.map(s => s.toLong * s).sum
    assert(row.getInt(0) == d.channels && row.getLong(1) == d.frames)
    assert(row.getLong(2) == sum && row.getLong(3) == energy)
  }

  test("container-robust dedup: tagged fixtures decode to the seed's " +
    "exact samples, file bytes are all distinct, content hashes collide " +
    "exactly on the seed residue") {
    graft.Graft.init(spark)
    // decode-through-metadata: tagged id 13 carries seed 5's samples
    val tagged = WavPcm.decode(MediaFixtures.wavTaggedMediaFor(13L)).get
    val seed = WavPcm.decode(MediaFixtures.wavMediaFor(5L)).get
    assert(tagged.samples.toSeq == seed.samples.toSeq &&
      tagged.channels == seed.channels && tagged.sampleRate == seed.sampleRate)
    // the containers themselves never collide, the decoded PCM does
    val df = spark.range(0, 24).selectExpr("id",
      "wav_tagged_media_for_id(id) AS media")
    val byteDups = df.selectExpr("xxhash64(media) AS h")
      .groupBy("h").count().filter("count > 1").count()
    assert(byteDups == 0L, "file-level hashing must find nothing")
    val pcmDups = df.selectExpr("xxhash64(wav_pcm_bytes(media).pcm) AS h")
      .groupBy("h").count().filter("count > 1").count()
    assert(pcmDups == 8L, "one colliding group per seed residue")
  }

  test("wav_windows matches a direct per-window fold over channel 0 " +
    "(energy + zero crossings), drops the trailing partial window, " +
    "and is callable from verbatim SQL") {
    graft.Graft.init(spark)
    (0L until 6L).foreach { id =>
      val d = WavPcm.decode(MediaFixtures.wavMediaFor(id)).get
      val w = 64
      val rows = spark.sql(
        s"""SELECT w.win, w.energy, w.zcr
           |FROM (SELECT explode(wav_windows(
           |        wav_media_for_id(CAST($id AS BIGINT)), $w)) AS w)"""
          .stripMargin).collect()
      assert(rows.length == d.frames / w, s"id=$id")
      rows.zipWithIndex.foreach { case (r, wi) =>
        val ch0 = (0 until w).map(i => d.samples((wi * w + i) * d.channels).toLong)
        val energy = ch0.map(v => v * v).sum
        val zcr = ch0.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
        assert(r.getInt(0) == wi && r.getLong(1) == energy &&
          r.getLong(2) == zcr.toLong, s"id=$id win=$wi")
      }
    }
  }

  test("wav_spectral: a pure sinusoid lands on its own bin, the " +
    "centroid tracks it, and the kernel matches a direct DFT fold") {
    graft.Graft.init(spark)
    // hand-build a mono WAV whose channel-0 samples are a clean k=3
    // tone over N=16 windows: v(n) = 1000*cos(2*pi*3*n/16)
    val frames = 64
    val tone = (0 until frames).map { n =>
      math.round(1000.0 * math.cos(2.0 * math.Pi * 3 * n / 16)).toInt
    }
    val bytes = {
      val data = new java.io.ByteArrayOutputStream()
      tone.foreach { v => data.write(v & 0xff); data.write((v >> 8) & 0xff) }
      val pcm = data.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(out)
      def le32(v: Int): Unit = { d.write(v & 0xff); d.write((v >> 8) & 0xff)
        d.write((v >> 16) & 0xff); d.write((v >> 24) & 0xff) }
      def le16(v: Int): Unit = { d.write(v & 0xff); d.write((v >> 8) & 0xff) }
      d.writeBytes("RIFF"); le32(36 + pcm.length); d.writeBytes("WAVE")
      d.writeBytes("fmt "); le32(16); le16(1); le16(1); le32(8000)
      le32(16000); le16(2); le16(16)
      d.writeBytes("data"); le32(pcm.length); d.write(pcm)
      out.toByteArray
    }
    val decoded = WavPcm.decode(bytes).get
    assert(decoded.frames == frames && decoded.channels == 1)
    val rows = graft.functions.WavSpectral.compute(bytes, 16)
    assert(rows != null && rows.numElements() == frames / 16)
    (0 until rows.numElements()).foreach { w =>
      val r = rows.getStruct(w, 3)
      assert(r.getInt(1) == 3, s"win $w dominant bin")
      // rounding to the int grid leaks tiny energy into other bins;
      // the centroid must still sit within 0.05 of the tone bin
      assert(math.abs(r.getDouble(2) - 3.0) < 0.05, s"win $w centroid")
    }
    // SQL surface + null on dirty bytes
    val viaSql = spark.sql(
      "SELECT size(wav_spectral(wav_media_for_id(CAST(2 AS BIGINT)), 16))")
      .head().getInt(0)
    val d2 = WavPcm.decode(MediaFixtures.wavMediaFor(2L)).get
    assert(viaSql == d2.frames / 16)
    assert(graft.functions.WavSpectral.compute("junk".getBytes, 16) == null)
  }

  test("gain-variant fixtures: three dedup tiers tell three stories — " +
    "bytes find nothing, PCM groups same-gain only, the spectral " +
    "fingerprint groups across gains") {
    graft.Graft.init(spark)
    import spark.implicits._
    val docs = (0L until 48L).toDF("doc_id")
    val media = docs.selectExpr("doc_id",
      "wav_gain_media_for_id(doc_id) AS media")
    // tier 1: file bytes — all distinct (the LIST tag)
    val byteGroups = media.selectExpr("xxhash64(media) AS h")
      .groupBy("h").count().filter("count > 1").count()
    assert(byteGroups == 0L)
    // tier 2: decoded PCM — groups only same (seed, gain). Over ids
    // 0..47 the pair (id%6, id%4) has period lcm(6,4)=12, so exactly
    // 12 classes — each seed still spans TWO gains, which PCM hashing
    // keeps apart and the fingerprint must unite
    val pcmClasses = media
      .selectExpr("xxhash64(wav_pcm_bytes(media).pcm) AS h")
      .select("h").distinct().count()
    assert(pcmClasses == 12L, s"pcm classes $pcmClasses")
    // tier 3: spectral fingerprint — invariant under gain, so every id
    // with the same seed lands in one group (<= 6 classes; seeds with
    // identical dominant-bin tracks may merge further)
    val fpRows = media.selectExpr("doc_id",
      "array_join(transform(wav_spectral(media, 16), " +
        "w -> cast(w.dom_bin AS string)), '-') AS fp")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val bySeed = fpRows.groupBy(_._1 % 6)
    bySeed.foreach { case (seed, rows) =>
      assert(rows.map(_._2).distinct.length == 1,
        s"seed $seed gain variants must share one fingerprint")
      assert(rows.length == 8)
    }
  }

  test("wav_spectral_flux spikes exactly at a tone change and is near " +
    "zero within steady tones") {
    // 8 windows of a k=2 tone then 8 windows of k=5: flux must spike
    // only at the boundary window (index 8)
    val frames = 256
    val tone = (0 until frames).map { n =>
      val k = if (n < 128) 2 else 5
      math.round(1200.0 * math.cos(2.0 * math.Pi * k * (n % 16) / 16)).toInt
    }
    val data = new java.io.ByteArrayOutputStream()
    tone.foreach { v => data.write(v & 0xff); data.write((v >> 8) & 0xff) }
    val pcm = data.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    def le32(v: Int): Unit = { d.write(v & 0xff); d.write((v >> 8) & 0xff)
      d.write((v >> 16) & 0xff); d.write((v >> 24) & 0xff) }
    def le16(v: Int): Unit = { d.write(v & 0xff); d.write((v >> 8) & 0xff) }
    d.writeBytes("RIFF"); le32(36 + pcm.length); d.writeBytes("WAVE")
    d.writeBytes("fmt "); le32(16); le16(1); le16(1); le32(8000)
    le32(16000); le16(2); le16(16)
    d.writeBytes("data"); le32(pcm.length); d.write(pcm)
    val rows = graft.functions.WavSpectralFlux.compute(out.toByteArray, 16)
    assert(rows != null && rows.numElements() == 15)
    val flux = (0 until 15).map(i => rows.getStruct(i, 2).getDouble(1))
    val boundary = flux(7) // win index 8 vs 7 (first k=5 window)
    assert(boundary > 10000.0, s"boundary flux $boundary")
    flux.zipWithIndex.filter(_._2 != 7).foreach { case (f, i) =>
      assert(f < boundary / 100, s"steady flux $f at pair $i")
    }
    // short clips (fewer than 2 windows) give an empty array, not null
    val short = graft.operators.WavPcm.wavWithSamples(1L, 20, 1, 8000)
    assert(graft.functions.WavSpectralFlux.compute(short, 16)
      .numElements() == 0)
  }

  test("wav_resample: identity rate is lossless, 2x upsampling of a " +
    "ramp interpolates exact midpoints, output re-decodes everywhere") {
    val src = WavPcm.wavWithSamples(4L, 200, 2, 16000)
    val d0 = WavPcm.decode(src).get
    // identity: every output frame lands exactly on a source frame
    val same = WavPcm.decode(WavPcm.resample(src, 16000).get).get
    assert(same.sampleRate == 16000 && same.frames == d0.frames)
    assert(same.samples.toSeq == d0.samples.toSeq)
    // 2x a pure ramp: odd output frames are exact midpoints
    val ramp = (0 until 100).map(i => (i * 10).toShort).toArray
    val rampWav = WavPcm.wavFromSamples(1, 8000, ramp)
    val up = WavPcm.decode(WavPcm.resample(rampWav, 16000).get).get
    assert(up.frames == 99 * 2 + 1)
    (0 until up.frames).foreach { j =>
      val want = if (j % 2 == 0) ramp(j / 2).toInt
        else (ramp(j / 2) + ramp(j / 2 + 1)) / 2
      assert(up.samples(j).toInt == want, s"j=$j")
    }
    // downsample length contract + the result feeds existing kernels
    val down = WavPcm.resample(src, 6000).get
    val dd = WavPcm.decode(down).get
    assert(dd.frames == (200 - 1) * 6000 / 16000 + 1 && dd.channels == 2)
    assert(graft.functions.WavStats.statsToRow(down) != null)
    assert(graft.functions.WavSpectral.compute(down, 16) != null)
    // dirty input -> None
    assert(WavPcm.resample("junk".getBytes, 8000).isEmpty)
  }

  test("vad: segments match a brute-force replay of the fixture " +
    "contract — boundaries, energies, clip counts") {
    for (id <- 0L to 7L) {
      val segs = WavPcm.vad(MediaFixtures.wavVadMediaFor(id), 64, 10000).get
      val ch = (1 + id % 2).toInt
      val nWin = (12 + id % 6).toInt
      // reference: active windows from the section contract, merged
      val active = (0 until nWin).filter(w => (w + id) % 4 < 2)
      val runs = active.foldLeft(List.empty[List[Int]]) {
        case (acc, w) if acc.nonEmpty && acc.head.head == w - 1 =>
          (w :: acc.head) :: acc.tail
        case (acc, w) => List(w) :: acc
      }.map(_.reverse).reverse
      assert(segs.length == runs.length, s"id=$id")
      segs.zip(runs).zipWithIndex.foreach { case ((s, run), k) =>
        assert(s.seg == k && s.startWin == run.head &&
          s.nWin == run.length, s"id=$id seg=$k")
        var ss = 0L
        var clip = 0
        for (w <- run; k2 <- 0 until 64; c <- 0 until ch) {
          val v = WavPcm.vadSamp(id, 64 * w + k2, c)
          ss += v.toLong * v
          if (v == 32767 || v == -32768) clip += 1
        }
        assert(s.sumSq == ss && s.nClip == clip, s"id=$id seg=$k")
      }
    }
  }

  test("normalize: peak lands exactly on target, the sign-split " +
    "contract holds per sample, silence passes through, and the " +
    "result round-trips every kernel") {
    val b = MediaFixtures.wavMediaFor(5L)
    val d0 = WavPcm.decode(b).get
    val maxAbs = d0.samples.map(s => math.abs(s.toLong)).max
    val n = WavPcm.normalize(b, 30000).get
    val d1 = WavPcm.decode(n).get
    assert(d1.channels == d0.channels && d1.frames == d0.frames)
    assert(d1.samples.map(s => math.abs(s.toInt)).max == 30000)
    d0.samples.zip(d1.samples).foreach { case (v, w) =>
      val s = math.abs(v.toLong) * 30000 / maxAbs
      assert(w.toLong == (if (v < 0) -s else s))
    }
    // silence: unchanged
    val quiet = WavPcm.wavFromSamples(1, 8000, Array.fill[Short](100)(0))
    val q = WavPcm.decode(WavPcm.normalize(quiet, 30000).get).get
    assert(q.samples.forall(_ == 0))
    // a full-scale negative clip normalizes without overflow
    val hot = WavPcm.wavFromSamples(1, 8000,
      Array[Short](-32768, 100, -100))
    val h = WavPcm.decode(WavPcm.normalize(hot, 32767).get).get
    assert(h.samples(0) == -32767)
    assert(WavPcm.normalize("junk".getBytes, 30000).isEmpty)
  }

  test("vad edges: pure silence is empty, all-loud is one segment, " +
    "a partial tail window still counts, dirty bytes -> None") {
    val silence = WavPcm.wavFromSamples(1, 8000, Array.fill[Short](640)(2))
    assert(WavPcm.vad(silence, 64, 100).get.isEmpty)
    val loud = WavPcm.wavFromSamples(1, 8000,
      Array.tabulate[Short](640)(i => (if (i % 2 == 0) 1500 else -1500)))
    val one = WavPcm.vad(loud, 64, 10000).get
    assert(one.length == 1 && one(0).startWin == 0 && one(0).nWin == 10)
    // 650 frames at win=64: an 11th, 10-frame window — loud too
    val tail = WavPcm.wavFromSamples(1, 8000,
      Array.tabulate[Short](650)(i => (if (i % 2 == 0) 1500 else -1500)))
    val t = WavPcm.vad(tail, 64, 10000).get
    assert(t.length == 1 && t(0).nWin == 11)
    assert(t(0).sumSq == 650L * 1500 * 1500)
    assert(WavPcm.vad("junk".getBytes, 64, 100).isEmpty)
  }
}
