package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The Matroska/WebM demuxer (r13): every container shape the writer
  * emits must demux to the SAME frames the IVF container carries (the
  * VP8 decode itself is pinned elsewhere — byte-exact libwebp
  * keyframes + the spec-math MC interframes), the triage must read
  * the registry fields, and everything outside the documented subset
  * must reject with None, never throw. */
class WebmSpec extends AnyFunSuite {

  private lazy val ivfFrames =
    Vp8Inter.decodeIvf(Vp8Fixtures.ivfFor(0L)).get

  test("all four container-shape variants demux + decode to exactly " +
    "the IVF fixture's frames (clusters split, Void padding, " +
    "open-size Segment, single cluster)") {
    (0L until 4L).foreach { id =>
      val b = Vp8Fixtures.webmFor(id)
      val m = Webm.meta(b).getOrElse(fail(s"meta None (id=$id)"))
      assert(m.docType == "webm" && m.vp8Track == 1, s"id=$id")
      assert(m.width == 48 && m.height == 32, s"id=$id")
      assert(m.nBlocks == 3 && m.keyframes == 1 && m.interframes == 2,
        s"id=$id: $m")
      assert(m.nClusters == (if (id % 4 == 1) 3
        else if (id % 4 == 3) 1 else 2), s"id=$id clusters")
      assert(m.timecodeScale == 1000000L)
      val frames = Webm.decode(b).getOrElse(fail(s"decode None id=$id"))
      assert(frames.length == ivfFrames.length)
      frames.zip(ivfFrames).zipWithIndex.foreach { case ((a, e), i) =>
        assert(java.util.Arrays.equals(a.y, e.y), s"id=$id Y frame $i")
        assert(java.util.Arrays.equals(a.u, e.u), s"id=$id U frame $i")
        assert(java.util.Arrays.equals(a.v, e.v), s"id=$id V frame $i")
      }
    }
  }

  test("matroska DocType parses and is reported distinctly; " +
    "media_kind splits webm vs matroska on the DocType") {
    val (w, h, fr) = (48, 32,
      Webm.vp8Blocks(Vp8Fixtures.webmFor(0L)).get)
    val webm = Vp8Fixtures.webmFor(0L)
    val mkv = Webm.build(48, 32,
      fr.map(b => webm.slice(b.off, b.off + b.len)),
      docType = "matroska")
    assert(Webm.meta(mkv).get.docType == "matroska")
    assert(graft.functions.MediaKind.kind(webm) == "webm")
    assert(graft.functions.MediaKind.kind(mkv) == "matroska")
  }

  test("subset boundaries reject with None: lacing flags, a " +
    "container/frame keyframe-flag mismatch, a truncated cluster, " +
    "and a mux with no VP8 track") {
    val good = Vp8Fixtures.webmFor(0L)
    // flip the lacing bits of the first SimpleBlock: find its flags
    // byte via the parser's own block table (flags = payload off - 1)
    val blocks = Webm.vp8Blocks(good).get
    val laced = good.clone()
    laced(blocks.head.off - 1) =
      (laced(blocks.head.off - 1) | 0x02).toByte
    assert(Webm.decode(laced).isEmpty, "lacing must reject")
    // keyframe flag lies about the frame tag
    val lying = good.clone()
    lying(blocks.head.off - 1) =
      (lying(blocks.head.off - 1) & 0x7f).toByte
    assert(Webm.meta(lying).nonEmpty, "meta still parses")
    assert(Webm.decode(lying).isEmpty,
      "container/frame keyframe disagreement must reject")
    // truncation anywhere rejects
    assert(Webm.decode(good.dropRight(5)).isEmpty)
    assert(Webm.meta(good.take(20)).isEmpty)
    // a V_VP9 mux has no decodable track here
    val fr = blocks.map(b => good.slice(b.off, b.off + b.len))
    val vp9ish = {
      val b = Webm.build(48, 32, fr)
      val i = b.indexOfSlice("V_VP8".getBytes("US-ASCII"))
      b(i + 4) = '9'.toByte; b
    }
    assert(Webm.decode(vp9ish).isEmpty, "no VP8 track -> None")
    assert(Webm.meta(vp9ish).get.vp8Track == -1)
  }

  test("the SQL surface: webm_frames equals vp8_ivf_frames row for " +
    "row on the shared sequence; webm_meta triages at scan cost") {
    val wf = graft.functions.WebmFrames.compute(Vp8Fixtures.webmFor(0L))
    val vf = graft.functions.Vp8IvfFrames.compute(Vp8Fixtures.ivfFor(0L))
    assert(wf != null && vf != null)
    assert(wf.numElements() == vf.numElements())
    var i = 0
    while (i < wf.numElements()) {
      assert(wf.array(i) == vf.array(i), s"row $i")
      i += 1
    }
  }

  test("audio-track triage (r14): TrackEntry/Audio codec/channels/" +
    "rate parse from the EBML walk, packets are counted but never " +
    "decoded, and the video track demuxes identically around them") {
    (4L until 8L).foreach { id =>
      val b = Vp8Fixtures.webmFor(id)
      val m = Webm.meta(b).getOrElse(fail(s"meta None (id=$id)"))
      assert(m.nTracks == 2 && m.audioTrack == 3, s"id=$id: $m")
      assert(m.audioCodec ==
        (if (id % 2 == 0) "A_VORBIS" else "A_OPUS"), s"id=$id")
      assert(m.audioChannels == 1 + (id % 2).toInt, s"id=$id")
      assert(m.audioRate ==
        (if (id % 2 == 0) 44100 else 48000), s"id=$id")
      assert(m.nAudioBlocks == 2 + (id % 3).toInt, s"id=$id")
      // the video half is untouched by the interleaved audio
      assert(m.vp8Track == 1 && m.nBlocks == 3 && m.keyframes == 1)
      val avFrames = Webm.decode(b).getOrElse(fail(s"decode id=$id"))
      val plain = Webm.decode(Vp8Fixtures.webmFor(id % 4)).get
      avFrames.zip(plain).foreach { case (a, e) =>
        assert(java.util.Arrays.equals(a.y, e.y), s"id=$id")
      }
    }
    // a video-only mux reports the no-audio sentinel row
    val m0 = Webm.meta(Vp8Fixtures.webmFor(0L)).get
    assert(m0.audioTrack == -1 && m0.audioCodec == "" &&
      m0.audioChannels == 0 && m0.audioRate == 0 && m0.nAudioBlocks == 0)
    // splicing a WIDER SamplingFrequency element into the mux without
    // fixing the enclosing Audio/TrackEntry sizes must reject (the
    // structural validator stance), never misread neighboring bytes
    val av = Vp8Fixtures.webmFor(4L)
    val i4 = av.indexOfSlice(Array(0xB5.toByte, 0x84.toByte))
    assert(i4 > 0, "4-byte SamplingFrequency element present")
    val bits = java.lang.Double.doubleToLongBits(44100.0)
    val wide = av.take(i4) ++ Array(0xB5.toByte, 0x88.toByte) ++
      (0 until 8).map(j => ((bits >> (56 - 8 * j)) & 0xff).toByte) ++
      av.drop(i4 + 6)
    // the parent TrackEntry/Audio sizes no longer match -> the walk
    // must reject rather than misread (structural validator stance)
    assert(Webm.meta(wide).isEmpty)
  }

  test("clusters BEFORE the Tracks element (r17): Matroska orders " +
    "nothing at segment level, so audioPackets must resolve the track " +
    "first and then extract — not gate a single forward walk") {
    val orig = graft.operators.VorbisEnc.webmFixture(16000L, 5, 9L)
    val (codec0, cp0, pk0) =
      Webm.audioPackets(orig).getOrElse(fail("control demux"))
    assert(pk0.nonEmpty)
    // reorder the segment's top-level children: move ALL Clusters
    // ahead of everything else (EBML elements are self-delimiting, so
    // byte-level reordering of siblings is structurally valid)
    def vlen(first: Int): Int = {
      var m = 0x80; var n = 1
      while (n <= 8 && (first & m) == 0) { m >>= 1; n += 1 }
      n
    }
    def readId(b: Array[Byte], p: Int): (Long, Int) = {
      val n = vlen(b(p) & 0xff)
      var v = 0L
      (0 until n).foreach(i => v = (v << 8) | (b(p + i) & 0xff))
      (v, n)
    }
    def readSize(b: Array[Byte], p: Int): (Long, Int) = {
      val n = vlen(b(p) & 0xff)
      var v = (b(p) & 0xff & (0xff >> n)).toLong
      (1 until n).foreach(i => v = (v << 8) | (b(p + i) & 0xff))
      (v, n)
    }
    // skip the EBML header, enter the Segment
    val (ebmlId, en) = readId(orig, 0)
    assert(ebmlId == 0x1A45DFA3L)
    val (ebmlSz, esn) = readSize(orig, en)
    var p = en + esn + ebmlSz.toInt
    val (segId, sn) = readId(orig, p)
    assert(segId == 0x18538067L)
    val (segSz, ssn) = readSize(orig, p + sn)
    val segStart = p + sn + ssn
    val segEnd = segStart + segSz.toInt
    // collect top-level child spans
    var q = segStart
    val clusters = Vector.newBuilder[Array[Byte]]
    val rest = Vector.newBuilder[Array[Byte]]
    while (q < segEnd) {
      val (cid, cn) = readId(orig, q)
      val (csz, csn) = readSize(orig, q + cn)
      val end = q + cn + csn + csz.toInt
      val span = java.util.Arrays.copyOfRange(orig, q, end)
      if (cid == 0x1F43B675L) clusters += span else rest += span
      q = end
    }
    assert(clusters.result().nonEmpty, "fixture has clusters")
    val reordered = orig.slice(0, segStart) ++
      clusters.result().flatten ++ rest.result().flatten
    assert(reordered.length == orig.length, "pure reordering")
    val (codec1, cp1, pk1) = Webm.audioPackets(reordered)
      .getOrElse(fail("clusters-first demux must succeed"))
    assert(codec1 == codec0)
    assert(cp1.toSeq == cp0.toSeq)
    assert(pk1.length == pk0.length,
      "leading clusters' packets must not be dropped")
    pk1.zip(pk0).foreach { case (a, e) =>
      assert(java.util.Arrays.equals(a, e))
    }
  }

  test("subtitle track (r13): S_TEXT BlockGroup cues demux to " +
    "(start_ms, end_ms, UTF-8 text) without disturbing the video " +
    "track; a video-only mux reports no subtitle surface") {
    val b = Vp8Fixtures.webmSubsFor(5L) // 4 cues, offsets 5%7=5, 5%5=0
    val m = Webm.meta(b).get
    assert(m.nTracks == 2 && m.subTrack == 2 && m.nCues == 4, s"$m")
    assert(m.vp8Track == 1 && m.nBlocks == 3 && m.keyframes == 1)
    val cues = Webm.subtitleCues(b).get
    assert(cues.length == 4)
    cues.zipWithIndex.foreach { case ((s0, e0, txt), k) =>
      assert(s0 == 900L * k + 200L, s"cue $k start")
      assert(e0 == s0 + 500L, s"cue $k end")
      assert(txt == s"cue 5 $k \u00fc", s"cue $k text")
    }
    // the video track decodes identically with the cues interleaved
    val withSubs = Webm.decode(b).get
    val plain = Webm.decode(Vp8Fixtures.webmFor(0L)).get
    withSubs.zip(plain).foreach { case (a, e) =>
      assert(java.util.Arrays.equals(a.y, e.y))
    }
    // no subtitle track -> None (not an empty list)
    assert(Webm.subtitleCues(Vp8Fixtures.webmFor(0L)).isEmpty)
    // truncating inside a BlockGroup rejects the whole parse
    assert(Webm.meta(b.dropRight(3)).isEmpty)
  }

}
