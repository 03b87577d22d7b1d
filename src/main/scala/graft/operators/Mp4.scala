package graft.operators

/** REAL MP4 / ISO-BMFF container codec (public spec: ISO/IEC
  * 14496-12) — the container a video crawl actually contains. The
  * walk is fully real: box grammar with 32/64-bit sizes, `moov`
  * hierarchy, per-track `tkhd`/`mdhd`/`hdlr`/`stsd` parsing, and
  * complete sample-table resolution (`stts` timing, `stsc`
  * sample-to-chunk runs, `stsz` sizes, `stco`/`co64` chunk offsets →
  * absolute byte ranges into `mdat`).
  *
  * Two surfaces, mirroring what a 100 TB pipeline needs:
  *  - [[meta]]: typed metadata for EVERY track regardless of codec —
  *    fourcc, dimensions, channel count/sample rate (audio entries),
  *    timescale, duration, sample count. An `avc1`/`hvc1`/`mp4a`
  *    track the sandbox cannot entropy-decode still yields its full
  *    container metadata (the honest codec seam shrinks to the
  *    entropy layer only).
  *  - [[decode]]: REAL per-frame pixel decode for motion-JPEG tracks
  *    (sample entry `jpeg`/`mjpa` — every sample is one complete
  *    baseline JPEG, decoded by [[JpegDc]]), the same family the AVI
  *    codec serves. Sample byte ranges come from the real
  *    stsc/stsz/stco resolution, so a run-length slip in the
  *    sample-to-chunk table reads the wrong bytes and fails the
  *    per-frame oracle.
  *
  * Pure `Array[Byte] => Option[...]` kernels: dirty bytes → None,
  * never an exception; every size/offset is Long-validated before
  * use; recursion depth is capped (the real grammar nests ≤ 6 —
  * moov/trak/mdia/minf/stbl — a crafted blob cannot stack-overflow
  * past the Exception contract, the [[Avi]] lesson).
  *
  * Reference capability: binary media objects per document
  * (01_simple.ipynb cell 29, `"objects": True`).
  */
object Mp4 {

  /** One track's container metadata, codec-agnostic. Video entries
    * carry width/height; audio entries carry channels/sampleRate;
    * the rest are zero. */
  final case class Track(
      trackId: Int, handler: String, codec: String,
      width: Int, height: Int, channels: Int, sampleRate: Int,
      timescale: Int, duration: Long, nSamples: Int)

  /** Decoded MJPEG track: container dims from the sample entry, the
    * media timescale, and one fully-decoded raster per sample. */
  final case class Decoded(
      width: Int, height: Int, timescale: Int,
      frames: Vector[PngPixels.Decoded])

  /** ftyp-led ISO-BMFF file — the dispatch predicate. */
  def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  def meta(bytes: Array[Byte]): Option[Vector[Track]] = {
    try meta0(bytes)
    catch { case _: Exception => None }
  }

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decode0(bytes)
    catch { case _: Exception => None }
  }

  // ---------------------------------------------------------------
  // parsing
  // ---------------------------------------------------------------

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  private final class Malformed extends Exception

  /** Per-track parse state while walking one `trak`. */
  private final class TrackState {
    var trackId = 0
    var handler = ""
    var codec = ""
    var width = 0; var height = 0
    var channels = 0; var sampleRate = 0
    var timescale = 0; var duration = 0L
    var sampleSizes: Array[Long] = null // resolved from stsz
    var uniformSize = 0L
    var nSamples = 0
    var chunkOffsets: Array[Long] = null
    var stsc: Array[(Long, Long)] = null // (firstChunk, samplesPerChunk)
  }

  /** Iterate the boxes of [from, until); yields (type, bodyFrom,
    * bodyUntil). Long-validated; malformed sizes throw. */
  private def boxes(b: Array[Byte], from: Long, until: Long)(
      f: (String, Long, Long) => Unit): Unit = {
    var i = from
    while (i + 8 <= until) {
      val size0 = be32(b, i.toInt)
      val typ = fourcc(b, i.toInt + 4)
      var header = 8L
      val size: Long =
        if (size0 == 1) {
          if (i + 16 > until) throw new Malformed
          header = 16L
          be64(b, i.toInt + 8)
        } else if (size0 == 0) until - i
        else size0
      if (size < header || i + size > until) throw new Malformed
      f(typ, i + header, i + size)
      i += size
    }
    if (i != until) throw new Malformed
  }

  private def parseTracks(b: Array[Byte]): Vector[TrackState] = {
    if (!isMp4(b)) throw new Malformed
    val tracks = Vector.newBuilder[TrackState]
    // depth-capped recursion into the container boxes we understand
    def walk(from: Long, until: Long, depth: Int, trk: TrackState): Unit = {
      if (depth > 8) throw new Malformed
      boxes(b, from, until) { (typ, f, u) =>
        typ match {
          case "moov" if trk == null => walk(f, u, depth + 1, null)
          case "trak" if trk == null =>
            val t = new TrackState
            walk(f, u, depth + 1, t)
            tracks += t
          case "mdia" | "minf" | "stbl" if trk != null =>
            walk(f, u, depth + 1, trk)
          case "tkhd" if trk != null => parseTkhd(b, f, u, trk)
          case "mdhd" if trk != null => parseMdhd(b, f, u, trk)
          case "hdlr" if trk != null =>
            if (u - f < 12) throw new Malformed
            trk.handler = fourcc(b, f.toInt + 8)
          case "stsd" if trk != null => parseStsd(b, f, u, trk)
          case "stsz" if trk != null => parseStsz(b, f, u, trk)
          case "stsc" if trk != null => parseStsc(b, f, u, trk)
          case "stco" if trk != null => parseStco(b, f, u, trk, wide = false)
          case "co64" if trk != null => parseStco(b, f, u, trk, wide = true)
          case _ => () // mdat, free, ftyp, stts, vmhd, dinf, udta, ...
        }
      }
    }
    walk(0L, b.length.toLong, 0, null)
    tracks.result()
  }

  private def parseTkhd(b: Array[Byte], f: Long, u: Long, t: TrackState): Unit = {
    val version = b(f.toInt) & 0xff
    val base = if (version == 1) f + 4 + 16 else f + 4 + 8
    if (u - base < 4) throw new Malformed
    t.trackId = be32(b, base.toInt).toInt
    // width/height are the LAST 8 bytes of the box, 16.16 fixed point
    if (u - f >= 8) {
      t.width = (be32(b, (u - 8).toInt) >> 16).toInt
      t.height = (be32(b, (u - 4).toInt) >> 16).toInt
    }
  }

  private def parseMdhd(b: Array[Byte], f: Long, u: Long, t: TrackState): Unit = {
    val version = b(f.toInt) & 0xff
    if (version == 1) {
      if (u - f < 4 + 16 + 12) throw new Malformed
      t.timescale = be32(b, (f + 20).toInt).toInt
      t.duration = be64(b, (f + 24).toInt)
    } else {
      if (u - f < 4 + 8 + 8) throw new Malformed
      t.timescale = be32(b, (f + 12).toInt).toInt
      t.duration = be32(b, (f + 16).toInt)
    }
  }

  private def parseStsd(b: Array[Byte], f: Long, u: Long, t: TrackState): Unit = {
    if (u - f < 8) throw new Malformed
    val n = be32(b, (f + 4).toInt)
    if (n < 1) return
    // first sample entry: size(4) format(4) reserved(6) dataRefIdx(2)
    val e = f + 8
    if (u - e < 16) throw new Malformed
    val esize = be32(b, e.toInt)
    if (esize < 16 || e + esize > u) throw new Malformed
    t.codec = fourcc(b, (e + 4).toInt)
    if (t.handler == "vide" && esize >= 36) {
      // VisualSampleEntry: +16 predefined/reserved, then width/height
      t.width = be16(b, (e + 32).toInt)
      t.height = be16(b, (e + 34).toInt)
    } else if (t.handler == "soun" && esize >= 36) {
      // AudioSampleEntry: reserved(8) channels(2) samplesize(2)
      // predefined(2) reserved(2) samplerate(16.16)
      t.channels = be16(b, (e + 24).toInt)
      t.sampleRate = (be32(b, (e + 32).toInt) >> 16).toInt
    }
  }

  private def parseStsz(b: Array[Byte], f: Long, u: Long, t: TrackState): Unit = {
    if (u - f < 12) throw new Malformed
    val uniform = be32(b, (f + 4).toInt)
    val count = be32(b, (f + 8).toInt)
    if (count > Int.MaxValue || count < 0) throw new Malformed
    t.nSamples = count.toInt
    if (uniform != 0) { t.uniformSize = uniform; t.sampleSizes = null }
    else {
      if (u - f - 12 < count * 4) throw new Malformed
      val sizes = new Array[Long](count.toInt)
      var i = 0
      while (i < count) { sizes(i) = be32(b, (f + 12 + 4L * i).toInt); i += 1 }
      t.sampleSizes = sizes
    }
  }

  private def parseStsc(b: Array[Byte], f: Long, u: Long, t: TrackState): Unit = {
    if (u - f < 8) throw new Malformed
    val count = be32(b, (f + 4).toInt)
    if (u - f - 8 < count * 12 || count > (1 << 22)) throw new Malformed
    val runs = new Array[(Long, Long)](count.toInt)
    var i = 0
    while (i < count) {
      val o = f + 8 + 12L * i
      runs(i) = (be32(b, o.toInt), be32(b, (o + 4).toInt))
      i += 1
    }
    t.stsc = runs
  }

  private def parseStco(b: Array[Byte], f: Long, u: Long, t: TrackState,
      wide: Boolean): Unit = {
    if (u - f < 8) throw new Malformed
    val count = be32(b, (f + 4).toInt)
    val w = if (wide) 8 else 4
    if (u - f - 8 < count * w || count > (1 << 24)) throw new Malformed
    val offs = new Array[Long](count.toInt)
    var i = 0
    while (i < count) {
      offs(i) = if (wide) be64(b, (f + 8 + 8L * i).toInt)
        else be32(b, (f + 8 + 4L * i).toInt)
      i += 1
    }
    t.chunkOffsets = offs
  }

  private def meta0(b: Array[Byte]): Option[Vector[Track]] = {
    val ts = parseTracks(b)
    if (ts.isEmpty) return None
    Some(ts.map(t => Track(t.trackId, t.handler, t.codec, t.width, t.height,
      t.channels, t.sampleRate, t.timescale, t.duration, t.nSamples)))
  }

  /** Absolute (from, until) byte range of every sample of a track, in
    * sample order, from the real stsc/stsz/stco resolution. */
  private def sampleRanges(t: TrackState, fileLen: Long): Array[(Long, Long)] = {
    if (t.chunkOffsets == null || t.stsc == null || t.nSamples <= 0)
      throw new Malformed
    if (t.sampleSizes == null && t.uniformSize <= 0) throw new Malformed
    val out = new Array[(Long, Long)](t.nSamples)
    var sample = 0
    var run = 0
    var chunk = 1L // 1-based chunk index
    if (t.stsc.isEmpty || t.stsc(0)._1 != 1) throw new Malformed
    while (sample < t.nSamples) {
      // a run applies from its firstChunk until the next run's
      // firstChunk (exclusive) — the standard run expansion
      while (run + 1 < t.stsc.length && t.stsc(run + 1)._1 <= chunk) run += 1
      val perChunk = t.stsc(run)._2
      if (perChunk <= 0 || chunk > t.chunkOffsets.length) throw new Malformed
      var off = t.chunkOffsets((chunk - 1).toInt)
      var i = 0L
      while (i < perChunk && sample < t.nSamples) {
        val size = if (t.sampleSizes != null) t.sampleSizes(sample) else t.uniformSize
        if (size < 0 || off < 0 || off + size > fileLen) throw new Malformed
        out(sample) = (off, off + size)
        off += size
        sample += 1
        i += 1
      }
      chunk += 1
    }
    out
  }

  /** Sample-entry fourccs whose samples are complete baseline JPEGs. */
  private def isMjpegCodec(c: String): Boolean =
    c == "jpeg" || c == "mjpa" || c == "AVDJ"

  private def decode0(b: Array[Byte]): Option[Decoded] = {
    val ts = parseTracks(b)
    val video = ts.find(t => t.handler == "vide" && isMjpegCodec(t.codec))
      .getOrElse(return None)
    val ranges = sampleRanges(video, b.length.toLong)
    val frames = Vector.newBuilder[PngPixels.Decoded]
    // cumulative decode budget across frames — per-frame caps don't
    // bound a container (the Avi lesson)
    var decodedBytes = 0L
    var i = 0
    while (i < ranges.length) {
      val (from, until) = ranges(i)
      if (until - from > Int.MaxValue) return None
      val sample = java.util.Arrays.copyOfRange(b, from.toInt, until.toInt)
      val d = JpegDc.decode(sample).getOrElse(return None)
      decodedBytes += d.pixels.length.toLong
      if (decodedBytes > PngPixels.MaxDecodedBytes) return None
      frames += d
      i += 1
    }
    Some(Decoded(video.width, video.height, video.timescale, frames.result()))
  }

  // ---------------------------------------------------------------- writer
  //
  // Spec-complete files a standards-compliant demuxer accepts:
  // ftyp + mdat (samples first, so chunk offsets are known while
  // writing moov) + moov with full sample tables. The sample-to-chunk
  // table is deliberately non-trivial — the first chunk holds two
  // samples, later chunks one — so the reader's stsc run expansion is
  // actually exercised by every fixture.

  private final class Buf {
    val o = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { o.write((v >> 8) & 0xff); o.write(v & 0xff) }
    def u32(v: Long): Unit = {
      o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
      o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
    }
    def tag(s: String): Unit = o.write(s.getBytes("US-ASCII"))
    def bytes(b: Array[Byte]): Unit = o.write(b, 0, b.length)
    def box(typ: String, body: Array[Byte]): Unit = {
      u32(8L + body.length); tag(typ); bytes(body)
    }
    def result: Array[Byte] = o.toByteArray
  }

  private def fullBox(version: Int, body: Buf => Unit): Array[Byte] = {
    val b = new Buf
    b.u32(version.toLong << 24) // version + zero flags
    body(b)
    b.result
  }

  /** Sample timing/size descriptor for one written track. */
  private final case class WriterTrack(
      handler: String, codec: String, width: Int, height: Int,
      channels: Int, sampleRate: Int, timescale: Int, delta: Int,
      samples: IndexedSeq[Array[Byte]])

  /** Complete MJPEG MP4: frame f carries the SAME DC-block pixel
    * contract as the AVI fixture ([[Avi.frameSeed]](id, f)), so the
    * SQL oracle for mp4 frame queries is the same closed form. */
  def mp4WithFrames(id: Long, w: Int, h: Int, nFrames: Int, nComp: Int,
      timescale: Int = 1000, delta: Int = 40): Array[Byte] = {
    require(nFrames > 0, s"nFrames $nFrames")
    val jpegs = (0 until nFrames)
      .map(f => JpegDc.jpegWithPixels(Avi.frameSeed(id, f), w, h, nComp))
    build(Vector(WriterTrack("vide", "jpeg", w, h, 0, 0, timescale, delta, jpegs)))
  }

  /** Multi-track metadata fixture: the MJPEG track plus an `avc1`
    * video track (opaque samples — the entropy-codec seam) and an
    * `mp4a` audio track. [[meta]] reports all three; [[decode]]
    * serves the MJPEG one. */
  def mp4MultiTrack(id: Long, w: Int, h: Int, nFrames: Int, nComp: Int,
      avcW: Int, avcH: Int, avcSamples: Int,
      aCh: Int, aRate: Int, aSamples: Int): Array[Byte] = {
    val jpegs = (0 until nFrames)
      .map(f => JpegDc.jpegWithPixels(Avi.frameSeed(id, f), w, h, nComp))
    // opaque per-sample bytes with deterministic sizes (entropy data
    // the sandbox cannot decode — metadata still parses fully)
    val avc = (0 until avcSamples).map { s =>
      val n = 20 + ((id + s * 7) % 30).toInt
      Array.tabulate(n)(i => ((id * 13 + s * 31 + i * 3) & 0xff).toByte)
    }
    val aac = (0 until aSamples).map { s =>
      val n = 8 + ((id + s * 5) % 16).toInt
      Array.tabulate(n)(i => ((id * 7 + s * 11 + i) & 0xff).toByte)
    }
    build(Vector(
      WriterTrack("vide", "jpeg", w, h, 0, 0, 1000, 40, jpegs),
      WriterTrack("vide", "avc1", avcW, avcH, 0, 0, 90000, 3000, avc),
      WriterTrack("soun", "mp4a", 0, 0, aCh, aRate, aRate, 1024, aac)))
  }

  private def build(tracks: Vector[WriterTrack]): Array[Byte] = {
    val ftyp = new Buf
    ftyp.tag("isom"); ftyp.u32(0x200); ftyp.tag("isom"); ftyp.tag("mp41")
    val ftypBox = { val b = new Buf; b.box("ftyp", ftyp.result); b.result }

    // mdat: per track, first chunk = first two samples, then one per
    // chunk; all tracks' chunks in track order (interleaving is free)
    val mdatBody = new java.io.ByteArrayOutputStream()
    val mdatStart = ftypBox.length + 8L
    // per track: chunk offsets (absolute)
    val chunkOffsets = tracks.map { t =>
      val offs = Vector.newBuilder[Long]
      var i = 0
      var first = true
      while (i < t.samples.length) {
        offs += mdatStart + mdatBody.size()
        val inChunk = if (first && t.samples.length > 1) 2 else 1
        var j = 0
        while (j < inChunk && i < t.samples.length) {
          mdatBody.write(t.samples(i), 0, t.samples(i).length)
          i += 1; j += 1
        }
        first = false
      }
      offs.result()
    }
    val mdatBox = { val b = new Buf; b.box("mdat", mdatBody.toByteArray); b.result }

    val moovBody = new Buf
    val globalTs = 1000
    val maxDurMs = tracks.map(t =>
      t.samples.length.toLong * t.delta * globalTs / t.timescale).max
    moovBody.box("mvhd", fullBox(0, b => {
      b.u32(0); b.u32(0) // ctime/mtime
      b.u32(globalTs); b.u32(maxDurMs)
      b.u32(0x00010000); b.u16(0x0100); b.u16(0) // rate, volume, reserved
      b.u32(0); b.u32(0) // reserved
      // unity matrix
      b.u32(0x00010000); b.u32(0); b.u32(0)
      b.u32(0); b.u32(0x00010000); b.u32(0)
      b.u32(0); b.u32(0); b.u32(0x40000000)
      var i = 0
      while (i < 6) { b.u32(0); i += 1 } // predefined
      b.u32(tracks.length + 1L) // next track id
    }))
    tracks.zipWithIndex.foreach { case (t, ti) =>
      val trakBody = new Buf
      val duration = t.samples.length.toLong * t.delta
      trakBody.box("tkhd", fullBox(0, b => {
        b.u32(0); b.u32(0) // ctime/mtime  (flags are zero: fine for fixtures)
        b.u32(ti + 1L); b.u32(0)
        b.u32(duration * globalTs / t.timescale)
        b.u32(0); b.u32(0) // reserved
        b.u16(0); b.u16(0); b.u16(0); b.u16(0) // layer, group, volume, rsvd
        b.u32(0x00010000); b.u32(0); b.u32(0)
        b.u32(0); b.u32(0x00010000); b.u32(0)
        b.u32(0); b.u32(0); b.u32(0x40000000)
        b.u32(t.width.toLong << 16); b.u32(t.height.toLong << 16)
      }))
      val mdiaBody = new Buf
      mdiaBody.box("mdhd", fullBox(0, b => {
        b.u32(0); b.u32(0)
        b.u32(t.timescale); b.u32(duration)
        b.u16(0x55c4); b.u16(0) // language 'und', predefined
      }))
      mdiaBody.box("hdlr", fullBox(0, b => {
        b.u32(0); b.tag(t.handler)
        b.u32(0); b.u32(0); b.u32(0)
        b.o.write(0) // empty name, null-terminated
      }))
      val minfBody = new Buf
      if (t.handler == "vide")
        minfBody.box("vmhd", fullBox(0, b => { b.u16(0); b.u16(0); b.u16(0); b.u16(0) }))
      else
        minfBody.box("smhd", fullBox(0, b => { b.u16(0); b.u16(0) }))
      val dref = new Buf
      dref.u32(0) // version/flags
      dref.u32(1) // entry count
      dref.box("url ", Array[Byte](0, 0, 0, 1)) // flags=1: self-contained
      val dinfBody = new Buf
      dinfBody.box("dref", dref.result)
      minfBody.box("dinf", dinfBody.result)
      val stblBody = new Buf
      stblBody.box("stsd", fullBox(0, b => {
        b.u32(1)
        val entry = new Buf
        var i = 0
        while (i < 6) { entry.o.write(0); i += 1 } // reserved
        entry.u16(1) // data ref index
        if (t.handler == "vide") {
          entry.u16(0); entry.u16(0) // predefined, reserved
          i = 0
          while (i < 3) { entry.u32(0); i += 1 } // predefined
          entry.u16(t.width); entry.u16(t.height)
          entry.u32(0x00480000); entry.u32(0x00480000) // 72 dpi
          entry.u32(0); entry.u16(1) // reserved, frame count
          i = 0
          while (i < 32) { entry.o.write(0); i += 1 } // compressor name
          entry.u16(24); entry.u16(0xffff) // depth, predefined
        } else {
          entry.u32(0); entry.u32(0) // reserved
          entry.u16(t.channels); entry.u16(16)
          entry.u16(0); entry.u16(0)
          entry.u32(t.sampleRate.toLong << 16)
        }
        // entry size = size(4) + format(4) + body
        b.u32(8L + entry.result.length); b.tag(t.codec)
        b.bytes(entry.result)
      }))
      stblBody.box("stts", fullBox(0, b => {
        b.u32(1); b.u32(t.samples.length.toLong); b.u32(t.delta)
      }))
      stblBody.box("stsc", fullBox(0, b => {
        if (t.samples.length > 2) {
          b.u32(2)
          b.u32(1); b.u32(2); b.u32(1) // chunk 1: two samples
          b.u32(2); b.u32(1); b.u32(1) // chunks 2+: one sample
        } else {
          b.u32(1); b.u32(1); b.u32(math.min(t.samples.length, 2).toLong); b.u32(1)
        }
      }))
      stblBody.box("stsz", fullBox(0, b => {
        b.u32(0); b.u32(t.samples.length.toLong)
        t.samples.foreach(s => b.u32(s.length.toLong))
      }))
      stblBody.box("stco", fullBox(0, b => {
        val offs = chunkOffsets(ti)
        b.u32(offs.length.toLong)
        offs.foreach(b.u32)
      }))
      minfBody.box("stbl", stblBody.result)
      mdiaBody.box("minf", minfBody.result)
      trakBody.box("mdia", mdiaBody.result)
      moovBody.box("trak", trakBody.result)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftypBox, 0, ftypBox.length)
    out.write(mdatBox, 0, mdatBox.length)
    val moovBox = { val b = new Buf; b.box("moov", moovBody.result); b.result }
    out.write(moovBox, 0, moovBox.length)
    out.toByteArray
  }
}
