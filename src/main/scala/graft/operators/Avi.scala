package graft.operators

/** REAL container-video codec: AVI (Microsoft RIFF form `AVI `) with
  * motion-JPEG (`MJPG`) video streams — the classic public container
  * whose every frame is a complete baseline JPEG. Built from the two
  * byte-level machines the repo already proves: the RIFF chunk walk
  * ([[WavPcm]] uses the same grammar for WAVE) and the full-baseline
  * JPEG decoder ([[JpegDc]]). This retires "container video" from the
  * [[Multimodal.FakeCodec]] seam for the MJPEG family; only formats
  * whose frames need an inter-frame motion codec (mp4/h264, webm/vp9)
  * remain behind the documented external-codec seam.
  *
  * The reference stores raw media bytes per object
  * (01_simple.ipynb cell 29, `"objects": True`); a 100 TB crawl's
  * video column needs exactly this shape: a pure
  * `Array[Byte] => Option[Decoded]` kernel, dirty bytes → None,
  * never an exception, all buffer sizes Long-validated before
  * allocation.
  *
  * Format notes (public spec: Microsoft "AVI RIFF File Reference"):
  *  - `RIFF <size> AVI `, then LIST chunks; `hdrl` carries `avih`
  *    (56-byte main header: µs/frame, total frames, width, height);
  *    `movi` carries the stream data chunks.
  *  - video data chunks are fourcc `NNdc` (compressed) / `NNdb`
  *    (uncompressed bitmap) with NN the two-digit stream number; MJPEG
  *    payload = one complete JPEG per chunk.
  *  - chunks are word-aligned: odd sizes pad one byte.
  *  - a `movi` LIST may nest frames inside `rec ` LISTs (grouping for
  *    interleaved streams) — the walk recurses into those.
  */
object Avi {

  /** Decoded MJPEG AVI: container dims + µs/frame from `avih`, one
    * fully-decoded JPEG raster per video chunk, in stream order. */
  final case class Decoded(
      width: Int, height: Int, usPerFrame: Int,
      frames: Vector[PngPixels.Decoded])

  /** Decoded PCM16 audio track of a mixed-track AVI: interleaved
    * samples in `movi` chunk order — the same sample layout as
    * [[WavPcm.Decoded]] (AVI audio chunks are raw WAVE data; the
    * `strf` of an `auds` stream IS a WAVEFORMAT header). */
  final case class Audio(channels: Int, sampleRate: Int, samples: Array[Short])

  /** Both tracks of one container: the video frames plus the first
    * PCM16 audio stream, if the file declares one. */
  final case class DecodedAv(video: Decoded, audio: Option[Audio])

  /** True iff the magic bytes say RIFF/AVI — the dispatch predicate
    * ([[Multimodal.sampleFramesKernel]], [[graft.functions
    * .MediaFeatures]]) for the real container-video path. */
  def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decode0(bytes).map(_.video)
    catch { case _: Exception => None }
  }

  /** Video + audio decode of the same subset; None on anything dirty.
    * Files with no `auds` stream decode with `audio = None` — the
    * video-only contract of [[decode]] is a strict projection. */
  def decodeAv(bytes: Array[Byte]): Option[DecodedAv] = {
    try decode0(bytes)
    catch { case _: Exception => None }
  }

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  /** `NNdc` / `NNdb` with NN two ASCII digits = a video data chunk. */
  private def isVideoChunk(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')

  /** `NNwb` = a wave (audio) data chunk of stream NN. */
  private def isAudioChunk(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      id(2) == 'w' && id(3) == 'b'

  /** Container triage summary (r14) — header + chunk-table walk, NO
    * JPEG/PCM decode: the AVI face of `webm_meta`/`ivf_meta`, so a
    * crawl census can state an AVI's A/V structure at scan cost. */
  final case class Meta(
      width: Int, height: Int, usPerFrame: Int,
      nStreams: Int, // declared in avih
      videoChunks: Int, // NNdc/NNdb chunks inside movi
      audioChunks: Int, // NNwb chunks of the routed PCM16 stream
      audioChannels: Int, audioRate: Int, // 0/0 when no PCM16 stream
      audioBytes: Long) // payload bytes of those chunks

  /** Triage walk: the same RIFF grammar as [[decodeAv]] (strl stream
    * routing, movi/rec nesting, depth cap, word alignment) but chunks
    * are COUNTED, never decoded — O(chunk table), not O(pixels). */
  def meta(b: Array[Byte]): Option[Meta] =
    try meta0(b) catch { case _: Exception => None }

  private def meta0(b: Array[Byte]): Option[Meta] = {
    if (!isAvi(b) || b.length < 24) return None
    val riffSize = le32(b, 4)
    if (riffSize < 4 || 8L + riffSize > b.length) return None
    val end = 8 + riffSize
    var width = -1; var height = -1; var usPerFrame = -1
    var nStreams = 0
    var videoChunks = 0; var audioChunks = 0
    var audioCh = 0; var audioRate = 0; var audioBytes = 0L
    val streamTypes = scala.collection.mutable.ArrayBuffer.empty[String]
    var audioStream = -1
    def walk(from: Int, to: Int, inMovi: Boolean, depth: Int,
        strl: Int): Boolean = {
      if (depth > 8) return false
      var i = from
      while (i + 8 <= to) {
        val id = fourcc(b, i)
        val size = le32(b, i + 4)
        if (size < 0 || i + 8 + size.toLong > to) return false
        val body = i + 8
        if (id == "LIST") {
          if (size < 4) return false
          val listType = fourcc(b, body)
          val isMovi = listType == "movi" || (inMovi && listType == "rec ")
          if (listType == "strl") {
            val sIdx = streamTypes.length
            streamTypes += "????"
            if (!walk(body + 4, body + size, inMovi = false, depth + 1, sIdx))
              return false
          } else if (listType == "hdrl" || isMovi) {
            if (!walk(body + 4, body + size, isMovi, depth + 1, -1))
              return false
          }
        } else if (id == "avih") {
          if (size < 40) return false
          usPerFrame = le32(b, body)
          nStreams = le32(b, body + 24)
          width = le32(b, body + 32)
          height = le32(b, body + 36)
          if (width <= 0 || height <= 0 || usPerFrame < 0) return false
        } else if (id == "strh" && strl >= 0) {
          if (size < 8) return false
          streamTypes(strl) = fourcc(b, body)
        } else if (id == "strf" && strl >= 0 &&
            streamTypes(strl) == "auds" && audioStream < 0) {
          if (size >= 16 && le16(b, body) == 1 && le16(b, body + 14) == 16) {
            val ch = le16(b, body + 2)
            val rate = le32(b, body + 4)
            if (ch >= 1 && ch <= 8 && rate > 0) {
              audioStream = strl; audioCh = ch; audioRate = rate
            }
          }
        } else if (inMovi && isAudioChunk(id)) {
          val sNum = (id(0) - '0') * 10 + (id(1) - '0')
          if (sNum == audioStream) {
            audioChunks += 1; audioBytes += size.toLong
          }
        } else if (inMovi && isVideoChunk(id)) {
          videoChunks += 1
        }
        i = body + size + (size & 1)
      }
      true
    }
    if (!walk(12, end, inMovi = false, depth = 0, strl = -1)) return None
    if (width < 0 || videoChunks == 0) return None
    Some(Meta(width, height, usPerFrame, nStreams, videoChunks,
      audioChunks, audioCh, audioRate, audioBytes))
  }

  private def decode0(b: Array[Byte]): Option[DecodedAv] = {
    if (!isAvi(b) || b.length < 24) return None
    val riffSize = le32(b, 4)
    if (riffSize < 4 || 8L + riffSize > b.length) return None
    val end = 8 + riffSize
    var width = -1; var height = -1; var usPerFrame = -1
    val frames = Vector.newBuilder[PngPixels.Decoded]
    var decodedBytes = 0L
    // stream bookkeeping: AVI numbers streams by `strl` order; an
    // `auds` strl whose `strf` (a WAVEFORMAT header) says PCM16 makes
    // its `NNwb` chunks the audio track. First PCM16 stream wins;
    // other audio streams' chunks are skipped like any unknown chunk.
    val streamTypes = scala.collection.mutable.ArrayBuffer.empty[String]
    var audioStream = -1
    var audioCh = 0; var audioRate = 0
    val audioBytes = new java.io.ByteArrayOutputStream()

    // walk the sub-chunks of [from, to); `inMovi` routes video chunks
    // through the JPEG decoder. The REAL grammar nests at most two
    // LIST levels (RIFF → hdrl/movi → strl/rec ), but nothing forces
    // dirty bytes to follow the grammar — a crafted blob of nested
    // `LIST strl` headers would otherwise recurse thousands deep, and
    // a StackOverflowError is an Error the `catch Exception` contract
    // does not convert to None. Cap the depth explicitly (8 ≫ the
    // grammar's 2, ≪ any stack limit).
    def walk(from: Int, to: Int, inMovi: Boolean, depth: Int,
        strl: Int): Boolean = {
      if (depth > 8) return false
      var i = from
      while (i + 8 <= to) {
        val id = fourcc(b, i)
        val size = le32(b, i + 4)
        if (size < 0 || i + 8 + size.toLong > to) return false
        val body = i + 8
        if (id == "LIST") {
          if (size < 4) return false
          val listType = fourcc(b, body)
          val isMovi = listType == "movi" || (inMovi && listType == "rec ")
          if (listType == "strl") {
            val sIdx = streamTypes.length
            streamTypes += "????"
            if (!walk(body + 4, body + size, inMovi = false, depth + 1, sIdx))
              return false
          } else if (listType == "hdrl" || isMovi) {
            if (!walk(body + 4, body + size, isMovi, depth + 1, -1))
              return false
          } // other LISTs (INFO, odml…) skip whole
        } else if (id == "avih") {
          if (size < 40) return false
          usPerFrame = le32(b, body)
          width = le32(b, body + 32)
          height = le32(b, body + 36)
          if (width <= 0 || height <= 0 || usPerFrame < 0) return false
        } else if (id == "strh" && strl >= 0) {
          if (size < 8) return false
          streamTypes(strl) = fourcc(b, body) // fccType: vids/auds/txts…
        } else if (id == "strf" && strl >= 0 &&
            streamTypes(strl) == "auds" && audioStream < 0) {
          // WAVEFORMAT: tag(2) channels(2) rate(4) avgBps(4) align(2)
          // bits(2); only plain PCM16 is in-subset — anything else
          // leaves the stream unrouted (its NNwb chunks skip)
          if (size >= 16 && le16(b, body) == 1 && le16(b, body + 14) == 16) {
            val ch = le16(b, body + 2)
            val rate = le32(b, body + 4)
            if (ch >= 1 && ch <= 8 && rate > 0) {
              audioStream = strl; audioCh = ch; audioRate = rate
            }
          }
        } else if (inMovi && isAudioChunk(id)) {
          val sNum = (id(0) - '0') * 10 + (id(1) - '0')
          if (sNum == audioStream) {
            // cumulative cap shared with the frame builder: a container
            // of many audio chunks must not out-allocate the budget
            if (decodedBytes + audioBytes.size.toLong + size >
              PngPixels.MaxDecodedBytes) return false
            audioBytes.write(b, body, size)
          }
        } else if (inMovi && isVideoChunk(id)) {
          val frameBytes = java.util.Arrays.copyOfRange(b, body, body + size)
          JpegDc.decode(frameBytes) match {
            case Some(d) =>
              decodedBytes += d.pixels.length.toLong
              // cumulative cap: per-frame caps don't bound a container
              // holding many frames — reject before the builder grows
              if (decodedBytes > PngPixels.MaxDecodedBytes) return false
              frames += d
            case None => return false // a corrupt frame poisons the file:
            // silent frame skipping would shift every later frame index
          }
        }
        i = body + size + (size & 1) // word alignment
      }
      true
    }
    if (!walk(12, end, inMovi = false, depth = 0, strl = -1)) return None
    val out = frames.result()
    if (width < 0 || out.isEmpty) return None
    val audio =
      if (audioStream < 0) None
      else {
        val ab = audioBytes.toByteArray
        // whole interleaved PCM16 blocks only — a torn sample or a
        // torn frame means the chunk stream is corrupt
        if (ab.length % (2 * audioCh) != 0) return None
        val n = ab.length / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) =
            ((ab(2 * i) & 0xff) | ((ab(2 * i + 1) & 0xff) << 8)).toShort
          i += 1
        }
        Some(Audio(audioCh, audioRate, samples))
      }
    Some(DecodedAv(Decoded(width, height, usPerFrame, out), audio))
  }

  /** Integer Rec.601 luminance raster of one decoded frame —
    * (299·R + 587·G + 114·B) / 1000 for truecolor, identity for
    * single-component frames. The same arithmetic as
    * [[graft.functions.MediaFeatures]]' histogram path, exposed so
    * frame sampling and SAD share one definition. */
  def luma(d: PngPixels.Decoded): Array[Byte] =
    if (d.channels == 1) d.pixels
    else {
      val out = new Array[Byte](d.width * d.height)
      val px = d.pixels
      var i = 0; var o = 0
      while (i < px.length) {
        out(o) = ((299 * (px(i) & 0xff) + 587 * (px(i + 1) & 0xff) +
          114 * (px(i + 2) & 0xff)) / 1000).toByte
        i += 3; o += 1
      }
      out
    }

  // ---------------------------------------------------------------- writer

  /** Per-frame seed of the fixture contract: frame `f` of document
    * `id` carries the DC-only JPEG pixel contract
    * [[JpegDc.blockVal]](`id*31 + f*17`, bx, by, c). */
  def frameSeed(id: Long, f: Int): Long = id * 31 + f * 17

  /** Complete MJPEG AVI: RIFF/`AVI ` + `hdrl` (avih + one `vids`/
    * `MJPG` strl) + `movi` with one `00dc` JPEG per frame. Every
    * structure is spec-complete (sizes, alignment, headers), so any
    * standards-compliant AVI reader accepts the bytes; frame pixels
    * follow [[frameSeed]] exactly, which is what the SQL oracle
    * re-derives. */
  def aviWithFrames(id: Long, w: Int, h: Int, nFrames: Int,
      nComp: Int, usPerFrame: Int = 33333): Array[Byte] =
    buildAvi(id, w, h, nFrames, nComp, usPerFrame, audio = None)

  /** Mixed-track MJPEG AVI: the [[aviWithFrames]] video stream plus a
    * second `auds`/PCM16 stream (stream 01) whose interleaved samples
    * follow the SAME pure contract as the WAV fixture —
    * [[WavPcm.samp]]`(id, i)` at flat index i — split across one
    * `01wb` chunk per video frame (the real interleaving shape).
    * `aFrames` counts per-channel sample frames. */
  def aviWithAv(id: Long, w: Int, h: Int, nFrames: Int, nComp: Int,
      aFrames: Int, aChannels: Int, aRate: Int,
      usPerFrame: Int = 33333): Array[Byte] = {
    require(aFrames > 0 && aChannels >= 1 && aChannels <= 8 && aRate > 0,
      s"aFrames=$aFrames aChannels=$aChannels aRate=$aRate")
    buildAvi(id, w, h, nFrames, nComp, usPerFrame,
      audio = Some((aFrames, aChannels, aRate)))
  }

  private def buildAvi(id: Long, w: Int, h: Int, nFrames: Int,
      nComp: Int, usPerFrame: Int,
      audio: Option[(Int, Int, Int)]): Array[Byte] = {
    require(nFrames > 0, s"nFrames $nFrames")
    val jpegs = (0 until nFrames)
      .map(f => JpegDc.jpegWithPixels(frameSeed(id, f), w, h, nComp))
    val bos = new java.io.ByteArrayOutputStream()
    def le32out(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
    }
    def tag(o: java.io.ByteArrayOutputStream, s: String): Unit =
      o.write(s.getBytes("US-ASCII"))
    def chunk(o: java.io.ByteArrayOutputStream, id4: String,
        body: Array[Byte]): Unit = {
      tag(o, id4); le32out(o, body.length); o.write(body, 0, body.length)
      if ((body.length & 1) == 1) o.write(0)
    }
    def list(o: java.io.ByteArrayOutputStream, listType: String,
        body: Array[Byte]): Unit = {
      tag(o, "LIST"); le32out(o, 4 + body.length); tag(o, listType)
      o.write(body, 0, body.length)
      if ((body.length & 1) == 1) o.write(0)
    }
    val maxJpeg = jpegs.map(_.length).max
    // avih: 56 bytes
    val avih = new java.io.ByteArrayOutputStream()
    le32out(avih, usPerFrame)
    le32out(avih, maxJpeg * 30) // dwMaxBytesPerSec (informational)
    le32out(avih, 0) // padding granularity
    le32out(avih, 0) // flags: no idx1 index is written, so none set
    le32out(avih, nFrames)
    le32out(avih, 0) // initial frames
    le32out(avih, 1 + audio.size) // streams
    le32out(avih, maxJpeg)
    le32out(avih, w); le32out(avih, h)
    le32out(avih, 0); le32out(avih, 0); le32out(avih, 0); le32out(avih, 0)
    // strh: 56 bytes, fccType vids / handler MJPG
    val strh = new java.io.ByteArrayOutputStream()
    tag(strh, "vids"); tag(strh, "MJPG")
    le32out(strh, 0) // flags
    le32out(strh, 0) // priority + language
    le32out(strh, 0) // initial frames
    le32out(strh, usPerFrame) // dwScale
    le32out(strh, 1000000) // dwRate → rate/scale = fps
    le32out(strh, 0) // start
    le32out(strh, nFrames) // length in frames
    le32out(strh, maxJpeg)
    le32out(strh, -1) // quality: default
    le32out(strh, 0) // sample size: varies
    le32out(strh, 0); le32out(strh, (h << 16) | (w & 0xffff)) // rcFrame
    // strf: BITMAPINFOHEADER, biCompression = 'MJPG'
    val strf = new java.io.ByteArrayOutputStream()
    le32out(strf, 40); le32out(strf, w); le32out(strf, h)
    strf.write(1); strf.write(0) // planes
    strf.write(24); strf.write(0) // bit count
    tag(strf, "MJPG")
    le32out(strf, w * h * 3) // image size
    le32out(strf, 0); le32out(strf, 0); le32out(strf, 0); le32out(strf, 0)
    val strl = new java.io.ByteArrayOutputStream()
    chunk(strl, "strh", strh.toByteArray)
    chunk(strl, "strf", strf.toByteArray)
    val hdrl = new java.io.ByteArrayOutputStream()
    chunk(hdrl, "avih", avih.toByteArray)
    list(hdrl, "strl", strl.toByteArray)
    audio.foreach { case (aFrames, aCh, aRate) =>
      // stream 01: auds strl — strh (fccType auds) + strf (WAVEFORMAT)
      val ash = new java.io.ByteArrayOutputStream()
      tag(ash, "auds"); le32out(ash, 0) // handler: 0 for raw PCM
      le32out(ash, 0) // flags
      le32out(ash, 0) // priority + language
      le32out(ash, 0) // initial frames
      le32out(ash, 1) // dwScale
      le32out(ash, aRate) // dwRate → rate/scale = samples/s
      le32out(ash, 0) // start
      le32out(ash, aFrames) // length in sample frames
      le32out(ash, aFrames * aCh * 2) // suggested buffer
      le32out(ash, -1) // quality: default
      le32out(ash, aCh * 2) // sample size = block align
      le32out(ash, 0); le32out(ash, 0) // rcFrame (unused for audio)
      val asf = new java.io.ByteArrayOutputStream()
      // WAVEFORMAT(EX sans cbSize): PCM needs exactly these 16 bytes
      asf.write(1); asf.write(0) // wFormatTag = PCM
      asf.write(aCh & 0xff); asf.write(0)
      le32out(asf, aRate)
      le32out(asf, aRate * aCh * 2)
      asf.write((aCh * 2) & 0xff); asf.write(0) // block align
      asf.write(16); asf.write(0) // bits per sample
      val astrl = new java.io.ByteArrayOutputStream()
      chunk(astrl, "strh", ash.toByteArray)
      chunk(astrl, "strf", asf.toByteArray)
      list(hdrl, "strl", astrl.toByteArray)
    }
    val movi = new java.io.ByteArrayOutputStream()
    audio match {
      case None => jpegs.foreach(j => chunk(movi, "00dc", j))
      case Some((aFrames, aCh, _)) =>
        // interleave: frame f's 00dc, then the 01wb slice covering
        // sample-frame blocks [f·aF/nF, (f+1)·aF/nF) — whole blocks,
        // so the decoded concatenation is samp(id, ·) at flat index
        var f = 0
        while (f < nFrames) {
          chunk(movi, "00dc", jpegs(f))
          val startBlock = f.toLong * aFrames / nFrames
          val endBlock = (f + 1).toLong * aFrames / nFrames
          val ab = new java.io.ByteArrayOutputStream()
          var i = startBlock * aCh
          while (i < endBlock * aCh) {
            val v = WavPcm.samp(id, i) & 0xffff
            ab.write(v & 0xff); ab.write((v >> 8) & 0xff)
            i += 1
          }
          chunk(movi, "01wb", ab.toByteArray)
          f += 1
        }
    }
    val form = new java.io.ByteArrayOutputStream()
    list(form, "hdrl", hdrl.toByteArray)
    list(form, "movi", movi.toByteArray)
    val body = form.toByteArray
    tag(bos, "RIFF"); le32out(bos, 4 + body.length); tag(bos, "AVI ")
    bos.write(body, 0, body.length)
    bos.toByteArray
  }
}
