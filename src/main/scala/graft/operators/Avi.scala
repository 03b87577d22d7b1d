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

  /** True iff the magic bytes say RIFF/AVI — the dispatch predicate
    * ([[Multimodal.sampleFramesKernel]], [[graft.functions
    * .MediaFeatures]]) for the real container-video path. */
  def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decode0(bytes)
    catch { case _: Exception => None }
  }

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  /** `NNdc` / `NNdb` with NN two ASCII digits = a video data chunk. */
  private def isVideoChunk(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')

  private def decode0(b: Array[Byte]): Option[Decoded] = {
    if (!isAvi(b) || b.length < 24) return None
    val riffSize = le32(b, 4)
    if (riffSize < 4 || 8L + riffSize > b.length) return None
    val end = 8 + riffSize
    var width = -1; var height = -1; var usPerFrame = -1
    val frames = Vector.newBuilder[PngPixels.Decoded]
    var decodedBytes = 0L

    // walk the sub-chunks of [from, to); `inMovi` routes video chunks
    // through the JPEG decoder. The REAL grammar nests at most two
    // LIST levels (RIFF → hdrl/movi → strl/rec ), but nothing forces
    // dirty bytes to follow the grammar — a crafted blob of nested
    // `LIST strl` headers would otherwise recurse thousands deep, and
    // a StackOverflowError is an Error the `catch Exception` contract
    // does not convert to None. Cap the depth explicitly (8 ≫ the
    // grammar's 2, ≪ any stack limit).
    def walk(from: Int, to: Int, inMovi: Boolean, depth: Int): Boolean = {
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
          if (listType == "hdrl" || listType == "strl" || isMovi) {
            if (!walk(body + 4, body + size, isMovi, depth + 1)) return false
          } // other LISTs (INFO, odml…) skip whole
        } else if (id == "avih") {
          if (size < 40) return false
          usPerFrame = le32(b, body)
          width = le32(b, body + 32)
          height = le32(b, body + 36)
          if (width <= 0 || height <= 0 || usPerFrame < 0) return false
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
    if (!walk(12, end, inMovi = false, depth = 0)) return None
    val out = frames.result()
    if (width < 0 || out.isEmpty) return None
    Some(Decoded(width, height, usPerFrame, out))
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
      nComp: Int, usPerFrame: Int = 33333): Array[Byte] = {
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
    le32out(avih, 1) // streams
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
    val movi = new java.io.ByteArrayOutputStream()
    jpegs.foreach(j => chunk(movi, "00dc", j))
    val form = new java.io.ByteArrayOutputStream()
    list(form, "hdrl", hdrl.toByteArray)
    list(form, "movi", movi.toByteArray)
    val body = form.toByteArray
    tag(bos, "RIFF"); le32out(bos, 4 + body.length); tag(bos, "AVI ")
    bos.write(body, 0, body.length)
    bos.toByteArray
  }
}
