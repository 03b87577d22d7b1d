package graft.operators

/** Minimal Matroska/WebM demuxer for VP8 (r13) — the container VP8
  * video actually ships in on the web, completing the r10-r12 codec
  * arc (VP8 intra → inter → IVF → WebM). Structure from PUBLIC specs
  * only: RFC 9559 (EBML) and the Matroska/WebM element registry;
  * the extracted payloads feed [[Vp8.decodeSequence]] unchanged, so
  * every pixel-level pin of the VP8 decoder carries over.
  *
  * Subset (validator stance — None on anything outside it):
  *  - EBML header with DocType "webm" or "matroska";
  *  - ONE Segment (the only element allowed an unknown size — real
  *    live-muxed WebM leaves it open);
  *  - Info/TimecodeScale, Tracks/TrackEntry (number, type, CodecID,
  *    Video pixel dims), Cluster/Timecode/SimpleBlock;
  *  - SimpleBlock only, no lacing (flags & 0x06 must be 0);
  *  - unknown elements with a KNOWN size are skipped (SeekHead, Cues,
  *    Tags, Void, CRC-32, …) — the register is open-ended by design;
  *  - frames are taken in storage order from the FIRST VP8 track.
  *
  * Reference behavior anchor: the reference engine (weaviate.py)
  * stores opaque media blobs; this demuxer is part of the
  * LLM-pipeline brief's multimodal column story (triage + decode at
  * scan cost), like `ivf_meta`/`vp8_ivf_frames` before it. */
object Webm {

  // ---- element ids (Matroska registry, marker bits kept) ----------
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimecodeScale = 0x2AD7B1L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdCodecPrivate = 0x63A2L
  private val IdSamplingFrequency = 0xB5L
  private val IdChannels = 0x9FL
  private val IdCluster = 0x1F43B675L
  private val IdTimecode = 0xE7L
  private val IdSimpleBlock = 0xA3L
  private val IdBlockGroup = 0xA0L
  private val IdBlock = 0xA1L
  private val IdBlockDuration = 0x9BL

  private final class Bad extends RuntimeException

  /** Parsed container summary — the triage surface (`webm_meta`). */
  final case class Meta(
      docType: String,
      timecodeScale: Long,
      nTracks: Int,
      vp8Track: Int, // track number, -1 if no VP8 track
      width: Int,
      height: Int,
      nClusters: Int,
      nBlocks: Int, // SimpleBlocks of the VP8 track
      keyframes: Int,
      interframes: Int,
      subTrack: Int, // first S_TEXT track number, -1 if none (r13)
      nCues: Int,
      // audio-track triage (r14): TrackEntry/Audio walk, no decode —
      // real-web WebM is A/V and a census must see both halves
      audioTrack: Int, // first A_* track number, -1 if none
      audioCodec: String, // its CodecID ("" if none)
      audioChannels: Int, // 0 if none
      audioRate: Int, // SamplingFrequency in Hz, 0 if none
      nAudioBlocks: Int) // SimpleBlocks of the audio track

  /** One subtitle cue (S_TEXT track): timecodes in TimecodeScale
    * units, text bytes at [off, off+len). */
  final case class Cue(startTc: Long, durTc: Long, off: Int, len: Int)

  /** One VP8 frame payload: byte range + container-level flags. */
  final case class Block(off: Int, len: Int, keyframe: Boolean,
      timecode: Long)

  private final class Rd(val b: Array[Byte], var pos: Int,
      val end: Int) {
    def bad(): Nothing = throw new Bad
    def u8(): Int = {
      if (pos >= end) bad(); val v = b(pos) & 0xff; pos += 1; v
    }
    /** EBML element ID: length from the leading-one marker, marker
      * bits KEPT (ids are conventionally quoted with them). */
    def readId(): Long = {
      val first = u8()
      val len =
        if ((first & 0x80) != 0) 1
        else if ((first & 0x40) != 0) 2
        else if ((first & 0x20) != 0) 3
        else if ((first & 0x10) != 0) 4
        else bad()
      var v = first.toLong
      var i = 1
      while (i < len) { v = (v << 8) | u8(); i += 1 }
      v
    }
    /** EBML size vint: marker bit CLEARED; all-ones = unknown (-1). */
    def readSize(): Long = {
      val first = u8()
      var len = 0
      var mask = 0x80
      while (mask != 0 && (first & mask) == 0) { len += 1; mask >>= 1 }
      if (mask == 0) bad()
      var v = (first & (mask - 1)).toLong
      var i = 0
      var allOnes = (first & (mask - 1)) == (mask - 1)
      while (i < len) {
        val x = u8()
        if (x != 0xff) allOnes = false
        v = (v << 8) | x
        i += 1
      }
      if (allOnes) -1L else v
    }
    def uint(n: Int): Long = {
      if (n <= 0 || n > 8) bad()
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      v
    }
    def str(n: Int): String = {
      if (pos + n > end) bad()
      val s = new String(b, pos, n, "US-ASCII"); pos += n; s
    }
    /** EBML float: 4 or 8 bytes IEEE-754 (0-size = 0.0 per spec). */
    def f(n: Int): Double =
      if (n == 0) 0.0
      else if (n == 4) java.lang.Float.intBitsToFloat(uint(4).toInt).toDouble
      else if (n == 8) java.lang.Double.longBitsToDouble(uint(8))
      else bad()
  }

  /** Walk `rd` until `end`, calling `f(id, size, payloadStart)`;
    * `f` returns the position to continue from (normally start+size).
    * Unknown-size children are rejected. */
  private def walk(rd: Rd)(f: (Long, Int, Int) => Unit): Unit = {
    while (rd.pos < rd.end) {
      val id = rd.readId()
      val size = rd.readSize()
      if (size < 0 || rd.pos + size > rd.end) rd.bad()
      val start = rd.pos
      f(id, size.toInt, start)
      rd.pos = start + size.toInt
    }
  }

  private def parse0(b: Array[Byte])
      : (Meta, Vector[Block], Vector[Cue]) = {
    if (b == null || b.length < 8) throw new Bad
    val rd = new Rd(b, 0, b.length)
    // EBML header
    if (rd.readId() != IdEbml) rd.bad()
    val hdrSize = rd.readSize()
    if (hdrSize < 0 || rd.pos + hdrSize > b.length) rd.bad()
    var docType = "matroska"
    locally {
      val h = new Rd(b, rd.pos, rd.pos + hdrSize.toInt)
      walk(h) { (id, size, start) =>
        if (id == IdDocType) docType = h.str(size).takeWhile(_ != '\u0000')
      }
    }
    rd.pos += hdrSize.toInt
    // Segment (the only unknown-size element tolerated)
    if (rd.readId() != IdSegment) rd.bad()
    val segSize = rd.readSize()
    val segEnd =
      if (segSize < 0) b.length
      else {
        if (rd.pos + segSize > b.length) rd.bad()
        rd.pos + segSize.toInt
      }
    var tcScale = 1000000L
    var nTracks = 0
    var vp8Track = -1
    var subTrack = -1
    var audioTrack = -1
    var audioCodec = ""
    var audioChannels = 0
    var audioRate = 0
    var nAudioBlocks = 0
    var width = 0; var height = 0
    var nClusters = 0; var nBlocks = 0
    var keyframes = 0; var interframes = 0
    val blocks = Vector.newBuilder[Block]
    val cues = Vector.newBuilder[Cue]
    val seg = new Rd(b, rd.pos, segEnd)
    walk(seg) { (id, size, start) =>
      if (id == IdInfo) {
        val in = new Rd(b, start, start + size)
        walk(in) { (iid, isz, ist) =>
          if (iid == IdTimecodeScale) tcScale = in.uint(isz)
        }
      } else if (id == IdTracks) {
        val tr = new Rd(b, start, start + size)
        walk(tr) { (tid, tsz, tst) =>
          if (tid == IdTrackEntry) {
            nTracks += 1
            var num = -1; var typ = -1; var codec = ""
            var w0 = 0; var h0 = 0
            var ch0 = 0; var rate0 = 0
            val te = new Rd(b, tst, tst + tsz)
            walk(te) { (eid, esz, est) =>
              if (eid == IdTrackNumber) num = te.uint(esz).toInt
              else if (eid == IdTrackType) typ = te.uint(esz).toInt
              else if (eid == IdCodecId) codec = te.str(esz)
              else if (eid == IdVideo) {
                val vd = new Rd(b, est, est + esz)
                walk(vd) { (vid, vsz, vst) =>
                  if (vid == IdPixelWidth) w0 = vd.uint(vsz).toInt
                  else if (vid == IdPixelHeight) h0 = vd.uint(vsz).toInt
                }
              } else if (eid == IdAudio) {
                val ad = new Rd(b, est, est + esz)
                walk(ad) { (aid, asz, ast) =>
                  if (aid == IdChannels) ch0 = ad.uint(asz).toInt
                  else if (aid == IdSamplingFrequency)
                    rate0 = math.round(ad.f(asz)).toInt
                }
              }
            }
            if (codec == "V_VP8" && typ == 1 && vp8Track < 0) {
              if (num <= 0) te.bad()
              vp8Track = num; width = w0; height = h0
            } else if (codec.startsWith("S_TEXT/") && typ == 0x11 &&
                subTrack < 0) {
              if (num <= 0) te.bad()
              subTrack = num
            } else if (codec.startsWith("A_") && typ == 2 &&
                audioTrack < 0) {
              // triage only (TrackEntry/Audio: codec id, channels,
              // rate) — packet DECODE stays behind the documented
              // Vorbis/Opus seam (COVERAGE.md)
              if (num <= 0) te.bad()
              audioTrack = num; audioCodec = codec
              audioChannels = ch0; audioRate = rate0
            }
          }
        }
      } else if (id == IdCluster) {
        nClusters += 1
        var clusterTc = 0L
        val cl = new Rd(b, start, start + size)
        walk(cl) { (cid, csz, cst) =>
          if (cid == IdTimecode) clusterTc = cl.uint(csz)
          else if (cid == IdSimpleBlock) {
            val sb = new Rd(b, cst, cst + csz)
            // track number vint (marker CLEARED, like a size)
            val track = sb.readSize()
            if (track <= 0) sb.bad()
            val relTc = ((sb.u8() << 8) | sb.u8()).toShort.toLong
            val flags = sb.u8()
            if ((flags & 0x06) != 0) sb.bad() // lacing out of subset
            if (track == vp8Track) {
              nBlocks += 1
              val key = (flags & 0x80) != 0
              if (key) keyframes += 1 else interframes += 1
              blocks += Block(sb.pos, cst + csz - sb.pos, key,
                clusterTc + relTc)
            } else if (track == subTrack) {
              // a duration-less subtitle block: zero-length cue
              cues += Cue(clusterTc + relTc, 0L, sb.pos,
                cst + csz - sb.pos)
            } else if (track == audioTrack) {
              nAudioBlocks += 1 // packet counted, never decoded
            }
          } else if (cid == IdBlockGroup) {
            // the duration-carrying block form subtitles ship in
            var bOff = -1; var bLen = 0; var bTrack = -1L
            var bRel = 0L; var dur = 0L
            val bg = new Rd(b, cst, cst + csz)
            walk(bg) { (gid, gsz, gst) =>
              if (gid == IdBlock) {
                val bk = new Rd(b, gst, gst + gsz)
                bTrack = bk.readSize()
                if (bTrack <= 0) bk.bad()
                bRel = ((bk.u8() << 8) | bk.u8()).toShort.toLong
                val flags = bk.u8()
                if ((flags & 0x06) != 0) bk.bad() // lacing
                bOff = bk.pos; bLen = gst + gsz - bk.pos
              } else if (gid == IdBlockDuration) dur = bg.uint(gsz)
            }
            if (bTrack == subTrack && bOff >= 0)
              cues += Cue(clusterTc + bRel, dur, bOff, bLen)
            // BlockGroups of other tracks are skipped (subset: the
            // VP8 track ships SimpleBlocks only)
          }
        }
      }
      // every other element (SeekHead, Cues, Tags, Void, CRC-32, …)
      // is skipped by size — the registry is open-ended
    }
    val cueList = cues.result()
    (Meta(docType, tcScale, nTracks, vp8Track, width, height,
      nClusters, nBlocks, keyframes, interframes, subTrack,
      cueList.length, audioTrack, audioCodec, audioChannels,
      audioRate, nAudioBlocks), blocks.result(), cueList)
  }

  /** Container triage — header/track/cluster walk, no VP8 decode. */
  def meta(b: Array[Byte]): Option[Meta] =
    try Some(parse0(b)._1) catch { case _: Exception => None }

  /** The VP8 track's frame byte ranges, storage order. */
  def vp8Blocks(b: Array[Byte]): Option[Vector[Block]] =
    try {
      val (m, blocks, _) = parse0(b)
      if (m.vp8Track < 0) None else Some(blocks)
    } catch { case _: Exception => None }

  /** Subtitle cues of the first S_TEXT track (r13): (start_ms,
    * end_ms, text), timecodes scaled by TimecodeScale (ns/unit).
    * None when the container has no subtitle track. */
  def subtitleCues(b: Array[Byte])
      : Option[Vector[(Long, Long, String)]] =
    try {
      val (m, _, cues) = parse0(b)
      if (m.subTrack < 0) None
      else Some(cues.map { c =>
        val startMs = c.startTc * m.timecodeScale / 1000000L
        val endMs = (c.startTc + c.durTc) * m.timecodeScale / 1000000L
        (startMs, endMs, new String(b, c.off, c.len, "UTF-8"))
      })
    } catch { case _: Exception => None }

  /** Decode every VP8 frame of the first video track (the IVF path's
    * container twin): None unless the whole sequence decodes and the
    * container flags agree with the frame tags (a keyframe flagged as
    * inter — or vice versa — is a malformed mux). */
  def decode(b: Array[Byte]): Option[Seq[Vp8.Yuv]] =
    try {
      vp8Blocks(b).filter(_.nonEmpty).flatMap { blocks =>
        val tagsAgree = blocks.forall { bl =>
          bl.len >= 3 && ((b(bl.off) & 1) == 0) == bl.keyframe
        }
        if (!tagsAgree) None
        else Vp8.decodeSequence(b, blocks.map(bl => (bl.off, bl.len)))
      }
    } catch { case _: Exception => None }

  // ---- writer (fixture mux; shares only the registry constants) ---

  /** Audio-track PACKET extraction (r16 — the Vorbis decode seam
    * graduates): the first A_* audio track's CodecID, its
    * CodecPrivate bytes (for Vorbis: the three Xiph-laced header
    * packets), and its SimpleBlock payloads in cluster order. The
    * walk mirrors [[parse0]]'s grammar (same vint/size/lacing rules,
    * same dirty-byte rejection) but keeps the payload RANGES the
    * triage pass only counted. None when no audio track or dirty.
    *
    * TWO passes over the segment (r17): Matroska permits Clusters
    * BEFORE the Tracks element (the spec orders nothing at segment
    * level; live muxes emit Tracks late), so the track number is
    * resolved in a first pass over the whole segment and the blocks
    * are extracted in a second — a single forward walk gated on
    * `audioTrack > 0` silently dropped every audio packet of a
    * leading cluster and decoded short. */
  def audioPackets(b: Array[Byte])
      : Option[(String, Array[Byte], Vector[Array[Byte]])] =
    try {
      if (b == null || b.length < 8) return None
      val rd = new Rd(b, 0, b.length)
      if (rd.readId() != IdEbml) return None
      val hdrSize = rd.readSize()
      if (hdrSize < 0 || rd.pos + hdrSize > b.length) return None
      rd.pos += hdrSize.toInt
      if (rd.readId() != IdSegment) return None
      val segSize = rd.readSize()
      val segEnd =
        if (segSize < 0) b.length
        else if (rd.pos + segSize > b.length) return None
        else rd.pos + segSize.toInt
      val segStart = rd.pos
      var audioTrack = -1L
      var codec = ""
      var cp = Array.empty[Byte]
      // PASS 1: resolve the first A_* audio track, wherever Tracks sits
      walk(new Rd(b, segStart, segEnd)) { (id, size, start) =>
        if (id == IdTracks) {
          val tr = new Rd(b, start, start + size)
          walk(tr) { (tid, tsz, tst) =>
            if (tid == IdTrackEntry) {
              var num = -1L; var typ = -1; var cid = ""
              var priv = Array.empty[Byte]
              val te = new Rd(b, tst, tst + tsz)
              walk(te) { (eid, esz, est) =>
                if (eid == IdTrackNumber) num = te.uint(esz)
                else if (eid == IdTrackType) typ = te.uint(esz).toInt
                else if (eid == IdCodecId) cid = te.str(esz)
                else if (eid == IdCodecPrivate)
                  priv = java.util.Arrays.copyOfRange(b, est, est + esz)
              }
              if (cid.startsWith("A_") && typ == 2 && audioTrack < 0) {
                audioTrack = num; codec = cid; cp = priv
              }
            }
          }
        }
      }
      if (audioTrack < 0) return None
      // PASS 2: collect the track's SimpleBlocks in cluster order
      val packets = Vector.newBuilder[Array[Byte]]
      walk(new Rd(b, segStart, segEnd)) { (id, size, start) =>
        if (id == IdCluster) {
          val cl = new Rd(b, start, start + size)
          walk(cl) { (cid2, csz, cst) =>
            if (cid2 == IdSimpleBlock) {
              val sb = new Rd(b, cst, cst + csz)
              val track = sb.readSize()
              if (track <= 0) sb.bad()
              sb.u8(); sb.u8() // relative timecode
              val flags = sb.u8()
              if ((flags & 0x06) != 0) sb.bad() // lacing out of subset
              if (track == audioTrack)
                packets += java.util.Arrays.copyOfRange(
                  b, sb.pos, cst + csz)
            }
          }
        }
      }
      Some((codec, cp, packets.result()))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def vintSize(v: Long): Array[Byte] = {
    // shortest size encoding whose all-ones pattern is not hit
    var len = 1
    while (len <= 8 && (v >= (1L << (7 * len)) - 1)) len += 1
    require(len <= 8, s"vint too large: $v")
    val out = new Array[Byte](len)
    var i = len - 1
    var x = v
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out(0) = (out(0) | (0x80 >> (len - 1))).toByte
    out
  }

  private def idBytes(id: Long): Array[Byte] = {
    val len = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
      else if (id <= 0xffffffL) 3 else 4
    val out = new Array[Byte](len)
    var i = len - 1; var x = id
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  private def elem(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ vintSize(payload.length.toLong) ++ payload

  private def uintBytes(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    val out = new Array[Byte](len)
    var i = len - 1; var x = v
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  /** Audio mux input for [[build]]: codec id ("A_VORBIS"/"A_OPUS"),
    * channel count, sample rate (Hz), and opaque packet payloads
    * (SHIPPED, never decoded — the triage boundary). */
  final case class AudioMux(codec: String, channels: Int, rate: Int,
      packets: Seq[Array[Byte]],
      codecPrivate: Array[Byte] = Array.empty)

  /** Assemble a minimal WebM file around VP8 frame payloads.
    * `clusterEvery` splits blocks into clusters; `padVoid` inserts a
    * Void element between top-level children (the skip path);
    * `audio` muxes an A/V file: an audio TrackEntry (track 3) with
    * the Audio element (channels + 4-byte-float SamplingFrequency)
    * and its packets as unlaced SimpleBlocks in their own clusters. */
  def build(w: Int, h: Int, frames: Seq[Array[Byte]],
      clusterEvery: Int = 2, padVoid: Boolean = false,
      docType: String = "webm",
      openSegment: Boolean = false,
      subs: Seq[(Long, Long, String)] = Nil,
      audio: Option[AudioMux] = None): Array[Byte] = {
    require(frames.nonEmpty && clusterEvery > 0)
    val hdr = elem(IdEbml,
      elem(0x4286L, uintBytes(1)) ++ // EBMLVersion
        elem(0x42F7L, uintBytes(1)) ++ // EBMLReadVersion
        elem(0x42F2L, uintBytes(4)) ++ // EBMLMaxIDLength
        elem(0x42F3L, uintBytes(8)) ++ // EBMLMaxSizeLength
        elem(IdDocType, docType.getBytes("US-ASCII")) ++
        elem(0x4287L, uintBytes(2)) ++ // DocTypeVersion
        elem(0x4285L, uintBytes(2))) // DocTypeReadVersion
    val info = elem(IdInfo, elem(IdTimecodeScale, uintBytes(1000000L)))
    val videoEntry = elem(IdTrackEntry,
      elem(IdTrackNumber, uintBytes(1)) ++
        elem(0x73C5L, uintBytes(1)) ++ // TrackUID
        elem(IdTrackType, uintBytes(1)) ++
        elem(IdCodecId, "V_VP8".getBytes("US-ASCII")) ++
        elem(IdVideo,
          elem(IdPixelWidth, uintBytes(w.toLong)) ++
            elem(IdPixelHeight, uintBytes(h.toLong))))
    val subEntry =
      if (subs.isEmpty) Array.empty[Byte]
      else elem(IdTrackEntry,
        elem(IdTrackNumber, uintBytes(2)) ++
          elem(0x73C5L, uintBytes(2)) ++ // TrackUID
          elem(IdTrackType, uintBytes(0x11)) ++ // subtitle
          elem(IdCodecId, "S_TEXT/UTF8".getBytes("US-ASCII")))
    val audioEntry = audio match {
      case None => Array.empty[Byte]
      case Some(a) => elem(IdTrackEntry,
        elem(IdTrackNumber, uintBytes(3)) ++
          elem(0x73C5L, uintBytes(3)) ++ // TrackUID
          elem(IdTrackType, uintBytes(2)) ++ // audio
          elem(IdCodecId, a.codec.getBytes("US-ASCII")) ++
          (if (a.codecPrivate.nonEmpty)
            elem(IdCodecPrivate, a.codecPrivate)
          else Array.empty[Byte]) ++
          elem(IdAudio,
            elem(IdSamplingFrequency, {
              val bits = java.lang.Float.floatToIntBits(a.rate.toFloat)
              Array(((bits >> 24) & 0xff).toByte,
                ((bits >> 16) & 0xff).toByte,
                ((bits >> 8) & 0xff).toByte, (bits & 0xff).toByte)
            }) ++ elem(IdChannels, uintBytes(a.channels.toLong))))
    }
    val track = elem(IdTracks, videoEntry ++ subEntry ++ audioEntry)
    val voidEl =
      if (padVoid) elem(0xECL, new Array[Byte](7)) else Array.empty[Byte]
    val clusters = frames.zipWithIndex.grouped(clusterEvery).map { grp =>
      val tc0 = grp.head._2.toLong * 40L
      val blocks = grp.map { case (payload, i) =>
        val key = (payload(0) & 1) == 0
        val rel = (i * 40L - tc0).toShort
        elem(IdSimpleBlock,
          vintSize(1L) ++ // track 1
            Array(((rel >> 8) & 0xff).toByte, (rel & 0xff).toByte,
              (if (key) 0x80 else 0x00).toByte) ++ payload)
      }.reduce(_ ++ _)
      elem(IdCluster, elem(IdTimecode, uintBytes(tc0)) ++ blocks)
    }.reduce(_ ++ _)
    // subtitle cues: one cluster per cue, cue start as the cluster
    // timecode (TimecodeScale 1e6 ns = 1 ms/unit), a BlockGroup with
    // the text Block + BlockDuration — the S_TEXT shipping form
    val subClusters =
      if (subs.isEmpty) Array.empty[Byte]
      else subs.map { case (startMs, endMs, text) =>
        require(endMs >= startMs, "cue must not end before it starts")
        val blk = elem(IdBlock,
          vintSize(2L) ++ Array(0.toByte, 0.toByte, 0.toByte) ++
            text.getBytes("UTF-8"))
        elem(IdCluster,
          elem(IdTimecode, uintBytes(startMs)) ++
            elem(IdBlockGroup,
              blk ++ elem(IdBlockDuration,
                uintBytes(endMs - startMs))))
      }.reduce(_ ++ _)
    // audio packets: unlaced SimpleBlocks, 20 ms apart, clustered in
    // packet pairs — the structural twin of the video clusters
    val audioClusters = audio match {
      case None => Array.empty[Byte]
      case Some(a) =>
        require(a.packets.nonEmpty, "audio mux needs packets")
        a.packets.zipWithIndex.grouped(2).map { grp =>
          val tc0 = grp.head._2.toLong * 20L
          val blocks = grp.map { case (p, i) =>
            val rel = (i * 20L - tc0).toShort
            elem(IdSimpleBlock,
              vintSize(3L) ++ // track 3
                Array(((rel >> 8) & 0xff).toByte, (rel & 0xff).toByte,
                  0x80.toByte) ++ p) // audio blocks are all "key"
          }.reduce(_ ++ _)
          elem(IdCluster, elem(IdTimecode, uintBytes(tc0)) ++ blocks)
        }.reduce(_ ++ _)
    }
    val segBody =
      info ++ voidEl ++ track ++ clusters ++ subClusters ++ audioClusters
    // live muxers leave the Segment size OPEN (1-byte all-ones vint)
    if (openSegment)
      hdr ++ idBytes(IdSegment) ++ Array(0xff.toByte) ++ segBody
    else hdr ++ elem(IdSegment, segBody)
  }
}
