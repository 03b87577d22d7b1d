package graft.operators

/** REAL WAV/PCM audio codec — the audio leg of the multimodal story,
  * fully real like [[PngPixels]] and [[JpegDc]] (RIFF/WAVE is a plain
  * chunked container and PCM16 needs no codec library at all).
  *
  * Writer: canonical RIFF → `fmt ` (PCM, 16-bit, little-endian) →
  * `data` with interleaved samples following the pure contract
  * [[samp]], so a SQL oracle re-derives exact integer statistics with
  * no audio machinery. Reader: full chunk walk (unknown chunks — LIST,
  * cue, bext… — are skipped by size, odd sizes padded per RIFF),
  * `fmt ` validation, untrusted-size caps in Long before allocation.
  * Format subset: linear PCM16 (tag 1) and 8-bit G.711 µ-law (tag 7,
  * expanded to PCM16 by [[ulawToPcm]]). Outside it — float, ADPCM,
  * extensible, other bit depths, truncated or corrupt chunks — the
  * decoder returns None, never throws: the dirty-crawl-bytes contract
  * shared by all media codecs. */
object WavPcm {

  /** The sample contract the oracle recomputes over the FLAT
    * interleaved index: `((i*3 + id*7) mod 4096) − 2048` — a full
    * 16-bit-safe swing crossing zero, so sums exercise sign handling. */
  def samp(id: Long, i: Long): Int =
    math.floorMod(i * 3L + id * 7L, 4096L).toInt - 2048

  /** Decoded PCM16 audio: interleaved samples, frame-major. */
  final case class Decoded(
      channels: Int, sampleRate: Int, frames: Int, samples: Array[Short])

  /** Complete RIFF/WAVE file whose PCM16 samples equal
    * [[samp]]`(id, i)` at flat interleaved index i. */
  def wavWithSamples(
      id: Long, frames: Int, channels: Int, sampleRate: Int): Array[Byte] = {
    require(frames > 0 && channels > 0 && channels <= 8 && sampleRate > 0,
      s"frames=$frames channels=$channels rate=$sampleRate")
    val n = frames * channels
    val dataBytes = n * 2
    val bos = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    tag("RIFF"); le32(4 + 24 + 8 + dataBytes); tag("WAVE")
    tag("fmt "); le32(16)
    le16(1) // PCM
    le16(channels)
    le32(sampleRate)
    le32(sampleRate * channels * 2) // byte rate
    le16(channels * 2) // block align
    le16(16) // bits per sample
    tag("data"); le32(dataBytes)
    var i = 0
    while (i < n) { le16(samp(id, i) & 0xffff); i += 1 }
    bos.toByteArray
  }

  /** Linear-interpolation resample to `dstRate` — the sample-rate
    * normalization step an audio corpus runs before feature
    * extraction, re-wrapped as a canonical WAV so every existing
    * kernel (`wav_stats`, `wav_windows`, `wav_spectral`) consumes the
    * result unchanged (the [[wavFromSamples]] bridge pattern).
    *
    * The contract is INTEGER-EXACT so a SQL oracle re-derives every
    * output sample: output frame j reads source position
    * `num = j·srcRate` against denominator dstRate, `i0 = num/dst`
    * (Long division truncating toward zero — the same semantics as
    * SQL `//`), `rem = num − i0·dst`, and
    * `out = v0 + (v1 − v0)·rem/dst` with the last frame clamped (no
    * extrapolation). Output length `(frames−1)·dst/src + 1`. Dirty
    * bytes or an unreasonable rate → None. */
  def resample(bytes: Array[Byte], dstRate: Int): Option[Array[Byte]] =
    decode(bytes).flatMap { d =>
      if (dstRate <= 0 || dstRate > 1000000) None
      else {
        val nOutL = (d.frames - 1).toLong * dstRate / d.sampleRate + 1
        if (nOutL * d.channels * 2 > PngPixels.MaxDecodedBytes) None
        else {
          val nOut = nOutL.toInt
          val out = new Array[Short](nOut * d.channels)
          var j = 0
          while (j < nOut) {
            val num = j.toLong * d.sampleRate
            val i0 = (num / dstRate).toInt
            val rem = num - i0.toLong * dstRate
            var c = 0
            while (c < d.channels) {
              val v0 = d.samples(i0 * d.channels + c).toLong
              val v1 =
                if (i0 + 1 < d.frames)
                  d.samples((i0 + 1) * d.channels + c).toLong
                else v0
              out(j * d.channels + c) =
                (v0 + (v1 - v0) * rem / dstRate).toShort
              c += 1
            }
            j += 1
          }
          Some(wavFromSamples(d.channels, dstRate, out))
        }
      }
    }

  /** Peak (gain) normalization — the loudness-alignment step an
    * audio corpus runs before features or fingerprints, re-wrapped
    * as a canonical WAV so every kernel consumes it unchanged (the
    * [[wavFromSamples]] bridge, like [[resample]]).
    *
    * INTEGER-EXACT contract the oracle replays verbatim:
    * `v' = sign(v) * (|v| * targetPeak / maxAbs)` with Long
    * truncating division of a NON-NEGATIVE quotient (so SQL `//`
    * agrees for every sample, negatives included); an all-zero clip
    * passes through unchanged. `targetPeak <= 32767` keeps every
    * output in PCM16 range by construction. */
  def normalize(bytes: Array[Byte], targetPeak: Int): Option[Array[Byte]] = {
    require(targetPeak >= 1 && targetPeak <= 32767, s"peak $targetPeak")
    decode(bytes).map { d =>
      var maxAbs = 0L
      var i = 0
      while (i < d.samples.length) {
        val a = math.abs(d.samples(i).toLong)
        if (a > maxAbs) maxAbs = a
        i += 1
      }
      if (maxAbs == 0L) wavFromSamples(d.channels, d.sampleRate, d.samples)
      else {
        val out = new Array[Short](d.samples.length)
        i = 0
        while (i < out.length) {
          val v = d.samples(i).toLong
          val s = math.abs(v) * targetPeak / maxAbs
          out(i) = (if (v < 0) -s else s).toShort
          i += 1
        }
        wavFromSamples(d.channels, d.sampleRate, out)
      }
    }
  }

  /** One merged run of voice-active windows ([[vad]]). */
  final case class VadSegment(seg: Int, startWin: Int, nWin: Int,
      sumSq: Long, nClip: Int)

  /** Energy-based voice-activity detection — the speech-curation
    * front gate (silence trimming, clip detection) a speech corpus
    * runs before transcription or feature extraction.
    *
    * Windows of `winFrames` frames (tail partial window included);
    * a window is ACTIVE iff its total energy exceeds `thrAvg` per
    * sample — the integer-exact comparison `sumSq > thrAvg * n`, so
    * an oracle replays every verdict without float tolerance.
    * Consecutive active windows merge into segments carrying their
    * total energy and the count of clipped samples (±32767/−32768 —
    * the recording-chain defect a curator drops clips for).
    * Map-only per row: at 100 TB the cost is the scan. */
  def vad(bytes: Array[Byte], winFrames: Int, thrAvg: Int)
      : Option[Array[VadSegment]] =
    decode(bytes).map { d =>
      val nWin = (d.frames + winFrames - 1) / winFrames
      val out = scala.collection.mutable.ArrayBuffer.empty[VadSegment]
      var seg = -1
      var w = 0
      while (w < nWin) {
        val f0 = w * winFrames
        val f1 = math.min(f0 + winFrames, d.frames)
        var sumSq = 0L
        var nClip = 0
        var i = f0 * d.channels
        val end = f1 * d.channels
        while (i < end) {
          val v = d.samples(i).toLong
          sumSq += v * v
          if (v == 32767 || v == -32768) nClip += 1
          i += 1
        }
        val n = (end - f0 * d.channels).toLong
        val active = sumSq > thrAvg * n
        if (active) {
          if (out.nonEmpty && out.last.startWin + out.last.nWin == w &&
            seg == out.length - 1) {
            val last = out.last
            out(out.length - 1) = last.copy(nWin = last.nWin + 1,
              sumSq = last.sumSq + sumSq, nClip = last.nClip + nClip)
          } else {
            seg = out.length
            out += VadSegment(seg, w, 1, sumSq, nClip)
          }
        }
        w += 1
      }
      out.toArray
    }

  /** The VAD fixture sample contract, replayed by the SQL oracle:
    * 64-frame sections, a section is LOUD iff (sec + id) mod 4 < 2
    * (so active runs span two windows and the merge logic is
    * exercised), loud samples sweep ±2048 with a hard-clipped
    * 32767 on channel 0 every 101st frame, quiet samples are ±3
    * noise. */
  def vadSamp(id: Long, frame: Int, c: Int): Int = {
    val sec = frame / 64
    if (math.floorMod(sec + id, 4L) < 2) {
      if (frame % 101 == 0 && c == 0) 32767
      // step 131 wraps the 4096 range inside every 64-frame window,
      // so no loud window can land near zero energy (step 3 bottoms
      // out at avg 3.1k — under any sane threshold; 131 at 1.36M)
      else math.floorMod(131L * frame + 7L * id + 5L * c, 4096L).toInt - 2048
    } else math.floorMod(frame + c, 7).toInt - 3
  }

  /** Canonical RIFF/WAVE container around GIVEN interleaved PCM16
    * samples — the re-wrap half that lets any decoded audio track
    * (e.g. an AVI `auds` stream, [[Avi.decodeAv]]) flow into every
    * WAV kernel (`wav_stats`, `wav_windows`, `wav_pcm_bytes`)
    * unchanged. Whole frames only. */
  def wavFromSamples(
      channels: Int, sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && channels <= 8 && sampleRate > 0,
      s"channels=$channels rate=$sampleRate")
    require(samples.length > 0 && samples.length % channels == 0,
      s"${samples.length} samples do not tile $channels channels")
    val dataBytes = samples.length * 2
    val bos = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    tag("RIFF"); le32(4 + 24 + 8 + dataBytes); tag("WAVE")
    tag("fmt "); le32(16)
    le16(1); le16(channels); le32(sampleRate)
    le32(sampleRate * channels * 2); le16(channels * 2); le16(16)
    tag("data"); le32(dataBytes)
    var i = 0
    while (i < samples.length) { le16(samples(i) & 0xffff); i += 1 }
    bos.toByteArray
  }

  /** Real decode of the PCM16 + G.711 µ-law subset; None on anything
    * dirty. µ-law (format tag 7, 8-bit — the telephony/callcenter
    * encoding a speech crawl actually contains) expands to PCM16 via
    * the standard G.711 formula, so every downstream kernel sees the
    * same `Decoded` shape. */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decode0(bytes)
    catch { case _: Exception => None }
  }

  /** G.711 µ-law byte → linear PCM16 (the standard reference
    * expansion, SQL-replicable): complement, then
    * `t = (((u & 15) << 3) + 0x84) << ((u >> 4) & 7)`, sign by bit 7.
    * Public so fixtures, oracles-by-construction and generated code
    * share one definition. */
  def ulawToPcm(uByte: Int): Int = {
    val u = ~uByte & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  private def decode0(b: Array[Byte]): Option[Decoded] = {
    def tagAt(o: Int, t: String): Boolean =
      o + 4 <= b.length && new String(b, o, 4, "US-ASCII") == t
    def le32(o: Int): Long =
      ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    if (b.length < 12 || !tagAt(0, "RIFF") || !tagAt(8, "WAVE")) return None
    var pos = 12
    var channels = 0; var sampleRate = 0; var fmtTag = 0
    var dataOff = -1; var dataLen = 0L
    while (pos + 8 <= b.length && (channels == 0 || dataOff < 0)) {
      val isFmt = tagAt(pos, "fmt ")
      val isData = tagAt(pos, "data")
      val size = le32(pos + 4)
      if (size < 0 || pos + 8 + size > b.length) return None
      if (isFmt) {
        if (size < 16) return None
        fmtTag = le16(pos + 8)
        channels = le16(pos + 10)
        sampleRate = le32(pos + 12).toInt
        if (channels <= 0 || channels > 8 || sampleRate <= 0) return None
        val bits = le16(pos + 22)
        // subset: linear PCM16 or 8-bit µ-law (no float/ADPCM/extensible)
        if (fmtTag == 1) { if (bits != 16) return None }
        else if (fmtTag == 7) { if (bits != 8) return None }
        else return None
      } else if (isData) {
        dataOff = pos + 8
        dataLen = size
      }
      // unknown chunks (LIST, cue, bext, …) skip by size; odd chunk
      // sizes are padded to even per RIFF
      pos += 8 + size.toInt + (size % 2).toInt
    }
    if (channels == 0 || dataOff < 0) return None
    val bytesPerSample = if (fmtTag == 7) 1L else 2L
    // untrusted sizes: whole-sample frames only, capped before allocating
    if (dataLen % (bytesPerSample * channels) != 0L) return None
    if (dataLen * (2 / bytesPerSample) > PngPixels.MaxDecodedBytes) return None
    val n = (dataLen / bytesPerSample).toInt
    val samples = new Array[Short](n)
    var i = 0
    if (fmtTag == 7) {
      while (i < n) {
        samples(i) = ulawToPcm(b(dataOff + i) & 0xff).toShort
        i += 1
      }
    } else {
      while (i < n) {
        samples(i) = ((b(dataOff + 2 * i) & 0xff) |
          ((b(dataOff + 2 * i + 1) & 0xff) << 8)).toShort
        i += 1
      }
    }
    Some(Decoded(channels, sampleRate, n / channels, samples))
  }

  /** Complete µ-law RIFF/WAVE whose 8-bit samples equal
    * `(i*7 + id*13) mod 256` at flat interleaved index i — a closed
    * form a SQL oracle pushes through [[ulawToPcm]] symbolically. */
  def wavWithUlaw(
      id: Long, frames: Int, channels: Int, sampleRate: Int): Array[Byte] = {
    require(frames > 0 && channels > 0 && channels <= 8 && sampleRate > 0,
      s"frames=$frames channels=$channels rate=$sampleRate")
    val n = frames * channels
    val bos = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    tag("RIFF"); le32(4 + 24 + 8 + n + (n % 2)); tag("WAVE")
    tag("fmt "); le32(16)
    le16(7) // µ-law
    le16(channels)
    le32(sampleRate)
    le32(sampleRate * channels) // byte rate
    le16(channels) // block align
    le16(8) // bits per sample
    tag("data"); le32(n)
    var i = 0
    while (i < n) { bos.write(((i * 7 + id * 13) % 256).toInt); i += 1 }
    if (n % 2 == 1) bos.write(0) // RIFF word alignment
    bos.toByteArray
  }
}
