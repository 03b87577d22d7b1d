package graft.operators

import org.apache.spark.sql.DataFrame

/** Real image-header codecs for the two ubiquitous public formats —
  * the decode half of the multimodal column story (the reference
  * stores raw image bytes per object, 01_simple.ipynb cell 29
  * `"object": request.read()` with `"objects": True`).
  *
  * Pure functions over bytes, no image library needed:
  *  - PNG (ISO/IEC 15948): 8-byte signature, then the IHDR chunk —
  *    width/height as big-endian ints, channel count from the color
  *    type byte;
  *  - JPEG (ITU-T T.81 / JFIF): a marker-segment walk to the first
  *    frame header (SOFn), which carries height, width, and the
  *    component count.
  *
  * Unknown, truncated, or corrupt bytes parse to None — a decode
  * stage over 100 TB of crawled media must tolerate dirty rows, never
  * throw. */
object MediaCodec {

  final case class Meta(width: Int, height: Int, channels: Int, format: String)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def parse(bytes: Array[Byte]): Option[Meta] =
    if (bytes == null) None
    else parsePng(bytes).orElse(parseJpeg(bytes)).orElse(parseBmp(bytes))
      .orElse(parseWebp(bytes)).orElse(Tiff.parseTiff(bytes))

  /** WebP (RIFF container, Google WebP spec / RFC 9649): all three
    * first-chunk variants — `VP8 ` lossy (keyframe start code +
    * 14-bit dims), `VP8L` lossless (the packed 14-bit dims + alpha
    * bit), `VP8X` extended (24-bit canvas dims + alpha flag). The
    * VP8/VP8L entropy payload needs a codec library (the documented
    * seam); the dimensions/alpha a pipeline filters on parse for
    * real. */
  def parseWebp(b: Array[Byte]): Option[Meta] = {
    if (b.length < 21 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') return None
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le24(o: Int): Int = le16(o) | ((b(o + 2) & 0xff) << 16)
    def le32(o: Int): Long = le24(o).toLong | ((b(o + 3) & 0xffL) << 24)
    val tag = new String(Array(b(12), b(13), b(14), b(15)), "US-ASCII")
    val size = le32(16)
    val d = 20 // chunk payload offset
    if (d + size > b.length) return None
    tag match {
      case "VP8 " =>
        // 3-byte frame tag, keyframe start code, 14-bit dims
        if (size < 10 || (b(d + 3) & 0xff) != 0x9d ||
          (b(d + 4) & 0xff) != 0x01 || (b(d + 5) & 0xff) != 0x2a) None
        else {
          val w = le16(d + 6) & 0x3fff
          val h = le16(d + 8) & 0x3fff
          if (w > 0 && h > 0) Some(Meta(w, h, 3, "webp")) else None
        }
      case "VP8L" =>
        if (size < 5 || (b(d) & 0xff) != 0x2f) None
        else {
          val bits = le32(d + 1)
          val w = (bits & 0x3fff).toInt + 1
          val h = ((bits >> 14) & 0x3fff).toInt + 1
          val alpha = ((bits >> 28) & 1) == 1
          Some(Meta(w, h, if (alpha) 4 else 3, "webp"))
        }
      case "VP8X" =>
        if (size < 10) None
        else {
          val alpha = (b(d) & 0x10) != 0
          val w = le24(d + 4) + 1
          val h = le24(d + 7) + 1
          Some(Meta(w, h, if (alpha) 4 else 3, "webp"))
        }
      case _ => None
    }
  }

  /** 'BM' magic + the shared BITMAPINFOHEADER prefix (24bpp subset,
    * |height| for the top-down storage convention). */
  def parseBmp(b: Array[Byte]): Option[Meta] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    def le32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    if (le32(14) < 40 || le16(28) != 24) return None
    val w = le32(18); val h = math.abs(le32(22))
    if (w <= 0 || h <= 0) return None
    Some(Meta(w, h, 3, "bmp"))
  }

  /** Signature + IHDR (must be the first chunk per the spec). */
  def parsePng(b: Array[Byte]): Option[Meta] = {
    if (b.length < 26) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val channels = (b(25) & 0xff) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    if (w <= 0 || h <= 0) None else Some(Meta(w, h, channels, "png"))
  }

  /** SOI, then walk marker segments to the first SOFn frame header
    * (C0-CF minus C4/C8/CC, which are huffman/arithmetic tables). */
  def parseJpeg(b: Array[Byte]): Option[Meta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      // standalone markers carry no length field
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) { i += 2 }
      else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        val isSof = m >= 0xc0 && m <= 0xcf &&
          m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (i + 9 >= b.length) return None
          val h0 = be16(b, i + 5)
          val w0 = be16(b, i + 7)
          val nc = b(i + 9) & 0xff
          return if (w0 > 0 && h0 > 0 && nc > 0) Some(Meta(w0, h0, nc, "jpeg"))
          else None
        }
        i += 2 + len
      }
    }
    None
  }
}

/** Deterministic generators of VALID media bytes — the writer half,
  * used by fixtures and the declared multimodal query (this container
  * ships no image libraries, so fixture media are generated; the bytes
  * are real format structure: correct signatures, chunk layout, and
  * CRCs, parseable by any standards-compliant reader). */
object MediaFixtures {

  /** Header-complete PNG: signature + IHDR (+ real CRC32) + IEND. */
  def png(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    val chunk = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(chunk)
    d.writeBytes("IHDR"); d.writeInt(w); d.writeInt(h)
    d.write(8); d.write(colorType); d.write(0); d.write(0); d.write(0)
    val body = chunk.toByteArray
    out.writeInt(body.length - 4) // chunk length excludes the type tag
    out.write(body)
    val crc = new java.util.zip.CRC32(); crc.update(body)
    out.writeInt(crc.getValue.toInt)
    out.writeInt(0)
    val iend = "IEND".getBytes("US-ASCII")
    out.write(iend)
    val c2 = new java.util.zip.CRC32(); c2.update(iend)
    out.writeInt(c2.getValue.toInt)
    bos.toByteArray
  }

  /** Minimal JFIF: SOI + APP0 + SOF0 frame header + EOI. */
  def jpeg(w: Int, h: Int, nComponents: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0
    out.writeShort(16)
    out.writeBytes("JFIF"); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0) // aspect-ratio units
    out.writeShort(1); out.writeShort(1) // density
    out.write(0); out.write(0) // no thumbnail
    out.write(0xff); out.write(0xc0) // SOF0 (baseline)
    out.writeShort(8 + 3 * nComponents)
    out.write(8) // precision
    out.writeShort(h); out.writeShort(w)
    out.write(nComponents)
    var c = 0
    while (c < nComponents) {
      out.write(c + 1); out.write(0x11); out.write(0); c += 1
    }
    out.write(0xff); out.write(0xd9) // EOI
    bos.toByteArray
  }

  /** Full pixel-bearing PNG for one row id ([[PngPixels]]): small
    * deterministic dimensions (the SQL oracle brute-forces every
    * pixel), both supported color types, and — via the (y+id)%5
    * filter cycle inside the writer — all five scanline filters. */
  def pixelMediaFor(id: Long): Array[Byte] = {
    val w = (8 + math.floorMod(id, 40)).toInt
    val h = (8 + math.floorMod(id, 30)).toInt
    PngPixels.pngWithPixels(id, w, h, if (id % 2 == 0) 2 else 0)
  }

  /** WEB-subset PNG fixture for one row id: cycles through ALL FIVE
    * depth-8 color types (0 gray, 2 truecolor, 3 palette, 4
    * gray+alpha, 6 RGBA) and stores every third image in the Adam7
    * interlaced layout — the crawl-reality PNG grammar. Decoded
    * pixels stay on the analytic contracts ([[PngPixels.pix]],
    * [[PngPixels.pal]]) so the SQL oracle brute-forces every pixel. */
  def webPixelMediaFor(id: Long): Array[Byte] = {
    val types = Array(0, 2, 3, 4, 6)
    val w = (8 + math.floorMod(id, 40)).toInt
    val h = (8 + math.floorMod(id, 30)).toInt
    PngPixels.pngWithPixels(id, w, h, types(math.floorMod(id, 5).toInt),
      interlaced = id % 3 == 0)
  }

  /** Full pixel-bearing DC-only JPEG for one row id ([[JpegDc]]):
    * block-grid dimensions, both component counts, and a real Huffman
    * entropy stream. */
  def jpegPixelMediaFor(id: Long): Array[Byte] = {
    val w = 8 * (1 + math.floorMod(id, 6)).toInt
    val h = 8 * (1 + math.floorMod(id, 5)).toInt
    JpegDc.jpegWithPixels(id, w, h, if (id % 2 == 0) 3 else 1)
  }

  /** Animated-GIF fixture ([[Gif.gifWithFrames]]): frame count and
    * dims vary deterministically; ODD ids store their rows in the
    * four-pass INTERLACED layout (the decoder permutes them back, so
    * the pixel contract [[Gif.pix]] — and every oracle built on it —
    * is layout-independent). */
  def gifMediaFor(id: Long): Array[Byte] = {
    val frames = (2 + id % 3).toInt
    val w = (8 + math.floorMod(id * 5, 25)).toInt
    val h = (6 + math.floorMod(id * 7, 20)).toInt
    Gif.gifWithFrames(id, w, h, frames, interlaced = id % 2 == 1)
  }

  /** Delta-frame animated-GIF fixture ([[Gif.gifWithDeltaFrames]]):
    * frame 0 full-canvas, later frames sub-rects with transparency
    * holes — the composited-animation surface. Geometry is affine-mod
    * in (id, f) so the SQL oracle re-derives every rectangle. */
  def gifDeltaMediaFor(id: Long): Array[Byte] = {
    val w = (8 + math.floorMod(id * 5, 17)).toInt
    val h = (6 + math.floorMod(id * 7, 13)).toInt
    val frames = (2 + id % 3).toInt
    Gif.gifWithDeltaFrames(id, w, h, frames)
  }

  /** PCM16 WAV fixture ([[WavPcm.wavWithSamples]]): frame count, layout
    * (mono/stereo), and sample rate all vary deterministically; samples
    * follow the pure contract [[WavPcm.samp]]. */
  def wavMediaFor(id: Long): Array[Byte] = {
    val frames = (100 + math.floorMod(id * 13, 400)).toInt
    val channels = (1 + id % 2).toInt
    val rate = (8000 * (1 + id % 3)).toInt
    WavPcm.wavWithSamples(id, frames, channels, rate)
  }

  /** CDC fixture ([[Cdc]]): blobs assembled from a SHARED 17-segment
    * pool (segment p: 256 + (p*37)%512 bytes, byte k =
    * (k*31 + p*97) mod 251), so different docs genuinely share runs
    * of content and content-defined chunks resynchronize across
    * them — the dedup the declared query measures is real. */
  def cdcMediaFor(id: Long): Array[Byte] = {
    val nSeg = (4 + id % 3).toInt
    val bos = new java.io.ByteArrayOutputStream()
    var j = 0
    while (j < nSeg) {
      val p = math.floorMod(id * 3 + j * 5, 17L).toInt
      val len = 256 + (p * 37) % 512
      var k = 0
      while (k < len) { bos.write((k * 31 + p * 97) % 251); k += 1 }
      j += 1
    }
    bos.toByteArray
  }

  /** VAD fixture ([[WavPcm.vadSamp]] through [[WavPcm
    * .wavFromSamples]]): whole 64-frame sections, loud/quiet per the
    * (sec + id) mod 4 contract with hard-clipped samples in loud
    * sections — speech-shaped audio whose every segment verdict the
    * oracle re-derives. */
  def wavVadMediaFor(id: Long): Array[Byte] = {
    val channels = (1 + id % 2).toInt
    val frames = 64 * (12 + id % 6).toInt
    val samples = new Array[Short](frames * channels)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        samples(f * channels + c) = WavPcm.vadSamp(id, f, c).toShort
        c += 1
      }
      f += 1
    }
    WavPcm.wavFromSamples(channels, 16000, samples)
  }

  /** Gzipped two-record WARC fixture (warcinfo + response): the
    * response payload is a deterministic HTML page built entirely
    * from id (12 closed-form tokens), so the SQL oracle re-derives
    * the extracted text without any gzip/WARC machinery —
    * [[Warc.warcGz]]. */
  def warcMediaFor(id: Long): Array[Byte] = {
    val toks = (0 until 12).map(j => "w" + ((id * 7 + j) % 50)).mkString(" ")
    val html =
      s"<html><body><h1>Page $id</h1><p>$toks</p></body></html>"
    val uri = s"http://site${id % 37}.example.com/p/$id"
    Warc.warcGz(uri, html, s"software: graft-fixture $id")
  }

  /** Zstd-framed WARC fixture — CommonCrawl's newer `.warc.zst` dump
    * shape: the SAME closed-form two-record WARC as [[warcMediaFor]]
    * but wrapped in a real zstd frame instead of gzip
    * ([[Zstd.zstEncode]] variants 0-2 by id: raw block + checksum,
    * two concatenated frames, skippable + compressed raw-literals
    * block; the sequence variants need periodic content so the
    * sequence machinery is exercised by `zstd_extract` and the
    * external-conformance spec instead). */
  def warcZstMediaFor(id: Long): Array[Byte] = {
    val toks = (0 until 12).map(j => "w" + ((id * 7 + j) % 50)).mkString(" ")
    val html =
      s"<html><body><h1>Page $id</h1><p>$toks</p></body></html>"
    val uri = s"http://site${id % 37}.example.com/p/$id"
    val plain = Warc.warcPlain(uri, html, s"software: graft-fixture $id")
    Zstd.zstEncode(plain, math.floorMod(id, 3).toInt)
  }

  /** JPEG-in-TIFF fixture (Compression 7, new-style): one strip
    * holding a REAL decodable baseline JPEG under the same DC block
    * contract as [[jpegMediaFor]] — so the jpeg_pixels analytic
    * oracle form carries over unchanged; photometric 6 (YCbCr) for
    * color, 1 for gray; byte order by id%3. */
  def tiffJpegFor(id: Long): Array[Byte] = {
    val w = 8 * (1 + id % 6).toInt
    val h = 8 * (1 + id % 5).toInt
    val ch = if (id % 2 == 0) 3 else 1
    val jpeg = JpegDc.jpegWithPixels(id, w, h, ch)
    Tiff.tiffContainer(w, h, ch, if (ch == 3) 6 else 1,
      compression = 7, rowsPerStrip = h, littleEndian = id % 3 != 0,
      predictor = 1, strips = Seq(jpeg))
  }

  /** Standalone TIFF fixture: both byte orders by parity, closed-form
    * dims, IFD0 geometry tags ([[Tiff.tiff]]). */
  def tiffMediaFor(id: Long): Array[Byte] =
    Tiff.tiff((20 + (id * 9) % 300).toInt, (15 + (id * 4) % 200).toInt,
      (1 + id % 4).toInt, littleEndian = id % 2 == 0)

  /** Pixel-decodable TIFF fixture ([[Tiff.tiffWithPixels]]):
    * closed-form pixels `(7x+13y+29c+31·id)%256`, photometric
    * cycling gray / WhiteIsZero-inverted gray / chunky RGB (id%3),
    * compression cycling none / PackBits / LZW / deflate (id%4, all
    * byte-exact so ONE oracle covers them), horizontal predictor on
    * the LZW/deflate ids where id%8 >= 4, 1-4 rows per strip, byte
    * order by id%5. */
  def tiffPixelMediaFor(id: Long): Array[Byte] = {
    val photometric = math.floorMod(id, 3) match {
      case 0 => 1
      case 1 => 0
      case _ => 2
    }
    val compression = math.floorMod(id, 4) match {
      case 0 => 1
      case 1 => 32773
      case 2 => 5
      case _ => 8
    }
    val predictor =
      if ((compression == 5 || compression == 8) && id % 8 >= 4) 2 else 1
    Tiff.tiffWithPixels(id, (6 + id % 11).toInt, (4 + id % 7).toInt,
      photometric, compression,
      rowsPerStrip = (1 + id % 4).toInt, littleEndian = id % 5 != 0,
      predictor = predictor)
  }

  /** (r10) SEGMENTED-grammar TIFF fixture: the same pixel contract
    * through tiled × planar × 16-bit × compression × byte-order ×
    * predictor variants ([[Tiff.tiffWithPixelsExt]]; 16-bit samples
    * are `px·257`, so the 8-bit high-byte view stays on the classic
    * contract and ONE analytic oracle covers every variant). Image
    * 20×21 with 16×16 tiles = a 2×2 grid with right+bottom padding. */
  def tiffExtMediaFor(id: Long): Array[Byte] = {
    val photometric = math.floorMod(id, 3) match {
      case 0 => 1
      case 1 => 0
      case _ => 2
    }
    val compression = math.floorMod(id, 4) match {
      case 0 => 1
      case 1 => 32773
      case 2 => 5
      case _ => 8
    }
    Tiff.tiffWithPixelsExt(id, 20, 21, photometric, compression,
      littleEndian = id % 5 != 0,
      predictor = if (id % 8 >= 4) 2 else 1,
      bps = if (id % 2 == 0) 8 else 16,
      planar = if (math.floorMod(id, 7) < 3) 1 else 2,
      tile = if (math.floorMod(id, 9) < 5) Some((16, 16)) else None,
      rowsPerStrip = (3 + id % 5).toInt)
  }

  /** JPEG-with-EXIF fixture: a REAL decodable baseline JPEG
    * ([[JpegDc.jpegWithPixels]], DC block contract at seed id) with an
    * APP1 Exif segment spliced after SOI — orientation/make/model/
    * datetime/pixel-dims all closed forms, byte order by parity
    * ([[Tiff.exifApp1]], [[Tiff.withExif]]). */
  def jpegExifMediaFor(id: Long): Array[Byte] = {
    val w = 8 * (1 + id % 3).toInt
    val h = 8 * (1 + id % 2).toInt
    val base = JpegDc.jpegWithPixels(id, w, h, 1)
    val app1 = Tiff.exifApp1(
      orientation = (1 + id % 8).toInt,
      make = s"Cam${id % 5}", model = s"M${id % 7}",
      dateTime = f"2020:0${1 + id % 9}:01 12:00:00",
      exifW = w, exifH = h, littleEndian = id % 2 == 0)
    Tiff.withExif(base, app1)
  }

  /** Zstd fixture: frame headers cycling all four FCS widths (id%4:
    * undeclared, 2-byte biased, 4-byte, 8-byte), dictionary-ID widths
    * (id%3), checksum parity, and id%3 leading skippable frames
    * ([[Zstd.zstHeader]]). */
  /** FULLY decodable zstd fixture ([[Zstd.zstEncode]]): content is
    * `unit(id)` repeated `reps(id)` times — a closed form the oracle
    * replays with `repeat(...)` — encoded through the six frame
    * variants (raw, two-frame, skippable+compressed, one real LZ
    * sequence via RLE-mode tables, repeat-mode tables with a
    * cross-block match, 4-stream Huffman literals). */
  def zstFullMediaFor(id: Long): Array[Byte] = {
    val unit = s"tok${math.floorMod(id, 9)} graft zstd unit "
    val reps = (20 + math.floorMod(id, 50)).toInt
    val content = (unit * reps).getBytes("UTF-8")
    Zstd.zstEncode(content, math.floorMod(id, 6).toInt,
      period = unit.length)
  }

  def zstMediaFor(id: Long): Array[Byte] = {
    val contentSize = (id % 4) match {
      case 0 => -1L
      case 1 => 300L + id
      case 2 => 70000L + id
      case _ => 5000000000L + id
    }
    val dictId = (id % 3) match {
      case 0 => 0L
      case 1 => 200L + id % 50
      case _ => 40000L + id % 100
    }
    Zstd.zstHeader(contentSize, (id % 8).toInt, (id % 7).toInt, dictId,
      checksum = id % 2 == 1, nSkippable = (id % 3).toInt)
  }

  /** Sitemap fixture: urlset (entities in locs, lastmod on even
    * entries, explicit priorities) with a sitemapindex on id%5==4
    * ([[Sitemap.urlset]], [[Sitemap.index]]). */
  def sitemapMediaFor(id: Long): String =
    if (id % 5 == 4)
      Sitemap.index((0 until (1 + id % 3).toInt)
        .map(j => s"https://ex$id.com/s$j.xml.gz"))
    else
      Sitemap.urlset((0 until (1 + id % 4).toInt).map { j =>
        (s"https://ex$id.com/p$j?a=1&b=2",
          if (j % 2 == 0) s"2026-01-0${1 + j % 9}" else "",
          (1 + (id + j) % 9) / 10.0)
      })

  /** Parquet fixture: footer-complete blobs with closed-form schema
    * names, row counts, row-group sizes and writer string
    * ([[ParquetMeta.parquet]]). */
  def parquetMediaFor(id: Long): Array[Byte] =
    ParquetMeta.parquet(
      version = (1 + id % 2).toInt,
      numRows = 100 + id % 50,
      fieldNames = (0 until (1 + id % 3).toInt).map(j => s"c${id}_$j"),
      rowGroupBytes = (0 until (1 + id % 2).toInt)
        .map(g => 4096L * (1 + (id + g) % 5)),
      createdBy = s"graft-fixture $id")

  /** Subtitle fixture: SRT (even ids, comma decimals) / WebVTT (odd
    * ids, dot decimals + NOTE block + cue settings) with closed-form
    * timings and text; odd cues carry a second line. */
  def subtitleMediaFor(id: Long): String = {
    val cues = (0 until (1 + id % 4).toInt).map { k =>
      val start = k * 2000L + (id % 7) * 10
      val text = s"cue $k of $id" + (if (k % 2 == 1) "\nline two" else "")
      (start, start + 1500L, text)
    }
    if (id % 2 == 0) Subtitles.srt(cues) else Subtitles.vtt(cues)
  }

  /** Email fixture cycling three shapes: QP body + B-encoded-word
    * subject; multipart/mixed (base64 text/plain + an html part kept
    * out of `text`) + adjacent Q encoded-words; plain 7bit
    * ([[Mime.parse]] reverses each). */
  def emlMediaFor(id: Long): Array[Byte] = {
    val b64 = java.util.Base64.getEncoder
    val date = s"Thu, 01 Jan 2026 00:00:0${id % 10} +0000"
    val msg = (id % 3) match {
      case 0 =>
        val subj = b64.encodeToString(s"Résumé $id".getBytes("UTF-8"))
        s"""From: user$id@example.com
           |To: list@example.com
           |Subject: =?UTF-8?B?$subj?=
           |Date: $date
           |Content-Type: text/plain; charset=utf-8
           |Content-Transfer-Encoding: quoted-printable
           |
           |corps =C3=A9 $id ligne""".stripMargin
      case 1 =>
        val body = b64.encodeToString(s"part text $id".getBytes("UTF-8"))
        s"""From: user$id@example.com
           |To: list@example.com
           |Subject: =?UTF-8?Q?part_one_?= =?UTF-8?Q?$id?=
           |Date: $date
           |Content-Type: multipart/mixed; boundary="b$id"
           |
           |preamble ignored
           |--b$id
           |Content-Type: text/plain; charset=utf-8
           |Content-Transfer-Encoding: base64
           |
           |$body
           |--b$id
           |Content-Type: text/html
           |
           |<p>html $id</p>
           |--b$id--""".stripMargin
      case _ =>
        s"""From: user$id@example.com
           |To: list@example.com
           |Subject: plain subject $id
           |Date: $date
           |
           |plain body $id""".stripMargin
    }
    msg.getBytes("UTF-8")
  }

  /** Ogg fixture: Vorbis/Opus alternating by parity; closed-form
    * page count, packets per page, and granule steps; each audio
    * page carries one 300-byte packet so the 255-lace continuation
    * path is always exercised ([[Ogg.ogg]]). */
  def oggMediaFor(id: Long): Array[Byte] =
    Ogg.ogg(
      opus = id % 2 == 1,
      channels = (1 + id % 2).toInt,
      rate = if (id % 2 == 1) 48000L else 8000L * (1 + id % 3),
      nPages = (1 + id % 3).toInt,
      packetsPerPage = (2 + id % 2).toInt,
      granuleStep = 960L * (1 + id % 4),
      seed = id)

  /** PDF fixture: 1 + id%3 pages, 2 + (id+p)%3 closed-form lines per
    * page, alternating Tj/TJ show operators; odd ids wrap content
    * streams in /FlateDecode, and ids with id%4 >= 2 take the PDF 1.5
    * container form (xref STREAM + object stream) so both file shapes
    * ride the corpus under one oracle ([[Pdf.pdf]]). */
  def pdfMediaFor(id: Long): Array[Byte] = {
    val pages = (0 until (1 + id % 3).toInt).map { p =>
      (0 until (2 + (id + p) % 3).toInt).map(k => s"pdf $id p$p l$k")
    }
    Pdf.pdf(pages, deflate = id % 2 == 1, xrefStream = id % 4 >= 2)
  }

  /** Image-bearing PDF fixture ([[Pdf.pdfWithImages]]): 1 + id%2
    * pages, one image XObject per page with jid = 2*id + p — even
    * jids embed the DC-only JPEG fixture verbatim (DCTDecode, pixel
    * contract as [[jpegPixelMediaFor]] keyed by jid, 3 channels),
    * odd jids a raw gray FlateDecode image with pixel
    * (3x + 5y + 7*jid) mod 256 — so every extracted payload carries
    * a closed-form pixel contract the oracle re-derives. */
  def pdfImgMediaFor(id: Long): Array[Byte] = {
    val nPages = (1 + id % 2).toInt
    val pages = (0 until nPages).map { p =>
      (0 until 2).map(k => s"pdfimg $id p$p l$k")
    }
    val images = (0 until nPages).map { p =>
      val jid = 2 * id + p
      if (jid % 2 == 0) {
        val w = 8 * (1 + jid % 6).toInt
        val h = 8 * (1 + jid % 5).toInt
        Pdf.ImageSpec(p, w, h, jpeg = true,
          JpegDc.jpegWithPixels(jid, w, h, 3))
      } else {
        val w = (4 + jid % 13).toInt
        val h = (3 + jid % 11).toInt
        val raw = Array.tabulate[Byte](w * h) { i =>
          val x = i % w
          val y = i / w
          ((3 * x + 5 * y + 7 * jid) % 256).toByte
        }
        Pdf.ImageSpec(p, w, h, jpeg = false, raw)
      }
    }
    Pdf.pdfWithImages(pages, images, deflate = id % 2 == 1)
  }

  /** tar.gz fixture: 1 + id%3 closed-form text entries through the
    * ustar writer + gzip ([[Tar.tarGz]]) — the dataset-dump shape. */
  def tarGzMediaFor(id: Long): Array[Byte] = {
    val files = (0 until (1 + id % 3).toInt).map { j =>
      val text = s"tar file $j of $id " + "y" * ((id * 2 + j) % 7).toInt
      (s"f_${id}_$j.txt", text.getBytes("UTF-8"))
    }
    Tar.tarGz(files)
  }

  /** ZIP fixture: 1 + id%3 text entries with closed-form names and
    * content; odd ids deflate, even ids store ([[Zip.zip]]) — both
    * extraction paths cycle through the corpus. */
  /** Encoded-text fixture for the charset pipeline ([[Charset]]):
    * one closed-form sentence (with é ü ’ € —
    * all windows-1252-representable) cycled through five transfer
    * encodings by id%5: pure ASCII, UTF-8, windows-1252, UTF-16LE
    * and UTF-16BE with BOMs. The oracle replays both the sniffed
    * label and the decoded text as closed forms. */
  def encMediaFor(id: Long): Array[Byte] = {
    import java.nio.charset.StandardCharsets._
    val rich = s"doc $id caf\u00e9 m\u00fcnchen \u2019quote\u2019 " +
      s"\u20ac${id % 10}"
    math.floorMod(id, 5).toInt match {
      case 0 => s"doc $id plain ascii text".getBytes(US_ASCII)
      case 1 => rich.getBytes(UTF_8)
      case 2 => Charset.cp1252Encode(rich).get
      case 3 =>
        val body = rich.getBytes(UTF_16LE)
        val out = new Array[Byte](body.length + 2)
        out(0) = 0xff.toByte; out(1) = 0xfe.toByte
        System.arraycopy(body, 0, out, 2, body.length)
        out
      case _ =>
        val body = rich.getBytes(UTF_16BE)
        val out = new Array[Byte](body.length + 2)
        out(0) = 0xfe.toByte; out(1) = 0xff.toByte
        System.arraycopy(body, 0, out, 2, body.length)
        out
    }
  }

  def zipMediaFor(id: Long): Array[Byte] = {
    val files = (0 until (1 + id % 3).toInt).map { j =>
      val text = s"file $j of archive $id " + "x" * ((id + j) % 9).toInt
      (s"doc_${id}_$j.txt", text.getBytes("UTF-8"))
    }
    Zip.zip(files, deflate = id % 2 == 1)
  }

  /** WebP fixture cycling the three container variants (`VP8 ` lossy
    * keyframe header, `VP8L` lossless packed dims, `VP8X` extended
    * canvas) with closed-form dims and alpha on the even residue —
    * real container structure; the entropy payload is filler (the
    * documented codec seam, exactly what [[MediaCodec.parseWebp]]
    * reads through). */
  def webpMediaFor(id: Long): Array[Byte] = {
    val w = (16 + (id * 7) % 200).toInt
    val h = (12 + (id * 5) % 150).toInt
    val alpha = id % 2 == 0
    val payload = new java.io.ByteArrayOutputStream()
    val tag = (id % 3).toInt match {
      case 0 =>
        payload.write(0x30); payload.write(0x00); payload.write(0x00)
        payload.write(0x9d); payload.write(0x01); payload.write(0x2a)
        payload.write(w & 0xff); payload.write((w >> 8) & 0x3f)
        payload.write(h & 0xff); payload.write((h >> 8) & 0x3f)
        "VP8 "
      case 1 =>
        payload.write(0x2f)
        val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
          (if (alpha) 1L << 28 else 0L)
        payload.write((bits & 0xff).toInt)
        payload.write(((bits >> 8) & 0xff).toInt)
        payload.write(((bits >> 16) & 0xff).toInt)
        payload.write(((bits >> 24) & 0xff).toInt)
        "VP8L"
      case _ =>
        payload.write(if (alpha) 0x10 else 0x00)
        payload.write(0); payload.write(0); payload.write(0)
        payload.write((w - 1) & 0xff); payload.write(((w - 1) >> 8) & 0xff)
        payload.write(((w - 1) >> 16) & 0xff)
        payload.write((h - 1) & 0xff); payload.write(((h - 1) >> 8) & 0xff)
        payload.write(((h - 1) >> 16) & 0xff)
        "VP8X"
    }
    // deterministic entropy-payload filler
    var i = 0
    val fill = (6 + id % 20).toInt
    while (i < fill) { payload.write(((id * 17 + i) & 0xff).toInt); i += 1 }
    val p = payload.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val riffLen = 4 + 8 + p.length + (p.length % 2)
    out.write(riffLen & 0xff); out.write((riffLen >> 8) & 0xff)
    out.write((riffLen >> 16) & 0xff); out.write((riffLen >> 24) & 0xff)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(tag.getBytes("US-ASCII"))
    out.write(p.length & 0xff); out.write((p.length >> 8) & 0xff)
    out.write((p.length >> 16) & 0xff); out.write((p.length >> 24) & 0xff)
    out.write(p, 0, p.length)
    if (p.length % 2 == 1) out.write(0)
    out.toByteArray
  }

  /** Pixel-bearing LOSSLESS WebP fixture (VP8L, [[Webp.encode]]):
    * real entropy-coded streams whose decoded pixels follow closed
    * forms the oracle replays analytically. `id % 7` cycles the
    * coding features — the transforms and coding modes are lossless
    * re-encodings, so the pixel contract is feature-independent:
    *
    *  - 0: meta-prefix image, two tree groups
    *  - 1: subtract-green + a REAL alpha channel (4-channel output),
    *       alpha = pix(id,x,y,3)
    *  - 2: predictor transform, mode (bx+by+id) % 14 per 4-px block
    *  - 3: cross-color transform, per-block signed multipliers
    *  - 4: color cache (6 bits)
    *  - 5: LZ77 row copies — pixels follow pix(id,x,y%4,c) so rows
    *       repeat with period 4 (the 2D distance-map branch)
    *  - 6: color indexing with 5..13 colors (4-bit packed indices),
    *       palette entry j = [[PngPixels.pal]](j,c),
    *       index (x + 2y + id) % nColors
    *
    * All other variants: pixel (x,y,c) = [[PngPixels.pix]](id,x,y,c),
    * alpha 255, 3-channel output. */
  def webpPixelMediaFor(id: Long): Array[Byte] = {
    val w = (5 + (id * 3) % 17).toInt
    val h = (4 + (id * 5) % 13).toInt
    val variant = (id % 7).toInt
    def std(x: Int, y: Int): Int = {
      val a = if (variant == 1) PngPixels.pix(id, x, y, 3) else 255
      (a << 24) | (PngPixels.pix(id, x, y, 0) << 16) |
        (PngPixels.pix(id, x, y, 1) << 8) | PngPixels.pix(id, x, y, 2)
    }
    variant match {
      case 5 =>
        val argb = Array.tabulate(w * h) { i =>
          val x = i % w; val y = (i / w) % 4
          0xff000000 | (PngPixels.pix(id, x, y, 0) << 16) |
            (PngPixels.pix(id, x, y, 1) << 8) | PngPixels.pix(id, x, y, 2)
        }
        Webp.encode(argb, w, h, Webp.EncodeOptions(lzRowPeriod = 4))
      case 6 =>
        val n = (5 + id % 9).toInt
        val pal = Array.tabulate(n)(j => 0xff000000 |
          (PngPixels.pal(j, 0) << 16) | (PngPixels.pal(j, 1) << 8) |
          PngPixels.pal(j, 2))
        val argb = Array.tabulate(w * h) { i =>
          val x = i % w; val y = i / w
          pal(((x + 2 * y + id) % n).toInt)
        }
        Webp.encode(argb, w, h, Webp.EncodeOptions(palette = Some(pal)))
      case v =>
        val argb = Array.tabulate(w * h)(i => std(i % w, i / w))
        val opts = v match {
          case 0 => Webp.EncodeOptions(metaSplit = true)
          case 1 => Webp.EncodeOptions(subtractGreen = true,
            alphaHint = true)
          case 2 => Webp.EncodeOptions(predictorBits = 2,
            predictorModeOf = (bx, by) => ((bx + by + id) % 14).toInt)
          case 3 => Webp.EncodeOptions(colorBits = 2,
            cteOf = (bx, by) => (((bx * 17 + id) % 256).toInt,
              ((by * 23 + id) % 256).toInt,
              (((bx + by) * 29 + id) % 256).toInt))
          case _ => Webp.EncodeOptions(cacheBits = 6)
        }
        Webp.encode(argb, w, h, opts)
    }
  }

  /** G.711 µ-law WAV fixture: 8-bit samples `(i*7 + id*13) mod 256`
    * at flat interleaved index i, telephony-rate mono/stereo — the
    * decode expands through [[WavPcm.ulawToPcm]], whose formula the
    * SQL oracle replays symbolically. */
  def ulawMediaFor(id: Long): Array[Byte] = {
    val frames = (80 + math.floorMod(id * 11, 300)).toInt
    val channels = (1 + id % 2).toInt
    WavPcm.wavWithUlaw(id, frames, channels, 8000)
  }

  /** MP3 stream fixture: layer-III frames with every header field a
    * closed form of id (version, bitrate index, mono flag, ID3v2/v1
    * presence on residue classes) — [[Mp3.mp3WithFrames]]. */
  def mp3MediaFor(id: Long): Array[Byte] = {
    Mp3.mp3WithFrames(id,
      nFrames = (10 + math.floorMod(id * 3, 40)).toInt,
      mpeg1 = id % 2 == 0,
      brIdx = (1 + (id % 3) * 4).toInt,
      mono = id % 3 == 0,
      id3v2 = id % 2 == 0,
      id3v1 = id % 5 == 0)
  }

  /** MJPEG-MP4 fixture with the SAME shape formulas and per-frame
    * pixel contract as [[aviMediaFor]] ([[Avi.frameSeed]]), so the
    * mp4 frame oracle is the same closed form — the engine value went
    * through the ISO-BMFF box walk + real stsc/stsz/stco sample-table
    * resolution instead of the RIFF chunk walk. */
  def mp4MediaFor(id: Long): Array[Byte] = {
    val w = 8 * (1 + (id * 3) % 4).toInt
    val h = 8 * (1 + (id * 5) % 3).toInt
    val frames = (2 + id % 3).toInt
    Mp4.mp4WithFrames(id, w, h, frames, if (id % 2 == 0) 3 else 1)
  }

  /** Multi-track MP4 metadata fixture: the MJPEG track of
    * [[mp4MediaFor]] plus an `avc1` video track (opaque entropy data
    * — the honest codec seam, but its container metadata parses
    * fully) and an `mp4a` audio track; every parameter is a closed
    * form of id so the SQL oracle re-derives all three rows. */
  def mp4MultiMediaFor(id: Long): Array[Byte] = {
    val w = 8 * (1 + (id * 3) % 4).toInt
    val h = 8 * (1 + (id * 5) % 3).toInt
    val frames = (2 + id % 3).toInt
    Mp4.mp4MultiTrack(id, w, h, frames, if (id % 2 == 0) 3 else 1,
      avcW = 16 * (1 + id % 4).toInt, avcH = 16 * (1 + id % 3).toInt,
      avcSamples = (5 + id % 7).toInt,
      aCh = (1 + id % 2).toInt, aRate = 8000 * (1 + id % 3).toInt,
      aSamples = (30 + id % 20).toInt)
  }

  /** FLAC fixture with the SAME dimension formulas as [[wavMediaFor]]
    * and the same [[WavPcm.samp]] sample contract, so FLAC queries
    * share the WAV closed-form SQL oracle — the engine value just
    * additionally survived prediction + Rice coding + CRC-8/16 + MD5
    * ([[Flac.flacWithSamples]]; the encoder cycles subframe types,
    * stereo assignments and Rice forms by id). */
  def flacMediaFor(id: Long): Array[Byte] = {
    val frames = (100 + math.floorMod(id * 13, 400)).toInt
    val channels = (1 + id % 2).toInt
    val rate = (8000 * (1 + id % 3)).toInt
    Flac.flacWithSamples(id, frames, channels, rate)
  }

  /** Container-robust audio-dedup fixture: PCM content seeded by
    * `id % 8` (so distinct docs carry byte-identical SAMPLES), with a
    * per-id LIST metadata chunk spliced between `fmt ` and `data` (so
    * the FILE bytes are all distinct — a byte-level hash finds no
    * duplicates, only a decode-level hash does). */
  def wavTaggedMediaFor(id: Long): Array[Byte] = {
    val base = wavMediaFor(id % 8)
    val tag = s"INFO doc $id".getBytes("US-ASCII")
    val pad = tag.length % 2 // RIFF: odd chunk sizes pad to even
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 36) // RIFF header + fmt chunk (12 + 8 + 16)
    out.write("LIST".getBytes("US-ASCII"))
    out.write(tag.length & 0xff); out.write((tag.length >> 8) & 0xff)
    out.write(0); out.write(0)
    out.write(tag, 0, tag.length)
    if (pad == 1) out.write(0)
    out.write(base, 36, base.length - 36)
    val b = out.toByteArray
    val grown = b.length - 8
    b(4) = (grown & 0xff).toByte
    b(5) = ((grown >> 8) & 0xff).toByte
    b(6) = ((grown >> 16) & 0xff).toByte
    b(7) = ((grown >> 24) & 0xff).toByte
    b
  }

  /** Gain-variant audio-dedup fixture: PCM content is
    * `samp(id % 6, i) * (1 + id % 4)` — the SAME recording at four
    * amplitude levels, plus a per-id LIST metadata tag. Three dedup
    * tiers tell three different stories on this table: byte hashing
    * finds nothing (tags differ), decoded-PCM hashing groups only
    * same-gain copies, and the spectral fingerprint (per-window
    * dominant DFT bin — invariant under linear scaling) groups every
    * gain variant of a recording. */
  def wavGainMediaFor(id: Long): Array[Byte] = {
    val seed = math.floorMod(id, 6L)
    val gain = (1 + math.floorMod(id, 4L)).toInt
    val frames = (128 + math.floorMod(seed * 13, 128L)).toInt
    val samples = new Array[Short](frames)
    var i = 0
    while (i < frames) {
      samples(i) = (WavPcm.samp(seed, i) * gain).toShort
      i += 1
    }
    val base = WavPcm.wavFromSamples(1, 8000, samples)
    val tag = s"INFO doc $id".getBytes("US-ASCII")
    val pad = tag.length % 2
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 36)
    out.write("LIST".getBytes("US-ASCII"))
    out.write(tag.length & 0xff); out.write((tag.length >> 8) & 0xff)
    out.write(0); out.write(0)
    out.write(tag, 0, tag.length)
    if (pad == 1) out.write(0)
    out.write(base, 36, base.length - 36)
    val b = out.toByteArray
    val grown = b.length - 8
    b(4) = (grown & 0xff).toByte
    b(5) = ((grown >> 8) & 0xff).toByte
    b(6) = ((grown >> 16) & 0xff).toByte
    b(7) = ((grown >> 24) & 0xff).toByte
    b
  }

  /** Pixel-bearing BMP fixture ([[Bmp.bmpWithPixels]]): widths cycle
    * every row-padding residue (w*3 mod 4), odd ids store TOP-DOWN
    * (negative height) — both storage orders, same analytic pixels. */
  def bmpMediaFor(id: Long): Array[Byte] = {
    val w = (5 + math.floorMod(id, 21)).toInt
    val h = (4 + math.floorMod(id, 17)).toInt
    Bmp.bmpWithPixels(id, w, h, topDown = id % 2 == 1)
  }

  /** Full-baseline JPEG fixture with REAL AC coefficients
    * ([[JpegDc.jpegWithAcPixels]]): non-multiple-of-8 dims (edge-block
    * cropping on the decode path), both component counts, run-length
    * AC entropy coding through the full Annex K table. Decoded pixels
    * follow the exact-integer contract [[JpegDc.acPix]]. */
  def jpegAcMediaFor(id: Long): Array[Byte] = {
    val w = (10 + math.floorMod(id * 7, 29)).toInt
    val h = (9 + math.floorMod(id * 5, 23)).toInt
    JpegDc.jpegWithAcPixels(id, w, h, if (id % 2 == 0) 3 else 1)
  }

  /** RESTART-MARKER full-baseline JPEG fixture
    * ([[JpegDc.jpegWithAcPixelsRestart]]): the [[jpegAcMediaFor]]
    * shapes cut into restart intervals of 1..5 MCUs — every fixture
    * carries a DRI segment and real RSTn markers (cycling past RST7
    * for the small intervals), with DC prediction restarting at zero
    * in each interval. Decoded pixels follow the same exact-integer
    * contract [[JpegDc.acPix]], so a decoder that skips the predictor
    * reset or mis-aligns at a marker fails positionally. */
  def jpegRstMediaFor(id: Long): Array[Byte] = {
    val w = (10 + math.floorMod(id * 7, 29)).toInt
    val h = (9 + math.floorMod(id * 5, 23)).toInt
    JpegDc.jpegWithAcPixelsRestart(id, w, h,
      if (id % 2 == 0) 3 else 1, ri = (1 + id % 5).toInt)
  }

  /** CHROMA-SUBSAMPLED full-baseline JPEG fixture
    * ([[JpegDc.jpegWithAcPixelsSampled]]): the id cycles through the
    * three subsampled layouts real crawls contain — 4:2:0 (id%3=0,
    * the dominant web layout), 4:2:2 (id%3=1), 4:4:0 (id%3=2) — with
    * non-multiple-of-16 dims so both luma AND chroma edge blocks
    * crop. Decoded pixels follow the exact-integer contract
    * [[JpegDc.subPix]]. */
  def jpegSubMediaFor(id: Long): Array[Byte] = {
    val w = (10 + math.floorMod(id * 7, 29)).toInt
    val h = (9 + math.floorMod(id * 5, 23)).toInt
    val (yH, yV) = (id % 3) match {
      case 0 => (2, 2) // 4:2:0
      case 1 => (2, 1) // 4:2:2
      case _ => (1, 2) // 4:4:0
    }
    JpegDc.jpegWithAcPixelsSampled(id, w, h, yH, yV)
  }

  /** PROGRESSIVE (SOF2) JPEG fixture ([[JpegDc.jpegProgressive]]):
    * the id cycles layout — 4:2:0 subsampled color (id%3=0, the
    * dominant progressive web layout), grayscale (id%3=1), 4:4:4
    * color (id%3=2) — through the full 6-scan successive-approximation
    * script (DC first/refine interleaved, AC first/refine per
    * component per spectral band, real EOB runs and correction bits).
    * Decoded pixels follow [[JpegDc.subPix]] (luma-subsampled cases)
    * / [[JpegDc.acPix]] (which subPix degenerates to at 1×1). */
  def jpegProgMediaFor(id: Long): Array[Byte] = {
    val w = (10 + math.floorMod(id * 7, 29)).toInt
    val h = (9 + math.floorMod(id * 5, 23)).toInt
    (id % 3) match {
      case 0 => JpegDc.jpegProgressive(id, w, h, 3, 2, 2)
      case 1 => JpegDc.jpegProgressive(id, w, h, 1)
      case _ => JpegDc.jpegProgressive(id, w, h, 3)
    }
  }

  /** MJPEG-AVI container-video fixture ([[Avi.aviWithFrames]]): frame
    * count, block-grid dims, and component count vary
    * deterministically; frame `f` pixels follow the DC contract at
    * seed [[Avi.frameSeed]]. Small shapes on purpose — the SQL oracle
    * brute-forces every block of every frame. */
  def aviMediaFor(id: Long): Array[Byte] = {
    val frames = (2 + id % 3).toInt
    val w = 8 * (1 + math.floorMod(id * 3, 4)).toInt
    val h = 8 * (1 + math.floorMod(id * 5, 3)).toInt
    Avi.aviWithFrames(id, w, h, frames, if (id % 2 == 0) 3 else 1)
  }

  /** Mixed-track audio+video AVI fixture ([[Avi.aviWithAv]]): the
    * [[aviMediaFor]] video shapes plus a PCM16 `auds` stream whose
    * interleaved samples follow [[WavPcm.samp]]`(id, i)` — sample
    * count, layout, and rate vary deterministically, so the SQL
    * oracle re-derives BOTH tracks analytically. */
  def aviAvMediaFor(id: Long): Array[Byte] = {
    val frames = (2 + id % 3).toInt
    val w = 8 * (1 + math.floorMod(id * 3, 4)).toInt
    val h = 8 * (1 + math.floorMod(id * 5, 3)).toInt
    val aFrames = (40 + math.floorMod(id * 11, 100)).toInt
    val aCh = (1 + id % 2).toInt
    val aRate = (8000 * (1 + id % 3)).toInt
    Avi.aviWithAv(id, w, h, frames, if (id % 2 == 0) 3 else 1,
      aFrames, aCh, aRate)
  }

  /** Mixed-format pixel fixture — PNG for even ids, DC-only JPEG for
    * odd ids, both with real pixel content, so ONE binary column
    * carries both formats (the crawl reality the format-dispatching
    * [[graft.functions.PixelStats]] exists for). Inner variation uses
    * id/2 so each format still cycles its own shapes/channel counts. */
  def mixedPixelMediaFor(id: Long): Array[Byte] =
    if (id % 2 == 0) {
      val k = id / 2
      val w = (8 + math.floorMod(k, 40)).toInt
      val h = (8 + math.floorMod(k, 30)).toInt
      PngPixels.pngWithPixels(id, w, h, if (k % 2 == 0) 2 else 0)
    } else {
      val k = id / 2
      val w = 8 * (1 + math.floorMod(k, 6)).toInt
      val h = 8 * (1 + math.floorMod(k, 5)).toInt
      JpegDc.jpegWithPixels(id, w, h, if (k % 2 == 0) 3 else 1)
    }

  /** The media bytes for one row id: format, size, and channel count
    * all vary deterministically so a fixture table exercises every
    * parse path. */
  def mediaFor(id: Long): Array[Byte] = {
    val w = (16 + math.floorMod(id * 7, 480)).toInt
    val h = (16 + math.floorMod(id * 13, 360)).toInt
    if (id % 2 == 0) png(w, h, if (id % 4 == 0) 2 else 0)
    else jpeg(w, h, if (math.floorMod(id, 4) == 1) 3 else 1)
  }

  /** Attach a deterministic `binary` media column keyed on `idCol` — a
    * codegen'd expression ([[graft.functions.MediaBytes]]), so fixture
    * attachment is not an optimizer barrier: the whole
    * generate → decode pipeline stays in one WholeStageCodegen span with
    * scan-pushdown intact. */
  def withMedia(df: DataFrame, idCol: String, outCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    import org.apache.spark.sql.functions.{col, lit, raise_error, when}
    // idCol must cast to a non-null long: a null-producing cast would
    // otherwise silently yield null media, turning a caller bug into
    // missing fixture rows — fail loudly instead. (RaiseError is
    // deterministic, so filter pushdown through this projection — the
    // plan-pinned multimodal_meta property — is unaffected.)
    val id = col(idCol).cast("long")
    val guarded = when(id.isNull,
      raise_error(lit(s"media fixture: id column '$idCol' cast to null"))
        .cast("long"))
      .otherwise(id)
    df.withColumn(outCol, Shim.column(
      graft.functions.MediaBytes(Shim.expression(guarded))))
  }

  /** Pixel-bearing twin of [[withMedia]]: attaches the full PNG bytes
    * of [[pixelMediaFor]] via the codegen'd
    * [[graft.functions.PixelMediaBytes]] — same non-null id guard,
    * same no-barrier property. */
  def withPixelMedia(df: DataFrame, idCol: String, outCol: String)
      : DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    import org.apache.spark.sql.functions.{col, lit, raise_error, when}
    val id = col(idCol).cast("long")
    val guarded = when(id.isNull,
      raise_error(lit(s"media fixture: id column '$idCol' cast to null"))
        .cast("long"))
      .otherwise(id)
    df.withColumn(outCol, Shim.column(
      graft.functions.PixelMediaBytes(Shim.expression(guarded))))
  }

  /** Web-subset twin of [[withPixelMedia]]: attaches
    * [[webPixelMediaFor]] bytes via the codegen'd
    * [[graft.functions.WebPixelMediaBytes]]. */
  def withWebPixelMedia(df: DataFrame, idCol: String, outCol: String)
      : DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    import org.apache.spark.sql.functions.{col, lit, raise_error, when}
    val id = col(idCol).cast("long")
    val guarded = when(id.isNull,
      raise_error(lit(s"media fixture: id column '$idCol' cast to null"))
        .cast("long"))
      .otherwise(id)
    df.withColumn(outCol, Shim.column(
      graft.functions.WebPixelMediaBytes(Shim.expression(guarded))))
  }
}
