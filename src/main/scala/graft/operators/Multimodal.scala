package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for LLM-data
  * pipelines: media travel as opaque `binary` columns with typed
  * metadata structs (the reference's `"objects": True` binary store,
  * 01_simple.ipynb cell 29 / SURVEY §1.3).
  *
  * The metadata decode is REAL: [[MediaCodec]] parses PNG IHDR and
  * JPEG SOFn headers (public formats, pure byte functions — no image
  * library needed) via the codegen'd [[graft.functions.ParseMedia]]
  * expression; unparseable bytes yield a null `meta`, never an
  * exception. Pixel-level IMAGE decode is real too: [[PngPixels]]
  * (zlib + all five scanline filters) and [[JpegDc]] (full baseline
  * Huffman entropy decode + IDCT) back [[decodePixelStats]] /
  * [[extractFeatures]]; AUDIO decode is real via [[WavPcm]]; and
  * frame sampling is REAL for animated GIF ([[Gif]] — full LZW) AND
  * for MJPEG-AVI container video ([[Avi]] — RIFF walk + per-frame
  * baseline-JPEG decode). Only INTER-FRAME video codecs (mp4/h264,
  * webm/vp9 — motion compensation needs a codec library this
  * container doesn't ship) stay honestly stubbed
  * ([[FakeCodec.sampleFrames]]): swapping one in is one branch in
  * [[sampleFramesKernel]]; the plan shape (no shuffle, one pass over
  * binary blobs, decode parallelism = partition count) is exactly
  * what a production decode stage looks like.
  */
object Multimodal {

  val metaSchema: StructType = graft.functions.ParseMedia.schema

  /** STUB pixel stages — deterministic fakes in place of a real pixel
    * decoder (header METADATA parsing is real, see [[MediaCodec]]).
    * Real implementation: replace the body with e.g. ImageIO /
    * ffmpeg-cli per partition; everything around it stays. */
  object FakeCodec {
    /** Fake feature vector: dim fixed-size chunked byte sums, L1-scaled —
      * deterministic, shaped like a real embedding head. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += (bytes(i) & 0xff); i += 1
      }
      val total = math.max(1L, acc.sum)
      acc.map(v => v.toFloat / total)
    }

    /** Fake frame sampler: n evenly-spaced fixed-width byte windows
      * (an inter-frame video decoder — mp4/webm — would emit decoded
      * frames here; MJPEG-AVI already decodes for real via [[Avi]]). */
    def sampleFrames(bytes: Array[Byte], n: Int, width: Int): Seq[Array[Byte]] =
      if (bytes.isEmpty) Seq.empty
      else (0 until n).map { i =>
        val start = (bytes.length.toLong * i / n).toInt
        bytes.slice(start, math.min(start + width, bytes.length))
      }
  }

  /** Frame sampling kernel: REAL for animated GIF ([[Gif.decode]] —
    * full LZW), MJPEG-AVI container video ([[Avi.decode]] — RIFF walk
    * + per-frame baseline-JPEG decode) AND MJPEG-MP4 ([[Mp4.decode]]
    * — ISO-BMFF box walk + sample-table resolution); frames are
    * decoded luminance rasters, n evenly spaced across the animation,
    * all frames when n ≥ frame count. The [[FakeCodec]] byte-window
    * fallback remains only for inter-frame-CODED tracks (h264/vp9 —
    * no codec library ships in this container; an mp4 whose track is
    * avc1 falls back here even though its container metadata parses
    * fully via [[Mp4.meta]]). Undecodable bytes fall back rather than
    * null: a sampler's contract is "give me n byte windows". */
  def sampleFramesKernel(
      bytes: Array[Byte], n: Int, width: Int): Seq[Array[Byte]] =
    if (Gif.isGif(bytes)) {
      Gif.decode(bytes) match {
        case Some(d) =>
          val total = d.frames.length
          if (total <= n) d.frames.map(_.luma)
          else (0 until n).map(i => d.frames(total * i / n).luma)
        case None => FakeCodec.sampleFrames(bytes, n, width)
      }
    } else if (Avi.isAvi(bytes)) {
      Avi.decode(bytes) match {
        case Some(d) =>
          val total = d.frames.length
          if (total <= n) d.frames.map(Avi.luma)
          else (0 until n).map(i => Avi.luma(d.frames(total * i / n)))
        case None => FakeCodec.sampleFrames(bytes, n, width)
      }
    } else if (Mp4.isMp4(bytes)) {
      Mp4.decode(bytes) match {
        case Some(d) =>
          val total = d.frames.length
          if (total <= n) d.frames.map(Avi.luma)
          else (0 until n).map(i => Avi.luma(d.frames(total * i / n)))
        case None => FakeCodec.sampleFrames(bytes, n, width)
      }
    } else FakeCodec.sampleFrames(bytes, n, width)

  /** Decode metadata for every blob — REAL header parse
    * ([[MediaCodec]]: PNG IHDR / JPEG SOFn) as a codegen'd Catalyst
    * expression ([[graft.functions.ParseMedia]]): no shuffle, no
    * RowEncoder round-trip, no optimizer barrier — filters and pruning
    * push THROUGH the decode to the scan. Output = input columns +
    * `meta` struct (null for null/unparseable bytes). */
  def decodeMeta(df: DataFrame, binCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    df.withColumn("meta",
      Shim.column(graft.functions.ParseMedia(Shim.expression(col(binCol)))))
  }

  /** REAL pixel-level decode reduced to exact integer statistics —
    * same codegen'd-expression shape as [[decodeMeta]], FORMAT-
    * DISPATCHING on the magic bytes ([[graft.functions.PixelStats]]):
    * PNG blobs run [[PngPixels]] (zlib inflate + spec unfiltering, the
    * full 8-bit gray/truecolor subset), JPEG blobs run [[JpegDc]]
    * (real baseline entropy decode), so a mixed-format media table
    * gets stats for every decodable row. Output = input columns +
    * `pixstats` struct(width, height, channels, pix_sum, pix_count);
    * null for unknown-format, corrupt, or out-of-subset bytes. */
  def decodePixelStats(df: DataFrame, binCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    df.withColumn("pixstats",
      Shim.column(graft.functions.PixelStats(Shim.expression(col(binCol)))))
  }

  /** Feature-extract every blob into `features array<float>` (dim):
    * REAL content features for every format with an in-repo decoder —
    * luminance histograms for PNG ([[PngPixels]]) and baseline JPEG
    * ([[JpegDc]]), an all-frames histogram for animated GIF ([[Gif]])
    * and MJPEG-AVI container video ([[Avi]]), a temporal |amplitude|
    * profile for WAV ([[WavPcm]]); the [[FakeCodec]] byte-sum head
    * only for formats with no decoder (the external-codec seam). A codegen'd expression
    * ([[graft.functions.MediaFeatures]]) — the old mapPartitions
    * formulation was an optimizer barrier blocking pushdown through
    * the feature stage. */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    df.withColumn("features", Shim.column(
      graft.functions.MediaFeatures(Shim.expression(col(binCol)), dim)))
  }

  /** Sample `n` frames per blob into `frames array<binary>` —
    * REAL decoded frames for animated GIF and MJPEG-AVI container
    * video, the byte-window seam only for inter-frame codecs
    * ([[sampleFramesKernel]]). */
  def sampleFrames(df: DataFrame, binCol: String, n: Int,
      frameWidth: Int = 64): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("frames",
      ArrayType(BinaryType, containsNull = false), nullable = true)
    val binIdx = inSchema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val frames = if (bytes == null) null
          else sampleFramesKernel(bytes, n, frameWidth)
        Row.fromSeq(row.toSeq :+ frames)
      }
    }(enc)
  }
}
