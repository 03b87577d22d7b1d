package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** dHash + pigeonhole Hamming search: the hash must be invariant to
  * global luminance shifts (the perceptual property), the blocked
  * search must equal brute force, and small/dirty media must drop. */
class ImageDedupSpec extends SparkTestBase {

  import spark.implicits._

  private def dhashOf(bytes: Array[Byte]): Option[(Long, Long)] =
    Option(graft.functions.ImageDhash.compute(bytes))
      .map(r => (r.getLong(0), r.getLong(1)))

  test("a global +5 luminance shift leaves the hash unchanged; a " +
    "structural edit flips bits") {
    // gray PNG from a raw raster: base, +5 shifted, one band inverted
    def gray(f: (Int, Int) => Int): Array[Byte] = {
      val w = 32; val h = 24
      // reuse the real writer machinery by building a custom image via
      // deflate of raw scanlines (filter 0 rows)
      val raw = new java.io.ByteArrayOutputStream()
      (0 until h).foreach { y =>
        raw.write(0)
        (0 until w).foreach(x => raw.write(f(x, y) & 0xff))
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw.toByteArray); deflater.finish()
      val z = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      def chunk(tag: String, body: Array[Byte]): Unit = {
        out.writeInt(body.length)
        val tagged = tag.getBytes("US-ASCII") ++ body
        out.write(tagged)
        val crc = new java.util.zip.CRC32(); crc.update(tagged)
        out.writeInt(crc.getValue.toInt)
      }
      val ihdr = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(ihdr)
      d.writeInt(w); d.writeInt(h); d.write(8); d.write(0)
      d.write(0); d.write(0); d.write(0)
      chunk("IHDR", ihdr.toByteArray)
      chunk("IDAT", z.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      bos.toByteArray
    }
    def base(x: Int, y: Int): Int = (x * 7 + y * 3) % 200
    val h0 = dhashOf(gray(base)).get
    val shifted = dhashOf(gray((x, y) => base(x, y) + 5)).get
    assert(h0 == shifted, "constant luminance shift must not move dHash")
    val edited = dhashOf(gray((x, y) =>
      if (y < 12) 255 - base(x, y) else base(x, y))).get
    assert(h0 != edited, "a structural edit must flip bits")
  }

  test("blocked pigeonhole pairs equal brute force on real fixtures") {
    val docs = (1L to 59L).toDF("doc_id")
    val media = MediaFixtures.withPixelMedia(docs, "doc_id", "media")
    val got = ImageDedup.nearDupPairs(media, "media", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = ImageDedup.dhashes(media, "media", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val want = (for {
      (a, (ha, la)) <- hashes; (b, (hb, lb)) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixtures should contain near-dup hashes")
  }

  test("images smaller than the grid and dirty bytes hash to null " +
    "and drop from the search") {
    // id 40 -> w = 8 < 9
    assert(dhashOf(MediaFixtures.pixelMediaFor(40L)).isEmpty)
    assert(dhashOf("not an image".getBytes("UTF-8")).isEmpty)
    val docs = Seq(40L).toDF("doc_id")
    val media = MediaFixtures.withPixelMedia(docs, "doc_id", "media")
    assert(ImageDedup.dhashes(media, "media", "doc_id").count() == 0L)
  }

  test("plan shape: no cartesian or nested-loop join in the search") {
    val docs = (1L to 20L).toDF("doc_id")
    val media = MediaFixtures.withPixelMedia(docs, "doc_id", "media")
    val p = ImageDedup.nearDupPairs(media, "media", "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }

  test("image_resize: identity preserves pixels, downscale matches " +
    "direct box math, output re-decodes through every kernel, JPEG " +
    "inputs dispatch") {
    val src = MediaFixtures.pixelMediaFor(6L) // 14x14 truecolor
    val d0 = PngPixels.decode(src).get
    // identity resize: every box is exactly one pixel
    val same = PngPixels.decode(
      graft.functions.ImageResize.compute(src, d0.width, d0.height)).get
    assert(same.channels == d0.channels)
    assert(java.util.Arrays.equals(same.pixels, d0.pixels))
    // downscale to 5x4: direct box-average check
    val down = PngPixels.decode(
      graft.functions.ImageResize.compute(src, 5, 4)).get
    assert(down.width == 5 && down.height == 4 &&
      down.channels == d0.channels)
    (0 until 4).foreach { j =>
      (0 until 5).foreach { i =>
        val x0 = i * d0.width / 5; val x1 = (i + 1) * d0.width / 5
        val y0 = j * d0.height / 4; val y1 = (j + 1) * d0.height / 4
        (0 until d0.channels).foreach { c =>
          var sum = 0L
          (y0 until y1).foreach { y => (x0 until x1).foreach { x =>
            sum += d0.pixels((y * d0.width + x) * d0.channels + c) & 0xff
          }}
          val want = sum / ((x1 - x0).toLong * (y1 - y0))
          val got = down.pixels((j * 5 + i) * d0.channels + c) & 0xff
          assert(got == want, s"cell ($i,$j,$c)")
        }
      }
    }
    // the resized PNG feeds the other kernels (bridge property)
    val resized = graft.functions.ImageResize.compute(src, 16, 12)
    assert(graft.functions.PngStats.statsToRow(resized) != null)
    assert(graft.functions.ImageDhash.compute(resized) != null)
    // JPEG input dispatches through the same kernel
    val jpg = MediaFixtures.jpegPixelMediaFor(4L)
    val rj = PngPixels.decode(
      graft.functions.ImageResize.compute(jpg, 10, 8))
    assert(rj.isDefined && rj.get.width == 10 && rj.get.height == 8)
    // upscale: nearest-neighbor (empty boxes sample their boundary)
    val up = PngPixels.decode(
      graft.functions.ImageResize.compute(src, d0.width * 2, d0.height)).get
    (0 until d0.width * 2).foreach { i =>
      val srcX = i * d0.width / (d0.width * 2)
      (0 until d0.channels).foreach { c =>
        assert((up.pixels(i * d0.channels + c) & 0xff) ==
          (d0.pixels(srcX * d0.channels + c) & 0xff), s"up i=$i c=$c")
      }
    }
    // dirty bytes -> null
    assert(graft.functions.ImageResize.compute("junk".getBytes, 4, 4) == null)
  }
}
