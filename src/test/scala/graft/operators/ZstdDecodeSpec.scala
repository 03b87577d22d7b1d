package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** RFC 8878 decompression: EXTERNAL conformance against the reference
  * `zstd` binary across compression levels and payload shapes (the
  * levels force different coding paths: RLE, Huffman 1/4-stream
  * literals, FSE-described tables, repeat modes, long matches),
  * engine-written frame fixtures, and the validator stance. */
class ZstdDecodeSpec extends AnyFunSuite {

  private val zstdBin = new java.io.File("/root/miniconda/bin/zstd")
  private def haveZstd = zstdBin.canExecute

  /** Compress via the reference implementation. */
  private def refCompress(data: Array[Byte], args: Seq[String])
      : Array[Byte] = {
    val in = java.io.File.createTempFile("zstdspec", ".bin")
    val outF = new java.io.File(in.getPath + ".zst")
    try {
      java.nio.file.Files.write(in.toPath, data)
      val cmd = Seq(zstdBin.getPath, "-q", "-f") ++ args ++
        Seq(in.getPath, "-o", outF.getPath)
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val rc = p.waitFor()
      assert(rc == 0, s"zstd failed rc=$rc for args $args")
      java.nio.file.Files.readAllBytes(outF.toPath)
    } finally { in.delete(); outF.delete() }
  }

  private def payloads: Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(42)
    Seq(
      "empty" -> Array.emptyByteArray,
      "one byte" -> Array[Byte](65),
      "tiny text" -> "hello zstd world".getBytes("UTF-8"),
      "repetitive text" ->
        ("the quick brown fox jumps over the lazy dog. " * 500)
          .getBytes("UTF-8"),
      "html-ish crawl text" ->
        ((0 until 400).map(i =>
          s"<p>paragraph $i with some shared vocabulary tokens " +
            s"and a number ${i * 37}</p>").mkString("\n")).getBytes("UTF-8"),
      "all zeros" -> new Array[Byte](10000),
      "random bytes (incompressible)" ->
        Array.fill[Byte](8192)(rnd.nextInt(256).toByte),
      "skewed bytes" ->
        Array.fill[Byte](20000)((rnd.nextInt(4) * rnd.nextInt(4)).toByte),
      "long match far back" -> {
        val head = Array.fill[Byte](5000)(rnd.nextInt(256).toByte)
        head ++ new Array[Byte](70000) ++ head
      },
      "multi-block (>128k)" -> {
        val block = ("lorem ipsum dolor sit amet " * 40).getBytes("UTF-8")
        Array.fill(600)(block).flatten
      }
    )
  }

  test("external conformance: reference-compressed files decode " +
    "byte-identically at every level/flag combination") {
    assume(haveZstd, "no zstd binary on this box")
    val variants = Seq(
      Seq("-1"), Seq("-3"), Seq("-9"), Seq("-19"),
      Seq("-3", "--no-check"), Seq("-5", "--single-thread"))
    for ((name, data) <- payloads; args <- variants) {
      val compressed = refCompress(data, args)
      val got = ZstdDecode.decompress(compressed)
      assert(got.isDefined, s"$name $args: decode returned None")
      assert(java.util.Arrays.equals(got.get, data),
        s"$name $args: content mismatch " +
          s"(${got.get.length} vs ${data.length} bytes)")
    }
  }

  test("concatenated frames and leading skippable frames decode " +
    "to the concatenated content") {
    assume(haveZstd)
    val a = "first frame content ".getBytes("UTF-8")
    val bb = "second frame content".getBytes("UTF-8")
    val fa = refCompress(a, Seq("-3"))
    val fb = refCompress(bb, Seq("-3"))
    val skippable = {
      val o = new java.io.ByteArrayOutputStream()
      def w32(v: Long): Unit = {
        o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
        o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
      }
      w32(0x184D2A53L); w32(4); w32(0xDEADBEEFL)
      o.toByteArray
    }
    val got = ZstdDecode.decompress(skippable ++ fa ++ fb)
    assert(got.isDefined)
    assert(java.util.Arrays.equals(got.get, a ++ bb))
  }

  test("checksum verification: a corrupted payload with --check set " +
    "is rejected, not silently wrong") {
    assume(haveZstd)
    val data = ("checksummed content " * 200).getBytes("UTF-8")
    val compressed = refCompress(data, Seq("-3")) // checksum on by default
    assert(ZstdDecode.decompress(compressed).isDefined)
    // flip one bit somewhere in the middle of the payload
    val mut = compressed.clone()
    mut(mut.length / 2) = (mut(mut.length / 2) ^ 0x01).toByte
    // either the structure breaks (None via parse error) or the
    // checksum catches it — silent wrong output is the only failure
    ZstdDecode.decompress(mut).foreach { out =>
      fail(s"corrupted stream decoded to ${out.length} bytes")
    }
  }

  test("validator stance: corruption sweep never throws or hangs") {
    assume(haveZstd)
    val data = ("sweep me " * 100).getBytes("UTF-8")
    val good = refCompress(data, Seq("-3"))
    var pos = 0
    while (pos < good.length) {
      val mut = good.clone()
      mut(pos) = (mut(pos) ^ 0x55).toByte
      ZstdDecode.decompress(mut) // must not throw
      pos += 1
    }
    assert(ZstdDecode.decompress(null).isEmpty)
    assert(ZstdDecode.decompress(Array[Byte](1, 2, 3)).isEmpty)
    assert(ZstdDecode.decompress(good.take(10)).isEmpty)
  }

  test("reference-compressed .warc.zst end-to-end: a real zstd-binary-" +
    "compressed WARC decodes and parses to the same records as the " +
    "plain form — the CommonCrawl dump path with production frames") {
    assume(haveZstd, "no zstd binary on this box")
    for (id <- 0L until 6L; level <- Seq("-3", "-19", "--long=27")) {
      val toks = (0 until 12).map(j => "w" + ((id * 7 + j) % 50))
        .mkString(" ")
      val html =
        s"<html><body><h1>Page $id</h1><p>$toks</p></body></html>"
      val plain = Warc.warcPlain(s"http://site$id.example.com/p/$id",
        html, s"software: graft-fixture $id")
      val zst = refCompress(plain, Seq(level, "--check"))
      val dec = ZstdDecode.decompress(zst)
        .getOrElse(fail(s"id=$id level=$level"))
      assert(java.util.Arrays.equals(dec, plain))
      val recs = Warc.parse(dec).getOrElse(fail("warc parse"))
      assert(recs.length == 2)
      assert(recs(1).recType == "response")
    }
  }

  test("engine-written Huffman-literals frames (variant 5): the " +
    "4-stream compressed-literals path round-trips and every " +
    "single-byte corruption is caught or decodes to a size-consistent " +
    "result") {
    for (n <- Seq(7, 100, 421, 1469, 4001)) {
      val content = Array.tabulate[Byte](n)(i => (32 + (i * 7) % 90).toByte)
      val frame = Zstd.zstEncode(content, 5)
      val dec = ZstdDecode.decompress(frame)
        .getOrElse(fail(s"n=$n did not decode"))
      assert(java.util.Arrays.equals(dec, content), s"n=$n")
      assert(frame.length < n + 100, s"n=$n should compress 7/8")
    }
    val good = Zstd.zstEncode(
      Array.tabulate[Byte](421)(i => (32 + (i * 7) % 90).toByte), 5)
    for (i <- good.indices) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      ZstdDecode.decompress(bad) // must not throw or hang
    }
  }

  test("zstd-framed WARC fixtures decode to byte-identical records " +
    "as the gzip form — the .warc.zst ingestion composition") {
    for (id <- 0L until 30L) {
      val viaGz = Warc.gunzip(MediaFixtures.warcMediaFor(id))
        .getOrElse(fail(s"gzip WARC $id failed"))
      val viaZst = ZstdDecode.decompress(MediaFixtures.warcZstMediaFor(id))
        .getOrElse(fail(s"zstd WARC $id failed"))
      assert(java.util.Arrays.equals(viaGz, viaZst), s"id=$id")
    }
  }

  test("dictionary frames are out of subset and fail loudly") {
    assume(haveZstd)
    // train a tiny dictionary and compress with it
    val dir = java.nio.file.Files.createTempDirectory("zdict").toFile
    try {
      val samples = (0 until 20).map { i =>
        val f = new java.io.File(dir, s"s$i.txt")
        java.nio.file.Files.write(f.toPath,
          s"sample document number $i with shared structure".getBytes)
        f
      }
      val dict = new java.io.File(dir, "dict.bin")
      val rcT = new ProcessBuilder((Seq(zstdBin.getPath, "--train") ++
        samples.map(_.getPath) ++ Seq("-o", dict.getPath)): _*)
        .redirectErrorStream(true).start().waitFor()
      assume(rcT == 0, "dictionary training unavailable")
      val in = new java.io.File(dir, "in.txt")
      java.nio.file.Files.write(in.toPath,
        "sample document number 99 with shared structure".getBytes)
      val out = new java.io.File(dir, "in.txt.zst")
      val rc = new ProcessBuilder(zstdBin.getPath, "-q", "-f", "-D",
        dict.getPath, in.getPath, "-o", out.getPath)
        .redirectErrorStream(true).start().waitFor()
      assert(rc == 0)
      val bytes = java.nio.file.Files.readAllBytes(out.toPath)
      assert(ZstdDecode.decompress(bytes).isEmpty,
        "dictionary frame must not decode")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
