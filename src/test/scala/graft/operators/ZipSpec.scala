package graft.operators

import graft.SparkTestBase

/** ZIP central-directory reader + writer: round trips through both
  * methods, cross-conformance against the JDK's zip implementation in
  * BOTH directions, CRC/length verification, dirty-byte rejection. */
class ZipSpec extends SparkTestBase {

  private def files(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map(j => (s"f$j.txt",
      (s"payload $j " + "ab" * (j * 7 % 23)).getBytes("UTF-8")))

  test("entries+extract round-trip the writer — stored and deflated") {
    for (deflate <- Seq(false, true)) {
      val fs = files(5)
      val z = Zip.zip(fs, deflate)
      val es = Zip.entries(z).getOrElse(fail(s"deflate=$deflate no parse"))
      assert(es.map(_.name) == fs.map(_._1))
      es.zip(fs).foreach { case (e, (_, data)) =>
        assert(e.method == (if (deflate) 8 else 0))
        assert(e.size == data.length)
        if (!deflate) assert(e.compSize == e.size)
        val got = Zip.extractEntry(z, e)
          .getOrElse(fail(s"${e.name} did not extract"))
        assert(java.util.Arrays.equals(got, data))
      }
      assert(Zip.extract(z, "f3.txt").isDefined)
      assert(Zip.extract(z, "missing.txt").isEmpty)
    }
  }

  test("the JDK's ZipInputStream reads our writer's output byte-exactly " +
    "(external-reader conformance)") {
    for (deflate <- Seq(false, true)) {
      val fs = files(4)
      val in = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(Zip.zip(fs, deflate)))
      val got = Iterator.continually(in.getNextEntry).takeWhile(_ != null)
        .map { e =>
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          (e.getName, bos.toByteArray)
        }.toVector
      assert(got.map(_._1) == fs.map(_._1))
      got.zip(fs).foreach { case ((_, g), (_, d)) =>
        assert(java.util.Arrays.equals(g, d))
      }
    }
  }

  test("our reader consumes a JDK-written archive (external-writer " +
    "conformance, incl. the data-descriptor-free stream shape)") {
    val fs = files(3)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.ZipOutputStream(bos)
    fs.foreach { case (name, data) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(data); out.closeEntry()
    }
    out.close()
    val z = bos.toByteArray
    val es = Zip.entries(z).getOrElse(fail("JDK zip did not parse"))
    assert(es.map(_.name) == fs.map(_._1))
    es.zip(fs).foreach { case (e, (_, data)) =>
      val got = Zip.extractEntry(z, e)
        .getOrElse(fail(s"${e.name} did not extract"))
      assert(java.util.Arrays.equals(got, data))
    }
  }

  test("dirty bytes reject: truncation, corrupt payloads (CRC), bogus " +
    "EOCD signatures in data, encrypted flags, foreign methods") {
    val z = Zip.zip(files(3), deflate = true)
    assert(Zip.entries(z).isDefined)
    assert(Zip.entries(null).isEmpty)
    assert(Zip.entries(z.take(10)).isEmpty)          // no EOCD
    assert(Zip.entries(z.dropRight(3)).isEmpty)      // truncated EOCD
    // corrupt one payload byte (first entry's data starts after the
    // 30-byte local header + "f0.txt"): listing still works,
    // extraction fails inflate-or-CRC
    val bad = z.clone(); bad(40) = (bad(40) ^ 0x5a).toByte
    val es = Zip.entries(bad).get
    assert(Zip.extractEntry(bad, es.head).isEmpty)
    // an embedded PK\5\6 inside entry DATA must not shadow the real EOCD
    val trap = Zip.zip(
      Seq(("t.bin", Array[Byte]('P', 'K', 5, 6) ++ new Array[Byte](18))),
      deflate = false)
    val tes = Zip.entries(trap).getOrElse(fail("trap zip did not parse"))
    assert(tes.head.size == 22)
    // encrypted flag rejects
    val enc = z.clone()
    var cd = -1
    var i = 0
    while (cd < 0 && i + 3 < enc.length) {
      if (enc(i) == 'P' && enc(i + 1) == 'K' && enc(i + 2) == 1 &&
        enc(i + 3) == 2) cd = i
      else i += 1
    }
    enc(cd + 8) = 1
    assert(Zip.entries(enc).isEmpty)
    // unknown method: listable, not extractable
    val m9 = z.clone(); m9(cd + 10) = 9
    val m9es = Zip.entries(m9).get
    assert(Zip.extractEntry(m9, m9es.head).isEmpty)
  }

  test("fixtures follow the closed forms the oracle re-derives") {
    for (id <- 0L to 8L) {
      val z = MediaFixtures.zipMediaFor(id)
      val es = Zip.entries(z).get
      assert(es.length == 1 + id % 3)
      es.zipWithIndex.foreach { case (e, j) =>
        assert(e.name == s"doc_${id}_$j.txt")
        assert(e.method == (if (id % 2 == 1) 8 else 0))
        val text = new String(Zip.extractEntry(z, e).get, "UTF-8")
        assert(text == s"file $j of archive $id " + "x" * ((id + j) % 9).toInt)
      }
    }
  }
}
