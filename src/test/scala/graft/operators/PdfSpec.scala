package graft.operators

import graft.SparkTestBase

/** PDF text extraction: round trips through the real xref/object/
  * content-stream grammar, both filter paths, the string escape
  * grammar, multi-page trees, and dirty-byte rejection. */
class PdfSpec extends SparkTestBase {

  test("text round-trips the writer — raw and FlateDecode streams, " +
    "Tj and TJ forms, multi-page") {
    for (deflate <- Seq(false, true)) {
      val pages = Seq(
        Seq("first line", "second line spans a TJ"),
        Seq("page two a", "page two b", "page two c"))
      val b = Pdf.pdf(pages, deflate)
      assert(Pdf.pageCount(b).contains(2))
      val expected = pages.flatten.mkString("\n")
      assert(Pdf.text(b).contains(expected), s"deflate=$deflate")
      val (n, t) = Pdf.extract(b).get
      assert(n == 2 && t == expected)
    }
  }

  test("the PDF string escape grammar survives: parens, backslashes, " +
    "octal escapes, hex strings") {
    // writer escapes specials; reader must undo them exactly
    val tricky = Seq(Seq("parens (nested) and \\backslash", "plain"))
    val b = Pdf.pdf(tricky, deflate = false)
    assert(Pdf.text(b).contains(tricky.flatten.mkString("\n")))
    // hand-built content exercising octal + hex + continuation forms
    val content = "BT (A\\102C) Tj (D\\\n" + // octal 102='B'; continuation
      "E) Tj <4648> Tj ET" // hex FH
    val handPdf = handBuilt(content)
    assert(Pdf.text(handPdf).contains("ABCDEFH"))
  }

  test("the ' and \" show operators emit line breaks; T* moves lines") {
    val content = "BT (one) Tj T* (two) Tj (three) ' ET"
    assert(Pdf.text(handBuilt(content)).contains("one\ntwo\nthree"))
  }

  test("dirty bytes reject: no header, truncation, bad xref offsets, " +
    "lying object headers, encryption flag") {
    val good = Pdf.pdf(Seq(Seq("x")), deflate = false)
    assert(Pdf.text(good).isDefined)
    assert(Pdf.text(null).isEmpty)
    assert(Pdf.text("not a pdf at all, not even close".getBytes).isEmpty)
    assert(Pdf.text(good.take(good.length / 2)).isEmpty) // no startxref
    // corrupt the startxref offset digits
    val s = new String(good, "ISO-8859-1")
    val sx = s.lastIndexOf("startxref")
    val bad = good.clone()
    bad(sx + 10) = '9'; bad(sx + 11) = '9'
    assert(Pdf.text(bad).isEmpty)
    // an /Encrypt key in the trailer rejects
    val enc = new String(good, "ISO-8859-1")
      .replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 9 0 R")
    // trailer grew: offsets before it are unchanged, so parse reaches
    // the trailer and must stop on the flag
    assert(Pdf.text(enc.getBytes("ISO-8859-1")).isEmpty)
  }

  test("the PDF 1.5 container (xref stream + ObjStm + PNG Up " +
    "predictor) decodes to the same text as the classic form") {
    for (deflate <- Seq(false, true)) {
      val pages = Seq(
        Seq("modern container a", "modern container b"),
        Seq("page two"), Seq("page three x", "y", "z"))
      val classic = Pdf.pdf(pages, deflate)
      val modern = Pdf.pdf(pages, deflate, xrefStream = true)
      assert(new String(modern, 0, 8, "ISO-8859-1") == "%PDF-1.5")
      assert(Pdf.extract(modern) == Pdf.extract(classic),
        s"deflate=$deflate")
      assert(Pdf.pageCount(modern).contains(3))
    }
  }

  test("PDF 1.5 dirty bytes reject: corrupt xref-stream data, ObjStm " +
    "header/index lies, truncation") {
    val b = Pdf.pdf(Seq(Seq("line a", "line b")), deflate = true,
      xrefStream = true)
    assert(Pdf.text(b).isDefined)
    assert(Pdf.text(b.take(b.length * 2 / 3)).isEmpty)
    // flip bytes inside the (flate-compressed) xref stream payload
    val s = new String(b, "ISO-8859-1")
    val xs = s.indexOf("stream\n", s.indexOf("/Type /XRef")) + 7
    val bad = b.clone()
    bad(xs + 3) = (bad(xs + 3) ^ 0x7f).toByte
    assert(Pdf.text(bad).isEmpty)
    // an ObjStm whose header names the wrong object must reject: the
    // header pairs live in the ObjStm payload — find and corrupt the
    // first object number digit ('1 0 2 ...' -> '9 0 2 ...') in the
    // UNCOMPRESSED variant
    val raw = Pdf.pdf(Seq(Seq("x")), deflate = false, xrefStream = true)
    val rs = new String(raw, "ISO-8859-1")
    val stmAt = rs.indexOf("/Type /ObjStm")
    val dataAt = rs.indexOf("stream\n", stmAt) + 7
    val lied = raw.clone()
    lied(dataAt) = '9'
    assert(Pdf.text(lied).isEmpty)
  }

  test("fixtures follow the closed forms the oracle re-derives") {
    for (id <- 0L to 8L) {
      val (n, t) = Pdf.extract(MediaFixtures.pdfMediaFor(id)).get
      assert(n == 1 + id % 3)
      val expected = (0 until (1 + id % 3).toInt).flatMap { p =>
        (0 until (2 + (id + p) % 3).toInt).map(k => s"pdf $id p$p l$k")
      }.mkString("\n")
      assert(t == expected, s"id=$id")
    }
  }

  test("embedded images round-trip the writer: geometry and filters " +
    "survive, the DCTDecode payload is the JPEG byte-for-byte, Flate " +
    "samples inflate back, and page text is untouched") {
    for (deflate <- Seq(false, true)) {
      val jpeg = JpegDc.jpegWithPixels(7L, 16, 8, 3)
      val gray = Array.tabulate[Byte](5 * 4)(i => (i * 11 % 256).toByte)
      val pages = Seq(Seq("with an image"), Seq("gray page"))
      val b = Pdf.pdfWithImages(pages,
        Seq(Pdf.ImageSpec(0, 16, 8, jpeg = true, jpeg),
          Pdf.ImageSpec(1, 5, 4, jpeg = false, gray)), deflate)
      val ims = Pdf.images(b).get
      assert(ims.length == 2, s"deflate=$deflate")
      assert(ims(0).page == 0 && ims(0).name == "Im0" &&
        ims(0).width == 16 && ims(0).height == 8 &&
        ims(0).filter == "DCTDecode" &&
        java.util.Arrays.equals(ims(0).data, jpeg))
      assert(ims(1).page == 1 && ims(1).name == "Im1" &&
        ims(1).width == 5 && ims(1).height == 4 &&
        ims(1).filter == "FlateDecode" &&
        java.util.Arrays.equals(ims(1).data, gray))
      // the JPEG payload decodes through the real entropy decoder
      val d = JpegDc.decode(ims(0).data).get
      assert(d.width == 16 && d.height == 8 && d.channels == 3)
      // text extraction is undisturbed by the Do/cm operators
      assert(Pdf.text(b).contains("with an image\ngray page"))
      // an image-free writer output has an empty inventory
      assert(Pdf.images(Pdf.pdf(pages, deflate)).get.isEmpty)
    }
  }

  test("image fixtures follow the closed pixel contracts the oracle " +
    "re-derives, and corruption never throws") {
    for (id <- 0L to 6L) {
      val ims = Pdf.images(MediaFixtures.pdfImgMediaFor(id)).get
      assert(ims.length == 1 + id % 2, s"id=$id")
      ims.zipWithIndex.foreach { case (im, p) =>
        val jid = 2 * id + p
        assert(im.page == p && im.name == s"Im$p")
        if (jid % 2 == 0) {
          assert(im.filter == "DCTDecode")
          assert(im.width == 8 * (1 + jid % 6).toInt &&
            im.height == 8 * (1 + jid % 5).toInt)
          val d = JpegDc.decode(im.data).get
          var expected = 0L
          for (by <- 0 until im.height / 8; bx <- 0 until im.width / 8;
               c <- 0 until 3)
            expected += 64L * JpegDc.blockVal(jid, bx, by, c)
          var got = 0L
          d.pixels.foreach(px => got += px & 0xff)
          assert(got == expected, s"id=$id jid=$jid")
        } else {
          assert(im.filter == "FlateDecode")
          assert(im.width == (4 + jid % 13).toInt &&
            im.height == (3 + jid % 11).toInt)
          assert(im.data.length == im.width * im.height)
          for (y <- 0 until im.height; x <- 0 until im.width)
            assert((im.data(y * im.width + x) & 0xff) ==
              (3 * x + 5 * y + 7 * jid) % 256, s"id=$id ($x,$y)")
        }
      }
    }
    val good = MediaFixtures.pdfImgMediaFor(3L)
    var stride = 0
    while (stride < good.length) {
      val bad = good.clone(); bad(stride) = (bad(stride) ^ 0x41).toByte
      Pdf.images(bad) // Option out, never a throw
      stride += 7
    }
    assert(Pdf.images(Array[Byte](1, 2, 3)).isEmpty)
  }

  /** Minimal complete one-page PDF around a given content stream. */
  private def handBuilt(content: String): Array[Byte] = {
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R >>"),
      4 -> s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    val out = new StringBuilder
    out.append("%PDF-1.4\n")
    val offsets = objs.map { case (n, body) =>
      val off = out.length
      out.append(s"$n 0 obj\n").append(body).append("\nendobj\n")
      n -> off
    }.toMap
    val xrefAt = out.length
    out.append("xref\n0 5\n0000000000 65535 f \n")
    (1 to 4).foreach(n => out.append(f"${offsets(n)}%010d 00000 n \n"))
    out.append("trailer\n<< /Size 5 /Root 1 0 R >>\n")
    out.append(s"startxref\n$xrefAt\n%%EOF\n")
    out.toString.getBytes("ISO-8859-1")
  }
}
