package graft.operators

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

/** ustar walk + writer: round trips, GNU tar cross-conformance in
  * both directions, checksum verification, dirty-byte rejection, and
  * the gunzip∘tar composition the tar.gz query rides. */
class TarSpec extends SparkTestBase {

  private def files(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map(j => (s"d$j.txt",
      (s"tar payload $j " + "z" * (j * 11 % 29)).getBytes("UTF-8")))

  private def gnuTar(args: String*): (Int, Array[Byte]) = {
    val pb = new ProcessBuilder(("tar" +: args): _*)
    pb.redirectErrorStream(false)
    val p = pb.start()
    val out = p.getInputStream.readAllBytes()
    (p.waitFor(), out)
  }

  private lazy val haveGnuTar =
    try { gnuTar("--version")._1 == 0 } catch { case _: Exception => false }

  test("entries+extract round-trip the writer, incl. block-boundary sizes") {
    // sizes 0, <512, exactly 512, >512 all cross the padding rule
    val fs = Seq(
      ("empty.txt", Array.empty[Byte]),
      ("small.txt", "abc".getBytes("UTF-8")),
      ("block.bin", Array.fill[Byte](512)(7)),
      ("big.bin", Array.tabulate[Byte](1300)(i => (i % 251).toByte)))
    val t = Tar.tar(fs)
    val es = Tar.entries(t).getOrElse(fail("no parse"))
    assert(es.map(_.name) == fs.map(_._1))
    assert(es.map(_.size) == fs.map(_._2.length.toLong))
    fs.foreach { case (name, data) =>
      assert(java.util.Arrays.equals(Tar.extract(t, name).get, data))
    }
    assert(Tar.extract(t, "missing").isEmpty)
  }

  test("GNU tar lists and extracts our writer's output (external-reader " +
    "conformance)") {
    assume(haveGnuTar)
    val fs = files(3)
    val tmp = Files.createTempFile("graft-tar", ".tar")
    try {
      Files.write(tmp, Tar.tar(fs))
      val (rc, listing) = gnuTar("-tf", tmp.toString)
      assert(rc == 0)
      assert(new String(listing, "UTF-8").linesIterator.toVector ==
        fs.map(_._1))
      fs.foreach { case (name, data) =>
        val (xc, got) = gnuTar("-xOf", tmp.toString, name)
        assert(xc == 0 && java.util.Arrays.equals(got, data), name)
      }
    } finally Files.deleteIfExists(tmp)
  }

  test("our reader consumes a GNU-tar-written archive (external-writer " +
    "conformance)") {
    assume(haveGnuTar)
    val dir = Files.createTempDirectory("graft-tar-src")
    val out = Files.createTempFile("graft-gnu", ".tar")
    try {
      val fs = files(3)
      fs.foreach { case (name, data) =>
        Files.write(dir.resolve(name), data)
      }
      val (rc, _) = gnuTar(("-cf" +: out.toString +: "-C" +: dir.toString +:
        fs.map(_._1)): _*)
      assert(rc == 0)
      val b = Files.readAllBytes(out)
      val es = Tar.entries(b).getOrElse(fail("GNU tar output did not parse"))
      val byName = es.map(e => e.name -> e).toMap
      fs.foreach { case (name, data) =>
        assert(byName.contains(name), name)
        assert(java.util.Arrays.equals(Tar.extract(b, name).get, data), name)
      }
    } finally {
      Files.list(dir).forEach(p => Files.deleteIfExists(p))
      Files.deleteIfExists(dir); Files.deleteIfExists(out)
    }
  }

  test("dirty bytes reject: checksum flip, truncation, bad magic, " +
    "missing end marker") {
    val t = Tar.tar(files(2))
    assert(Tar.entries(t).isDefined)
    assert(Tar.entries(null).isEmpty)
    assert(Tar.entries(t.take(600)).isEmpty)            // truncated data
    assert(Tar.entries(t.dropRight(512)).isEmpty)       // half an end marker
    val flip = t.clone(); flip(0) = (flip(0) ^ 1).toByte // name byte
    assert(Tar.entries(flip).isEmpty)                   // checksum catches it
    val magic = t.clone(); magic(257) = 'X'
    assert(Tar.entries(magic).isEmpty)
    val junkSize = t.clone(); junkSize(124) = '9'       // 9 is not octal
    assert(Tar.entries(junkSize).isEmpty)
    assert(Tar.entries(new Array[Byte](1024)).isEmpty)  // only end marker
  }

  test("fixtures follow the closed forms; tar.gz rides gunzip") {
    for (id <- 0L to 8L) {
      val gz = MediaFixtures.tarGzMediaFor(id)
      assert(Warc.isGzip(gz))
      val t = Warc.gunzip(gz).getOrElse(fail("gunzip failed"))
      val es = Tar.entries(t).get
      assert(es.length == 1 + id % 3)
      es.zipWithIndex.foreach { case (e, j) =>
        assert(e.name == s"f_${id}_$j.txt" && e.typeflag == '0')
        val text = new String(Tar.extract(t, e.name).get, "UTF-8")
        assert(text == s"tar file $j of $id " + "y" * ((id * 2 + j) % 7).toInt)
      }
    }
  }
}
