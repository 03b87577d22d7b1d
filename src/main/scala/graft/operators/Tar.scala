package graft.operators

/** TAR (POSIX ustar) archive walk — with [[Warc.gunzip]] in front it
  * covers `.tar.gz`, the shape most public text/code dataset dumps
  * actually ship in (source trees, scraped-document bundles).
  *
  * The grammar is 512-byte header blocks: NUL-terminated name (+ the
  * ustar `prefix` field for long paths), octal size/mtime, a header
  * checksum computed with the checksum field blanked to spaces, the
  * `ustar` magic, then `size` data bytes padded to the next block and
  * two zero blocks at the end. The checksum is verified per header —
  * a flipped byte fails the file rather than desynchronizing the walk
  * (every later offset derives from every earlier size, like WARC's
  * Content-Length accounting).
  *
  * Pure kernels; dirty bytes → None, never a throw. */
object Tar {

  final case class Entry(name: String, size: Long, typeflag: Char,
      dataOffset: Long)

  private val Block = 512
  private val MaxEntries = 4096

  /** Parse an octal field (NUL/space padded). None on junk. */
  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ')) i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) != 0 && b(i) != ' ') {
      val c = b(i)
      if (c < '0' || c > '7') return None
      v = v * 8 + (c - '0')
      if (v > (1L << 40)) return None
      any = true
      i += 1
    }
    if (any) Some(v) else None
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var n = 0
    while (n < len && b(off + n) != 0) n += 1
    new String(b, off, n, "UTF-8")
  }

  /** Walk the archive; regular files AND metadata entries (dirs,
    * links) are listed, each with its verified header. None on a
    * checksum/magic/grammar violation anywhere. */
  def entries(b: Array[Byte]): Option[Vector[Entry]] = {
    try entries0(b)
    catch { case _: Exception => None }
  }

  private def entries0(b: Array[Byte]): Option[Vector[Entry]] = {
    if (b == null || b.length < 2 * Block) return None
    val out = Vector.newBuilder[Entry]
    var pos = 0
    var count = 0
    var sawEnd = false
    while (!sawEnd && pos + Block <= b.length) {
      if (isZeroBlock(b, pos)) {
        // end marker: two zero blocks
        if (pos + 2 * Block > b.length || !isZeroBlock(b, pos + Block))
          return None
        sawEnd = true
      } else {
        // magic: "ustar\0" (POSIX) or "ustar " (old GNU)
        if (!(b(pos + 257) == 'u' && b(pos + 258) == 's' &&
          b(pos + 259) == 't' && b(pos + 260) == 'a' &&
          b(pos + 261) == 'r')) return None
        val stored = octal(b, pos + 148, 8).getOrElse(return None)
        var sum = 0L
        var i = 0
        while (i < Block) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else b(pos + i) & 0xff)
          i += 1
        }
        if (sum != stored) return None
        val size = octal(b, pos + 124, 12).getOrElse(
          if (b(pos + 124) == 0) 0L else return None)
        if (size > PngPixels.MaxDecodedBytes) return None
        val name0 = str(b, pos, 100)
        val prefix = str(b, pos + 345, 155)
        val name = if (prefix.isEmpty) name0 else prefix + "/" + name0
        if (name.isEmpty) return None
        val tf = b(pos + 156)
        val typeflag = if (tf == 0) '0' else tf.toChar
        val dataBlocks = ((size + Block - 1) / Block).toInt
        if (pos + Block + dataBlocks.toLong * Block > b.length) return None
        out += Entry(name, size, typeflag, pos + Block)
        pos += Block + dataBlocks * Block
        count += 1
        if (count > MaxEntries) return None
      }
    }
    if (!sawEnd) return None
    val v = out.result()
    if (v.isEmpty) None else Some(v)
  }

  private def isZeroBlock(b: Array[Byte], pos: Int): Boolean = {
    var i = 0
    while (i < Block) {
      if (b(pos + i) != 0) return false
      i += 1
    }
    true
  }

  /** One regular file's bytes by exact name. */
  def extract(b: Array[Byte], name: String): Option[Array[Byte]] =
    entries(b).flatMap(_.find(e => e.name == name && e.typeflag == '0'))
      .map(e => java.util.Arrays.copyOfRange(
        b, e.dataOffset.toInt, (e.dataOffset + e.size).toInt))

  // ---------------------------------------------------------------- writer

  /** A complete ustar archive of regular files. */
  def tar(files: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(files.length <= MaxEntries, s"${files.length} entries")
    val out = new java.io.ByteArrayOutputStream()
    files.foreach { case (name, data) =>
      val h = new Array[Byte](Block)
      val nameB = name.getBytes("UTF-8")
      require(nameB.length <= 100, s"name too long: $name")
      System.arraycopy(nameB, 0, h, 0, nameB.length)
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        val bs = padded.getBytes("US-ASCII")
        System.arraycopy(bs, 0, h, off, bs.length) // NUL already at end
      }
      oct(420 /* 0644 */, 100, 8)          // mode
      oct(0, 108, 8); oct(0, 116, 8)       // uid/gid
      oct(data.length.toLong, 124, 12)     // size
      oct(0, 136, 12)                      // mtime
      h(156) = '0'                         // regular file
      val magic = Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0') // POSIX magic+version
      System.arraycopy(magic, 0, h, 257, magic.length)
      // checksum over the header with the field as spaces
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < Block) { sum += h(i) & 0xff; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csPadded = ("0" * (6 - cs.length)) + cs
      System.arraycopy(csPadded.getBytes("US-ASCII"), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h, 0, Block)
      out.write(data, 0, data.length)
      val pad = (Block - data.length % Block) % Block
      out.write(new Array[Byte](pad), 0, pad)
    }
    out.write(new Array[Byte](2 * Block), 0, 2 * Block) // end marker
    out.toByteArray
  }

  /** A gzipped tar — the dataset-dump shape. */
  def tarGz(files: Seq[(String, Array[Byte])]): Array[Byte] =
    Warc.gzip(tar(files))
}
