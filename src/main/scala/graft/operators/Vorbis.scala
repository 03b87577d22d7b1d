package graft.operators

/** Vorbis I audio decode — the packet layer behind the [[Ogg]]
  * container walk (the r15 verdict's last multimodal boundary: ogg
  * triage stopped at the page grammar because no encoder existed to
  * pin against; this round builds the encoder/decoder PAIR from the
  * public Vorbis I specification, the same move as [[Mp3Pcm]]/
  * [[Flac]]/[[Vp8]]).
  *
  * Implemented (Vorbis I spec, xiph.org, sections cited inline):
  *  - LSB-first bitpacking (§2) — note this is the OPPOSITE bit order
  *    of the MP3/FLAC readers;
  *  - the three headers (§4): identification, comment (skipped),
  *    setup — full codebook grammar (§3.2: ordered/unordered
  *    codeword lengths, sparse flag, VQ lookup types 0/1/2 with the
  *    float32 pack of §9.2.2), floor type 1 (§7.2), residue types
  *    0/1/2 (§8.6), mapping type 0 with square-polar coupling
  *    (§4.3.9), modes;
  *  - audio packet decode (§4.3): mode select, floor1 curve synthesis
  *    (low/high neighbor, render_point/render_line with the exact
  *    integer math of §9.2.6-7 and the amplitude table of §10.1),
  *    residue partition decode with cascaded passes, inverse
  *    coupling, floor × residue, inverse MDCT (§1.3.2, direct form),
  *    the Vorbis window (§1.3.2), lapped overlap-add, and the
  *    right-edge cache between packets (first packet emits nothing —
  *    §1.3.2's "data is not returned from the first frame").
  *
  * Honest boundaries (FIXTURES.md pattern — reject, never guess):
  *  - floor type 0 (LSP synthesis) → None: retired in practice
  *    (every reference encoder emits floor1);
  *  - streams with TWO block sizes (blocksize_0 != blocksize_1) →
  *    None: the unequal-lap window slopes are unpinnable without a
  *    foreign conformance stream; single-blocksize streams use the
  *    full spec window math;
  *  - the §10.1 floor1_inverse_dB_table is GENERATED from its
  *    defining exponential (table[i] = 0.8278826 · e^(0.0622535662
  *    · (i−255)), the spec's 140.9 dB range over 256 steps) rather
  *    than transcribed float-by-float; a foreign-stream conformance
  *    pin would lock the literal constants (recorded in
  *    FIXTURES.md).
  *
  * Everything decodes from real Ogg pages: [[Vorbis.decodeOgg]] walks
  * pages with [[Ogg]]'s verified-CRC parser shape, reassembles
  * packets across lacing continuations, and feeds them here. Dirty
  * bytes → None, never a throw. */
object Vorbis {

  // ------------------------------------------------------------------
  // §2 bitpacking: LSB-first within each byte
  // ------------------------------------------------------------------

  final class BitReader(val buf: Array[Byte], var pos: Int = 0) {
    // pos counts BITS from the start of buf
    var eof: Boolean = false
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIx = pos >>> 3
        if (byteIx >= buf.length) { eof = true; return v }
        val bit = (buf(byteIx) >> (pos & 7)) & 1
        v |= bit << i
        pos += 1
        i += 1
      }
      v
    }
    def readLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        val byteIx = pos >>> 3
        if (byteIx >= buf.length) { eof = true; return v }
        val bit = ((buf(byteIx) >> (pos & 7)) & 1).toLong
        v |= bit << i
        pos += 1
        i += 1
      }
      v
    }
    def readBool(): Boolean = read(1) == 1
  }

  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def write(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >>> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i += 1
      }
    }
    def writeLong(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= (((v >>> i) & 1L).toInt) << nbits
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i += 1
      }
    }
    def bytes: Array[Byte] = {
      if (nbits > 0) { out.write(cur); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  /** §9.2.1 ilog: position of the highest set bit (ilog(0) = 0). */
  def ilog(x0: Int): Int = {
    var x = x0; var r = 0
    while (x > 0) { r += 1; x >>>= 1 }
    r
  }

  /** §9.2.2 float32_unpack: 21-bit mantissa, 10-bit exponent
    * (biased 788), sign bit. */
  def float32Unpack(x: Long): Float = {
    val mant = (x & 0x1fffffL).toDouble
    val sign = if ((x & 0x80000000L) != 0) -1.0 else 1.0
    val exp = ((x & 0x7fe00000L) >>> 21).toInt
    (sign * mant * math.pow(2.0, exp - 788)).toFloat
  }

  /** The exact inverse of [[float32Unpack]] for encoder use: packs a
    * non-negative power-of-two-scaled rational exactly when mantissa
    * fits 21 bits. */
  def float32Pack(v: Float): Long = {
    if (v == 0f) return 0L
    val sign = if (v < 0) 0x80000000L else 0L
    var mant = math.abs(v.toDouble)
    var exp = 788
    while (mant < (1L << 20) && exp > 0) { mant *= 2; exp -= 1 }
    while (mant >= (1L << 21)) { mant /= 2; exp += 1 }
    sign | (exp.toLong << 21) | math.rint(mant).toLong
  }

  /** §9.2.4 lookup1_values: largest int v with v^dims <= entries. */
  def lookup1Values(entries: Int, dims: Int): Int = {
    var v = 1
    while (math.pow(v + 1, dims) <= entries) v += 1
    v
  }

  // ------------------------------------------------------------------
  // §3 codebook
  // ------------------------------------------------------------------

  final case class Codebook(
      dims: Int,
      entries: Int,
      lengths: Array[Int],          // 0 = unused entry
      lookupType: Int,
      vq: Array[Array[Float]]) {    // entry -> dims values (lookup 1/2)

    // canonical Huffman per §3.2.1: entries are assigned codewords in
    // order, each the lowest available value of its length. Decode
    // walks a binary trie; codewords read MSB-first of the codeword
    // value while the stream itself is LSB-first-packed bits.
    private val (trieLo, trieHi, trieVal) = buildTrie()

    /** §3.2.1's codeword assignment: entries in index order each take
      * the LOWEST unused codeword of their length. Implemented with
      * the available-slot method (one slot per depth, split on take —
      * the standard realization of the spec's assignment): `avail(d)`
      * holds the next free codeword at depth d, MSB-aligned in 32
      * bits. */
    private def buildTrie(): (Array[Int], Array[Int], Array[Int]) = {
      val lo = scala.collection.mutable.ArrayBuffer(-1)
      val hi = scala.collection.mutable.ArrayBuffer(-1)
      val tv = scala.collection.mutable.ArrayBuffer(-1)
      def newNode(): Int = { lo += -1; hi += -1; tv += -1; lo.length - 1 }
      def insert(code: Int, len: Int, e: Int): Boolean = {
        var node = 0
        var b = len - 1
        while (b >= 0) {
          val bit = (code >>> b) & 1
          val next = if (bit == 0) lo(node) else hi(node)
          val n2 = if (next == -1) {
            val nn = newNode()
            if (bit == 0) lo(node) = nn else hi(node) = nn
            nn
          } else next
          node = n2
          if (tv(node) != -1) return false // under a leaf: invalid
          b -= 1
        }
        if (tv(node) != -1 || lo(node) != -1 || hi(node) != -1)
          return false
        tv(node) = e
        true
      }
      val avail = new Array[Long](33) // -1 = none; else MSB-aligned
      java.util.Arrays.fill(avail, -1L)
      var first = true
      var e = 0
      while (e < entries) {
        val len = lengths(e)
        if (len > 0) {
          var code = 0L
          if (first) {
            code = 0L
            // splitting the root: depths 1..len each gain the sibling
            // branch of the taken all-zeros path
            var d = 1
            while (d <= len) { avail(d) = 1L << (32 - d); d += 1 }
            first = false
          } else {
            // lowest available slot at depth <= len
            var z = len
            while (z > 0 && avail(z) == -1L) z -= 1
            if (z == 0) return (null, null, null) // over-subscribed
            code = avail(z)
            avail(z) = -1L
            // split the remainder down to len
            var d = z + 1
            while (d <= len) {
              avail(d) = code + (1L << (32 - d))
              d += 1
            }
          }
          val cw = (code >>> (32 - len)).toInt
          if (!insert(cw, len, e)) return (null, null, null)
        }
        e += 1
      }
      (lo.toArray, hi.toArray, tv.toArray)
    }

    def valid: Boolean = trieLo != null

    /** Decode one scalar entry index; -1 on EOF/invalid walk. */
    def decodeScalar(r: BitReader): Int = {
      var node = 0
      var steps = 0
      while (steps <= 32) {
        if (trieVal(node) >= 0) return trieVal(node)
        val bit = r.read(1)
        if (r.eof) return -1
        node = if (bit == 0) trieLo(node) else trieHi(node)
        if (node == -1) return -1
        steps += 1
      }
      -1
    }

    /** Decode one VQ vector (lookup 1/2); null on error. */
    def decodeVector(r: BitReader): Array[Float] = {
      val e = decodeScalar(r)
      if (e < 0 || vq == null) null else vq(e)
    }
  }

  /** The §3.2.1 canonical codeword assignment as a table — the
    * ENCODER's side of [[Codebook]]'s trie (same available-slot
    * algorithm, same order), so written codewords decode back to
    * their entries by construction. Returns (code, len) per entry,
    * code MSB-first; len 0 = unused. */
  def codewordTable(lengths: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](lengths.length)
    val avail = new Array[Long](33)
    java.util.Arrays.fill(avail, -1L)
    var first = true
    var e = 0
    while (e < lengths.length) {
      val len = lengths(e)
      if (len > 0) {
        var code = 0L
        if (first) {
          var d = 1
          while (d <= len) { avail(d) = 1L << (32 - d); d += 1 }
          first = false
        } else {
          var z = len
          while (z > 0 && avail(z) == -1L) z -= 1
          require(z > 0, "codewordTable: over-subscribed lengths")
          code = avail(z)
          avail(z) = -1L
          var d = z + 1
          while (d <= len) { avail(d) = code + (1L << (32 - d)); d += 1 }
        }
        out(e) = ((code >>> (32 - len)).toInt, len)
      } else out(e) = (0, 0)
      e += 1
    }
    out
  }

  /** Write one codeword (MSB-first code value, bit by bit into the
    * LSB-first stream — the inverse of the decode trie walk). */
  def writeCodeword(w: BitWriter, code: Int, len: Int): Unit = {
    var b = len - 1
    while (b >= 0) { w.write((code >>> b) & 1, 1); b -= 1 }
  }

  /** §3.2 codebook_decode from the setup bitstream. */
  def readCodebook(r: BitReader): Option[Codebook] = {
    if (r.read(24) != 0x564342) return None // sync 'BCV' little-endian
    val dims = r.read(16)
    val entries = r.read(24)
    if (dims <= 0 || entries <= 0 || entries > (1 << 20)) return None
    val lengths = new Array[Int](entries)
    val ordered = r.readBool()
    if (!ordered) {
      val sparse = r.readBool()
      var i = 0
      while (i < entries) {
        if (sparse) {
          if (r.readBool()) lengths(i) = r.read(5) + 1 else lengths(i) = 0
        } else lengths(i) = r.read(5) + 1
        i += 1
      }
    } else {
      var cur = r.read(5) + 1
      var i = 0
      while (i < entries) {
        val num = r.read(ilog(entries - i))
        var j = 0
        while (j < num && i < entries) { lengths(i) = cur; i += 1; j += 1 }
        cur += 1
        if (cur > 32) return None
      }
    }
    if (r.eof) return None
    val lookupType = r.read(4)
    val vq: Array[Array[Float]] = lookupType match {
      case 0 => null
      case 1 | 2 =>
        val min = float32Unpack(r.readLong(32))
        val delta = float32Unpack(r.readLong(32))
        val valueBits = r.read(4) + 1
        val seqP = r.readBool()
        // allocation bomb guard: a garbage header can claim 2^20
        // entries × 2^16 dims — cap the materialized table (real
        // Vorbis books are a few thousand values)
        if (entries.toLong * dims > (1L << 22)) return None
        val nVals =
          if (lookupType == 1) lookup1Values(entries, dims)
          else entries * dims
        val mults = new Array[Int](nVals)
        var i = 0
        while (i < nVals) { mults(i) = r.read(valueBits); i += 1 }
        if (r.eof) return None
        val out = Array.ofDim[Float](entries, dims)
        var e = 0
        while (e < entries) {
          var last = 0.0f
          if (lookupType == 1) {
            var idxDiv = 1
            var d = 0
            while (d < dims) {
              val off = (e / idxDiv) % nVals
              out(e)(d) = mults(off) * delta + min + last
              if (seqP) last = out(e)(d)
              idxDiv *= nVals
              d += 1
            }
          } else {
            var d = 0
            while (d < dims) {
              out(e)(d) = mults(e * dims + d) * delta + min + last
              if (seqP) last = out(e)(d)
              d += 1
            }
          }
          e += 1
        }
        out
      case _ => return None
    }
    val cb = Codebook(dims, entries, lengths, lookupType, vq)
    if (!cb.valid) None else Some(cb)
  }

  // ------------------------------------------------------------------
  // §7.2 floor type 1
  // ------------------------------------------------------------------

  final case class Floor1(
      partitionClasses: Array[Int],
      classDims: Array[Int],
      classSubclasses: Array[Int],
      classMasterbooks: Array[Int],
      subclassBooks: Array[Array[Int]],
      multiplier: Int,
      xList: Array[Int])

  def readFloor1(r: BitReader): Option[Floor1] = {
    val partitions = r.read(5)
    val partitionClasses = Array.fill(partitions)(r.read(4))
    val maxClass = if (partitions == 0) -1 else partitionClasses.max
    val nClasses = maxClass + 1
    val classDims = new Array[Int](nClasses)
    val classSub = new Array[Int](nClasses)
    val classMaster = new Array[Int](nClasses)
    val subBooks = new Array[Array[Int]](nClasses)
    var i = 0
    while (i < nClasses) {
      classDims(i) = r.read(3) + 1
      classSub(i) = r.read(2)
      classMaster(i) = if (classSub(i) > 0) r.read(8) else -1
      val n = 1 << classSub(i)
      subBooks(i) = Array.fill(n)(r.read(8) - 1) // -1 = no book
      i += 1
    }
    val multiplier = r.read(2) + 1
    val rangeBits = r.read(4)
    val xs = scala.collection.mutable.ArrayBuffer(0, 1 << rangeBits)
    i = 0
    while (i < partitions) {
      val c = partitionClasses(i)
      var j = 0
      while (j < classDims(c)) { xs += r.read(rangeBits); j += 1 }
      i += 1
    }
    if (r.eof) return None
    // §7.2.2: x values must be unique
    val arr = xs.toArray
    if (arr.distinct.length != arr.length) return None
    Some(Floor1(partitionClasses, classDims, classSub, classMaster,
      subBooks, multiplier, arr))
  }

  /** §10.1 floor1_inverse_dB_table, generated from its defining
    * exponential (see the class doc's honest-boundary note). */
  val inverseDbTable: Array[Float] = Array.tabulate(256) { i =>
    (0.8278826 * math.exp(0.0622535662 * (i - 255))).toFloat
  }

  private val rangeByMultiplier = Array(0, 256, 128, 86, 64)

  /** §7.2.3 floor1 packet decode → post Y values, or null when the
    * floor is "unused" this frame (silence). */
  def decodeFloor1Posts(r: BitReader, f: Floor1,
      books: Array[Codebook]): Array[Int] = {
    if (!r.readBool()) return null // nonzero flag
    val range = rangeByMultiplier(f.multiplier)
    val posts = new Array[Int](f.xList.length)
    posts(0) = r.read(ilog(range - 1))
    posts(1) = r.read(ilog(range - 1))
    var offset = 2
    var i = 0
    while (i < f.partitionClasses.length) {
      val cls = f.partitionClasses(i)
      val cdim = f.classDims(cls)
      val cbits = f.classSubclasses(cls)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0) {
        cval = books(f.classMasterbooks(cls)).decodeScalar(r)
        if (cval < 0) return null
      }
      var j = 0
      while (j < cdim) {
        val book = f.subclassBooks(cls)(cval & csub)
        cval >>>= cbits
        if (book >= 0) {
          val v = books(book).decodeScalar(r)
          if (v < 0) return null
          posts(offset + j) = v
        } else posts(offset + j) = 0
        j += 1
      }
      offset += cdim
      i += 1
    }
    posts
  }

  /** §9.2.6 low_neighbor / high_neighbor over the x list. */
  private def lowNeighbor(x: Array[Int], n: Int): Int = {
    var best = -1; var i = 0
    while (i < n) {
      if (x(i) < x(n) && (best == -1 || x(i) > x(best))) best = i
      i += 1
    }
    best
  }
  private def highNeighbor(x: Array[Int], n: Int): Int = {
    var best = -1; var i = 0
    while (i < n) {
      if (x(i) > x(n) && (best == -1 || x(i) < x(best))) best = i
      i += 1
    }
    best
  }

  /** §9.2.7 render_point: y at x on the line (x0,y0)-(x1,y1), the
    * spec's exact integer math. */
  def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  /** §7.2.4 step 2: compute final Y values + step2 flags. */
  def floor1Step2(f: Floor1, posts: Array[Int]): (Array[Int], Array[Boolean]) = {
    val range = rangeByMultiplier(f.multiplier)
    val n = posts.length
    val finalY = new Array[Int](n)
    val step2 = new Array[Boolean](n)
    finalY(0) = posts(0); finalY(1) = posts(1)
    step2(0) = true; step2(1) = true
    var i = 2
    while (i < n) {
      val lo = lowNeighbor(f.xList, i)
      val hi = highNeighbor(f.xList, i)
      val predicted = renderPoint(f.xList(lo), finalY(lo),
        f.xList(hi), finalY(hi), f.xList(i))
      val v = posts(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = math.min(highroom, lowroom) * 2
      if (v != 0) {
        step2(lo) = true; step2(hi) = true; step2(i) = true
        if (v >= room) {
          finalY(i) = if (highroom > lowroom) v - lowroom + predicted
            else predicted - (v - highroom) - 1
        } else {
          finalY(i) = if ((v & 1) == 1) predicted - ((v + 1) / 2)
            else predicted + v / 2
        }
      } else {
        step2(i) = false
        finalY(i) = predicted
      }
      i += 1
    }
    (finalY, step2)
  }

  /** §9.2.8 render_line into the output (values are table indexes);
    * plus §7.2.4 step 3's sort-by-x and final curve synthesis. */
  def floor1Curve(f: Floor1, posts: Array[Int], n2: Int): Array[Float] = {
    val (finalY, step2) = floor1Step2(f, posts)
    val range = rangeByMultiplier(f.multiplier)
    val order = f.xList.indices.sortBy(f.xList)
    val out = new Array[Int](n2)
    var lastX = -1; var lastY = 0
    order.foreach { ix =>
      if (step2(ix)) {
        val x = f.xList(ix)
        val y = math.min(math.max(finalY(ix), 0), range - 1)
        if (lastX < 0) {
          // flat up to the first post
          var j = 0
          while (j < math.min(x, n2)) { out(j) = y; j += 1 }
        } else if (lastX < n2) {
          // render_line (Bresenham, the spec's integer walk)
          val adx = x - lastX
          val ady = math.abs(y - lastY)
          val base = (y - lastY) / adx
          val sy = if (y - lastY < 0) base - 1 else base + 1
          val abase = math.abs(base)
          val aerr = ady - abase * adx
          var cy = lastY
          var err = 0
          out(lastX) = cy
          var j = lastX + 1
          while (j < math.min(x, n2)) {
            err += aerr
            if (err >= adx) { err -= adx; cy += sy } else cy += base
            out(j) = cy
            j += 1
          }
        }
        lastX = x; lastY = y
      }
    }
    // flat after the last post
    if (lastX >= 0 && lastX < n2) {
      var j = math.max(lastX, 0)
      while (j < n2) { out(j) = lastY; j += 1 }
    }
    Array.tabulate(n2)(j =>
      inverseDbTable(math.min(255, math.max(0, out(j) * f.multiplier))))
  }

  // ------------------------------------------------------------------
  // §8 residue
  // ------------------------------------------------------------------

  final case class Residue(
      rtype: Int,
      begin: Int,
      end: Int,
      partitionSize: Int,
      classifications: Int,
      classbook: Int,
      books: Array[Array[Int]]) // [class][pass] -> book or -1

  def readResidue(r: BitReader, rtype: Int): Option[Residue] = {
    val begin = r.read(24)
    val end = r.read(24)
    val psize = r.read(24) + 1
    val classifications = r.read(6) + 1
    val classbook = r.read(8)
    val cascades = Array.fill(classifications) {
      val lowBits = r.read(3)
      val high = if (r.readBool()) r.read(5) else 0
      (high << 3) | lowBits
    }
    val books = Array.tabulate(classifications, 8) { (c, p) =>
      if ((cascades(c) & (1 << p)) != 0) r.read(8) else -1
    }
    if (r.eof || end < begin) None
    else Some(Residue(rtype, begin, end, psize, classifications,
      classbook, books.map(_.toArray)))
  }

  /** §8.6.2-4 residue decode into `ch` vectors of length `n2`.
    * Type 2 interleaves all channels into one vector first. */
  def decodeResidue(r: BitReader, res: Residue, books: Array[Codebook],
      ch: Int, n2: Int, doNotDecode: Array[Boolean]): Array[Array[Float]] = {
    val out = Array.ofDim[Float](ch, n2)
    if (res.rtype == 2) {
      if (doNotDecode.forall(identity)) return out
      val inter = decodeResidueInner(r, res, books, 1, n2 * ch,
        Array(false))
      if (inter == null) return null
      var i = 0
      while (i < n2 * ch) { out(i % ch)(i / ch) = inter(0)(i); i += 1 }
      out
    } else {
      val dec = decodeResidueInner(r, res, books, ch, n2, doNotDecode)
      if (dec == null) null else dec
    }
  }

  private def decodeResidueInner(r: BitReader, res: Residue,
      books: Array[Codebook], ch: Int, n: Int,
      doNotDecode: Array[Boolean]): Array[Array[Float]] = {
    val out = Array.ofDim[Float](ch, n)
    val classbook = books(res.classbook)
    val classwords = classbook.dims
    val begin = math.min(res.begin, n)
    val end = math.min(res.end, n)
    val toRead = end - begin
    if (toRead == 0) return out
    val partitions = toRead / res.partitionSize
    val classifs = Array.ofDim[Int](ch, partitions + classwords)
    var pass = 0
    while (pass < 8) {
      var partition = 0
      while (partition < partitions) {
        if (pass == 0) {
          var j = 0
          while (j < ch) {
            if (!doNotDecode(j)) {
              var t = classbook.decodeScalar(r)
              if (t < 0) return null
              var i = classwords - 1
              while (i >= 0) {
                classifs(j)(partition + i) = t % res.classifications
                t /= res.classifications
                i -= 1
              }
            }
            j += 1
          }
        }
        var cw = 0
        while (cw < classwords && partition < partitions) {
          var j = 0
          while (j < ch) {
            if (!doNotDecode(j)) {
              val vqclass = classifs(j)(partition)
              val book = res.books(vqclass)(pass)
              if (book >= 0) {
                val b = books(book)
                val offset = begin + partition * res.partitionSize
                if (res.rtype == 0) {
                  // interleaved stride: step = psize/dims
                  val step = res.partitionSize / b.dims
                  var s = 0
                  while (s < step) {
                    val v = b.decodeVector(r)
                    if (v == null) return null
                    var d = 0
                    while (d < b.dims) {
                      out(j)(offset + s + d * step) += v(d)
                      d += 1
                    }
                    s += 1
                  }
                } else {
                  // type 1 (and 2 via the interleave wrapper):
                  // sequential; a book whose dims do not divide the
                  // partition size must not write past the partition
                  var i = 0
                  while (i < res.partitionSize) {
                    val v = b.decodeVector(r)
                    if (v == null) return null
                    var d = 0
                    while (d < b.dims && i < res.partitionSize &&
                        offset + i < n) {
                      out(j)(offset + i) += v(d)
                      i += 1
                      d += 1
                    }
                  }
                }
              }
            }
            j += 1
          }
          partition += 1
          cw += 1
        }
      }
      pass += 1
      // stop early when no class selects a book in any later pass
      var any = false
      var c = 0
      while (c < res.classifications && !any) {
        var p = pass
        while (p < 8 && !any) { if (res.books(c)(p) >= 0) any = true; p += 1 }
        c += 1
      }
      if (!any) return out
    }
    out
  }

  // ------------------------------------------------------------------
  // §4.3.9 mapping, §4.3.10 mode
  // ------------------------------------------------------------------

  final case class Mapping(
      submaps: Int,
      couplingMag: Array[Int],
      couplingAng: Array[Int],
      mux: Array[Int],        // channel -> submap
      submapFloor: Array[Int],
      submapResidue: Array[Int])

  def readMapping(r: BitReader, channels: Int,
      nFloors: Int, nResidues: Int): Option[Mapping] = {
    val mapType = r.read(16)
    if (mapType != 0) return None
    val submaps = if (r.readBool()) r.read(4) + 1 else 1
    var mag = Array.empty[Int]
    var ang = Array.empty[Int]
    if (r.readBool()) {
      val steps = r.read(8) + 1
      mag = new Array[Int](steps)
      ang = new Array[Int](steps)
      var i = 0
      val bits = ilog(channels - 1)
      while (i < steps) {
        mag(i) = r.read(bits)
        ang(i) = r.read(bits)
        if (mag(i) == ang(i) || mag(i) >= channels || ang(i) >= channels)
          return None
        i += 1
      }
    }
    if (r.read(2) != 0) return None // reserved
    val mux = new Array[Int](channels)
    if (submaps > 1) {
      var i = 0
      while (i < channels) {
        mux(i) = r.read(4)
        if (mux(i) >= submaps) return None
        i += 1
      }
    }
    val sFloor = new Array[Int](submaps)
    val sRes = new Array[Int](submaps)
    var i = 0
    while (i < submaps) {
      r.read(8) // unused time config
      sFloor(i) = r.read(8)
      sRes(i) = r.read(8)
      if (sFloor(i) >= nFloors || sRes(i) >= nResidues) return None
      i += 1
    }
    Some(Mapping(submaps, mag, ang, mux, sFloor, sRes))
  }

  final case class Mode(blockflag: Int, mapping: Int)

  // ------------------------------------------------------------------
  // setup: the whole decoder state
  // ------------------------------------------------------------------

  final case class Setup(
      channels: Int,
      sampleRate: Long,
      blocksize: Int,
      books: Array[Codebook],
      floors: Array[Floor1],
      residues: Array[Residue],
      mappings: Array[Mapping],
      modes: Array[Mode])

  /** Parse the §4.2.1 identification header (packet type 1). */
  def parseIdHeader(p: Array[Byte]): Option[(Int, Long, Int, Int)] = {
    if (p.length < 30 || p(0) != 1 ||
      new String(p, 1, 6, "US-ASCII") != "vorbis") return None
    val r = new BitReader(p, 7 * 8)
    val version = r.readLong(32)
    if (version != 0L) return None
    val channels = r.read(8)
    val rate = r.readLong(32)
    r.readLong(32); r.readLong(32); r.readLong(32) // bitrates
    val bs0 = 1 << r.read(4)
    val bs1 = 1 << r.read(4)
    if (r.read(1) != 1) return None // framing
    if (channels <= 0 || rate <= 0) return None
    // §4.2.1: block sizes must lie in [64, 8192] (also keeps n2 > 0
    // through every synthesis division downstream)
    if (bs0 < 64 || bs0 > 8192 || bs1 < 64 || bs1 > 8192) return None
    Some((channels, rate, bs0, bs1))
  }

  /** Parse the §4.2.4 setup header (packet type 5). */
  def parseSetupHeader(p: Array[Byte], channels: Int, rate: Long,
      blocksize: Int): Option[Setup] = {
    if (p.length < 7 || p(0) != 5 ||
      new String(p, 1, 6, "US-ASCII") != "vorbis") return None
    val r = new BitReader(p, 7 * 8)
    val nBooks = r.read(8) + 1
    val books = new Array[Codebook](nBooks)
    var i = 0
    while (i < nBooks) {
      readCodebook(r) match {
        case Some(b) => books(i) = b
        case None => return None
      }
      i += 1
    }
    // time domain transforms: vestigial zeros
    val timeCount = r.read(6) + 1
    i = 0
    while (i < timeCount) { if (r.read(16) != 0) return None; i += 1 }
    val nFloors = r.read(6) + 1
    val floors = new Array[Floor1](nFloors)
    i = 0
    while (i < nFloors) {
      val ftype = r.read(16)
      if (ftype != 1) return None // floor0 out of the honest subset
      readFloor1(r) match {
        case Some(f) => floors(i) = f
        case None => return None
      }
      i += 1
    }
    val nRes = r.read(6) + 1
    val residues = new Array[Residue](nRes)
    i = 0
    while (i < nRes) {
      val rtype = r.read(16)
      if (rtype > 2) return None
      readResidue(r, rtype) match {
        case Some(x) => residues(i) = x
        case None => return None
      }
      i += 1
    }
    val nMaps = r.read(6) + 1
    val mappings = new Array[Mapping](nMaps)
    i = 0
    while (i < nMaps) {
      readMapping(r, channels, nFloors, nRes) match {
        case Some(m) => mappings(i) = m
        case None => return None
      }
      i += 1
    }
    val nModes = r.read(6) + 1
    val modes = new Array[Mode](nModes)
    i = 0
    while (i < nModes) {
      val blockflag = r.read(1)
      if (r.read(16) != 0) return None // window type
      if (r.read(16) != 0) return None // transform type
      val mapping = r.read(8)
      if (mapping >= nMaps) return None
      modes(i) = Mode(blockflag, mapping)
      i += 1
    }
    if (r.read(1) != 1) return None // framing
    if (r.eof) return None
    // cross-validate every book REFERENCE against the book list —
    // the spec's "an out of range book number is an error" rules,
    // and exactly what a garbage header needs to index out of bounds
    val okFloors = floors.forall { f =>
      val classes = f.classDims.indices
      classes.forall { c =>
        (f.classSubclasses(c) == 0 ||
          (f.classMasterbooks(c) >= 0 &&
            f.classMasterbooks(c) < nBooks)) &&
        f.subclassBooks(c).forall(b => b >= -1 && b < nBooks)
      }
    }
    val okResidues = residues.forall { res =>
      res.classbook >= 0 && res.classbook < nBooks &&
      books(res.classbook).dims >= 1 &&
      res.books.forall(_.forall(b => b >= -1 && b < nBooks)) &&
      // every referenced value book must carry a VQ table (§8.6.2:
      // residue books with no lookup are an error)
      res.books.forall(_.forall(b => b < 0 || books(b).vq != null))
    }
    if (!okFloors || !okResidues) return None
    Some(Setup(channels, rate, blocksize, books, floors, residues,
      mappings, modes))
  }

  // ------------------------------------------------------------------
  // §1.3.2 window + inverse MDCT
  // ------------------------------------------------------------------

  /** The Vorbis window: sin(π/2 · sin²((i+0.5)/n · π)). */
  def window(n: Int): Array[Double] = Array.tabulate(n) { i =>
    val s = math.sin(math.Pi / n * (i + 0.5))
    math.sin(math.Pi / 2 * s * s)
  }

  /** Inverse MDCT, direct form (§1.3.2): n/2 spectral values → n time
    * values. O(n²) — fixture-scale blocks; a split-radix drop-in
    * would change nothing semantically. */
  def imdct(spec: Array[Float]): Array[Double] = {
    val n2 = spec.length
    val n = n2 * 2
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var acc = 0.0
      var k = 0
      while (k < n2) {
        acc += spec(k) * math.cos(
          math.Pi / (4.0 * n2) * (2 * i + 1 + n2) * (2 * k + 1))
        k += 1
      }
      out(i) = acc
      i += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // audio packet decode + PCM assembly
  // ------------------------------------------------------------------

  final case class Decoded(channels: Int, sampleRate: Long,
      pcm: Array[Int], packets: Int)

  /** Decode one audio packet (§4.3) → per-channel time-domain block
    * (windowed, pre-overlap), or None on an out-of-spec packet. */
  def decodePacket(setup: Setup, p: Array[Byte])
      : Option[Array[Array[Double]]] = {
    val r = new BitReader(p)
    if (r.read(1) != 0) return None // audio packets have type bit 0
    val modeIx = r.read(ilog(setup.modes.length - 1))
    if (modeIx >= setup.modes.length) return None
    val mode = setup.modes(modeIx)
    if (mode.blockflag != 0) return None // single-blocksize subset
    val mapping = setup.mappings(mode.mapping)
    val n = setup.blocksize
    val n2 = n / 2
    val ch = setup.channels
    // floor per channel
    val floorOut = new Array[Array[Float]](ch)
    val noResidue = new Array[Boolean](ch)
    var c = 0
    while (c < ch) {
      val sub = mapping.mux(c)
      val f = setup.floors(mapping.submapFloor(sub))
      val posts = decodeFloor1Posts(r, f, setup.books)
      if (posts == null) { noResidue(c) = true; floorOut(c) = null }
      else floorOut(c) = floor1Curve(f, posts, n2)
      c += 1
    }
    // §4.3.2: coupling makes a channel's residue needed if its
    // partner has a floor
    var s = 0
    while (s < mapping.couplingMag.length) {
      if (!noResidue(mapping.couplingMag(s)) ||
          !noResidue(mapping.couplingAng(s))) {
        noResidue(mapping.couplingMag(s)) = false
        noResidue(mapping.couplingAng(s)) = false
      }
      s += 1
    }
    // residue per submap
    val resOut = Array.ofDim[Float](ch, n2)
    var sub = 0
    while (sub < mapping.submaps) {
      val chIx = (0 until ch).filter(mapping.mux(_) == sub)
      val dnd = chIx.map(noResidue(_)).toArray
      val res = setup.residues(mapping.submapResidue(sub))
      val dec = decodeResidue(r, res, setup.books, chIx.length, n2, dnd)
      if (dec == null) return None
      chIx.zipWithIndex.foreach { case (cix, j) => resOut(cix) = dec(j) }
      sub += 1
    }
    // inverse coupling (§4.3.5 square polar)
    s = mapping.couplingMag.length - 1
    while (s >= 0) {
      val m = resOut(mapping.couplingMag(s))
      val a = resOut(mapping.couplingAng(s))
      var i = 0
      while (i < n2) {
        val mag = m(i); val ang = a(i)
        if (mag > 0) {
          if (ang > 0) { m(i) = mag; a(i) = mag - ang }
          else { a(i) = mag; m(i) = mag + ang }
        } else {
          if (ang > 0) { m(i) = mag; a(i) = mag + ang }
          else { a(i) = mag; m(i) = mag - ang }
        }
        i += 1
      }
      s -= 1
    }
    // dot product + IMDCT + window
    val win = window(n)
    val out = new Array[Array[Double]](ch)
    c = 0
    while (c < ch) {
      val spec = new Array[Float](n2)
      if (floorOut(c) != null) {
        var i = 0
        while (i < n2) { spec(i) = floorOut(c)(i) * resOut(c)(i); i += 1 }
      }
      val time = imdct(spec)
      var i = 0
      while (i < n) { time(i) *= win(i); i += 1 }
      out(c) = time
      c += 1
    }
    Some(out)
  }

  /** Decode a whole Ogg/Vorbis stream to interleaved 16-bit PCM.
    * Packet 1 = id, 2 = comment (skipped), 3 = setup, then audio
    * packets with lapped overlap-add; the FIRST audio packet primes
    * the lap cache and emits nothing (§1.3.2). */
  def decodeOgg(bytes: Array[Byte]): Option[Decoded] = {
    val packets = oggPackets(bytes).getOrElse(return None)
    decodePackets(packets)
  }

  /** Decode Vorbis from a WebM container (r16 — [[Webm]]'s audio
    * triage graduates to packet decode): the three header packets
    * come Xiph-laced from the track's CodecPrivate (the Matroska
    * shipping form), the audio packets from the track's SimpleBlocks;
    * the synthesis loop is [[decodePackets]], byte-identical to the
    * Ogg path — the same stream in either container must decode to
    * the same PCM (VorbisSpec pins the equality). */
  def decodeWebm(bytes: Array[Byte]): Option[Decoded] = {
    val (codec, cp, blocks) = Webm.audioPackets(bytes)
      .getOrElse(return None)
    if (codec != "A_VORBIS") return None
    val headers = xiphLacedPackets(cp).getOrElse(return None)
    if (headers.length != 3) return None
    decodePackets(headers ++ blocks)
  }

  /** Matroska CodecPrivate for Vorbis: byte 0 = packet count − 1
    * (must be 2), then the first two packets' sizes Xiph-laced
    * (255-continued), then the packets back to back — the last one
    * takes the remainder. */
  def xiphLacedPackets(cp: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (cp == null || cp.length < 3 || (cp(0) & 0xff) != 2) return None
    var o = 1
    val sizes = new Array[Int](2)
    var i = 0
    while (i < 2) {
      var s = 0
      var continue = true
      while (continue) {
        if (o >= cp.length) return None
        val v = cp(o) & 0xff
        s += v
        o += 1
        continue = v == 255
      }
      sizes(i) = s
      i += 1
    }
    if (o + sizes(0) + sizes(1) > cp.length) return None
    val p0 = java.util.Arrays.copyOfRange(cp, o, o + sizes(0))
    val p1 = java.util.Arrays.copyOfRange(cp, o + sizes(0),
      o + sizes(0) + sizes(1))
    val p2 = java.util.Arrays.copyOfRange(cp,
      o + sizes(0) + sizes(1), cp.length)
    if (p2.isEmpty) return None
    Some(Seq(p0, p1, p2))
  }

  /** The container-independent synthesis loop: packets(0..2) are the
    * id/comment/setup headers, the rest audio. */
  def decodePackets(packets: Seq[Array[Byte]]): Option[Decoded] = {
    if (packets.length < 4) return None
    val (channels, rate, bs0, bs1) = parseIdHeader(packets(0))
      .getOrElse(return None)
    if (bs0 != bs1) return None // honest subset: one block size
    // comment header must at least claim type 3
    if (packets(1).isEmpty || packets(1)(0) != 3) return None
    val setup = parseSetupHeader(packets(2), channels, rate, bs0)
      .getOrElse(return None)
    val n = bs0
    val n2 = n / 2
    val pcm = new scala.collection.mutable.ArrayBuffer[Int]()
    var lap: Array[Array[Double]] = null // previous right half, windowed
    var nAudio = 0
    var i = 3
    while (i < packets.length) {
      decodePacket(setup, packets(i)) match {
        case None => return None
        case Some(time) =>
          nAudio += 1
          if (lap != null) {
            var s = 0
            while (s < n2) {
              var c = 0
              while (c < channels) {
                val v = lap(c)(n2 + s) + time(c)(s)
                val q = math.max(-32768, math.min(32767,
                  math.rint(v * 32767.0).toInt))
                pcm += q
                c += 1
              }
              s += 1
            }
          }
          lap = time
      }
      i += 1
    }
    if (nAudio == 0) return None
    Some(Decoded(channels, rate, pcm.toArray, nAudio))
  }

  /** Reassemble the logical packets of a single-stream Ogg (verified
    * CRC, lacing continuations across pages — [[Ogg.parse]]'s walk,
    * but returning the bytes).
    *
    * Page-LEVEL integrity is checked too (r17 — CRC alone only proves
    * each surviving page is intact, not that every page survived): the
    * sequence numbers (bytes 18–21, Ogg framing §Page header) must be
    * consecutive per the single stream, the serial (bytes 14–17) must
    * not change mid-stream, and the continued-packet flag (header-type
    * bit 0x01) must agree with the lacing state carried across the
    * page boundary. A stream missing or reordering a WHOLE page —
    * every remaining page individually CRC-valid — would otherwise
    * silently splice two packet fragments into one garbage packet (or
    * drop packets), instead of the documented dirty-bytes-return-None
    * behavior. */
  def oggPackets(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    val packets = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val cur = new java.io.ByteArrayOutputStream()
    var open = false
    var o = 0
    var lastSeq = -1L
    var serial = -1L
    while (o + 27 <= b.length) {
      if (!(b(o) == 'O' && b(o + 1) == 'g' && b(o + 2) == 'g' &&
          b(o + 3) == 'S') || b(o + 4) != 0) return None
      val htype = b(o + 5) & 0xff
      val pageSerial = (b(o + 14) & 0xffL) | ((b(o + 15) & 0xffL) << 8) |
        ((b(o + 16) & 0xffL) << 16) | ((b(o + 17) & 0xffL) << 24)
      val seq = (b(o + 18) & 0xffL) | ((b(o + 19) & 0xffL) << 8) |
        ((b(o + 20) & 0xffL) << 16) | ((b(o + 21) & 0xffL) << 24)
      if (lastSeq < 0) serial = pageSerial
      else {
        if (pageSerial != serial) return None // multiplexed/foreign page
        if (seq != lastSeq + 1) return None   // a page is missing/reordered
      }
      lastSeq = seq
      // continued flag vs the carried lacing state: a page claiming to
      // continue a packet needs one open; a page NOT claiming it while
      // one is open means the continuation page was lost
      if (((htype & 0x01) != 0) != open) return None
      val nSegs = b(o + 26) & 0xff
      if (o + 27 + nSegs > b.length) return None
      val laces = Array.tabulate(nSegs)(j => b(o + 27 + j) & 0xff)
      val bodyLen = laces.sum
      val total = 27 + nSegs + bodyLen
      if (o + total > b.length) return None
      val stored = ((b(o + 22) & 0xffL) | ((b(o + 23) & 0xffL) << 8) |
        ((b(o + 24) & 0xffL) << 16) | ((b(o + 25) & 0xffL) << 24)).toInt
      if (Ogg.crc(b, o, total, o + 22) != stored) return None
      var body = o + 27 + nSegs
      laces.foreach { l =>
        cur.write(b, body, l)
        body += l
        open = true
        if (l < 255) {
          packets += cur.toByteArray
          cur.reset()
          open = false
        }
      }
      o += total
    }
    if (o != b.length || open) return None
    Some(packets.toSeq)
  }
}

/** The fixture ENCODER half of the [[Vorbis]] pair — the same move as
  * the MP3/FLAC/VP8 fixture writers: a from-scratch, spec-grammar
  * bitstream writer whose output the decoder must reproduce exactly,
  * so every structure (codeword assignment, floor posts, residue
  * partitions, packet framing, Ogg lacing) is pinned from both sides
  * without foreign binaries.
  *
  * Profile (all within the spec, chosen minimal):
  *  - mono, one blocksize (256), one mode/mapping, no coupling;
  *  - three codebooks: a 64-entry scalar floor book (uniform 6-bit
  *    lengths — an exactly-populated tree), a 4-entry residue
  *    classbook (2 classes × classwords 2), an 81-entry lookup-type-2
  *    residue book (dims 4, components from {−q, 0, +q} — lengths
  *    47×6 + 34×7, Kraft-exact);
  *  - floor1: one partition, class dim 2, multiplier 2, x list
  *    [0, 128, 42, 85] — a FLAT max-amplitude floor is posts
  *    [127, 127, 0, 0] (the zero posts ride the predicted line);
  *  - residue type 2, partition size 16, class 0 = silent, class 1 =
  *    one pass through the VQ book.
  *
  * [[VorbisEnc.audioPacket]] writes CHOSEN residue digits — the
  * fixture defines spectra directly (a deliberate non-goal: rate
  * control and psychoacoustics; the decode math downstream of the
  * spectrum is what the pair pins). */
object VorbisEnc {

  val N = 256
  val N2 = 128
  /** residue quantization step (delta): 2^-6, exactly packable and
    * sized so a dozen active lines peak near -20 dBFS — full-scale
    * PCM without clipping */
  val Q = 0.015625f

  val floorLengths: Array[Int] = Array.fill(64)(6)
  val classLengths: Array[Int] = Array.fill(4)(2)
  val partLengths: Array[Int] =
    Array.fill(47)(6) ++ Array.fill(34)(7)

  private lazy val floorCw = Vorbis.codewordTable(floorLengths)
  private lazy val classCw = Vorbis.codewordTable(classLengths)
  private lazy val partCw = Vorbis.codewordTable(partLengths)

  /** digits (base 3, length 4, d0 most significant) of a part-book
    * entry — component d = digit d − 1, scaled by Q at decode. */
  def partEntry(digits: Array[Int]): Int =
    digits.foldLeft(0)((a, d) => a * 3 + d)

  private def writeScalarBook(w: Vorbis.BitWriter,
      dims: Int, lengths: Array[Int]): Unit = {
    w.write(0x564342, 24)
    w.write(dims, 16)
    w.write(lengths.length, 24)
    w.write(0, 1) // unordered
    w.write(0, 1) // not sparse
    lengths.foreach(l => w.write(l - 1, 5))
    w.write(0, 4) // lookup type 0
  }

  private def writePartBook(w: Vorbis.BitWriter): Unit = {
    w.write(0x564342, 24)
    w.write(4, 16)  // dims
    w.write(81, 24) // entries
    w.write(0, 1); w.write(0, 1)
    partLengths.foreach(l => w.write(l - 1, 5))
    w.write(2, 4) // lookup type 2
    w.writeLong(Vorbis.float32Pack(-Q), 32)    // minimum
    w.writeLong(Vorbis.float32Pack(Q), 32)     // delta
    w.write(2 - 1, 4)  // value bits = 2
    w.write(0, 1)      // not sequential
    // mult table: entry e's component d = base-3 digit d of e
    var e = 0
    while (e < 81) {
      var d = 0
      var rem = e
      val digs = new Array[Int](4)
      while (d < 4) { digs(3 - d) = rem % 3; rem /= 3; d += 1 }
      digs.foreach(m => w.write(m, 2))
      e += 1
    }
  }

  /** The three header packets (id, comment, setup). */
  def headers(rate: Long): (Array[Byte], Array[Byte], Array[Byte]) = {
    // id: §4.2.1 — like Ogg.vorbisId but with real blocksizes
    val id = Ogg.vorbisId(1, rate).clone()
    id(28) = 0x88.toByte // blocksize_0 = blocksize_1 = 2^8
    // comment: type 3, empty vendor, zero comments, framing 1
    val comment = Array[Byte](3, 'v', 'o', 'r', 'b', 'i', 's',
      0, 0, 0, 0, 0, 0, 0, 0, 1)
    // setup
    val w = new Vorbis.BitWriter
    w.write(3 - 1, 8) // codebook count
    writeScalarBook(w, 1, floorLengths)  // book 0: floor Y
    writeScalarBook(w, 2, classLengths)  // book 1: classbook
    writePartBook(w)                     // book 2: residue values
    w.write(0, 6)  // time count - 1
    w.write(0, 16) // time transform 0
    w.write(0, 6)  // floor count - 1
    w.write(1, 16) // floor type 1
    w.write(1, 5)  // partitions
    w.write(0, 4)  // partition 0 -> class 0
    w.write(2 - 1, 3) // class 0 dim
    w.write(0, 2)  // subclass bits
    w.write(0 + 1, 8) // subclass book 0 -> book 0
    w.write(2 - 1, 2) // multiplier
    w.write(7, 4)  // rangebits (x1 = 128)
    w.write(42, 7) // x of post 2
    w.write(85, 7) // x of post 3
    w.write(0, 6)  // residue count - 1
    w.write(2, 16) // residue type 2
    w.write(0, 24)        // begin
    w.write(N2, 24)       // end
    w.write(16 - 1, 24)   // partition size
    w.write(2 - 1, 6)     // classifications
    w.write(1, 8)         // classbook = book 1
    // cascade: class 0 = 0 passes, class 1 = pass 0
    w.write(0, 3); w.write(0, 1)
    w.write(1, 3); w.write(0, 1)
    w.write(2, 8)         // class 1 pass 0 -> book 2 (plain number)
    w.write(0, 6)  // mapping count - 1
    w.write(0, 16) // mapping type 0
    w.write(0, 1)  // no submaps flag
    w.write(0, 1)  // no coupling
    w.write(0, 2)  // reserved
    w.write(0, 8)  // time config (unused)
    w.write(0, 8)  // submap floor
    w.write(0, 8)  // submap residue
    w.write(0, 6)  // mode count - 1
    w.write(0, 1)  // blockflag
    w.write(0, 16); w.write(0, 16) // window/transform type
    w.write(0, 8)  // mapping
    w.write(1, 1)  // framing
    val setup = Array[Byte](5, 'v', 'o', 'r', 'b', 'i', 's') ++ w.bytes
    (id, comment, setup)
  }

  /** One audio packet: flat max floor + the given residue digit
    * stream. `digits(k) ∈ {0,1,2}` maps to component (digits(k)−1)·Q
    * at spectral line k (length N2; lines ≥ `end` ignored). Partition
    * classes are derived: a partition with any nonzero digit is class
    * 1, else class 0 (zero residue, zero bits). */
  def audioPacket(digits: Array[Int]): Array[Byte] = {
    require(digits.length == N2)
    val w = new Vorbis.BitWriter
    w.write(0, 1) // audio packet
    // mode bits: ilog(modes-1) = ilog(0) = 0 bits
    // floor channel 0: nonzero, flat at the top
    w.write(1, 1)
    w.write(127, 7) // post 0
    w.write(127, 7) // post 1
    // class 0, cbits 0: two book-0 codewords for posts 2, 3 = value 0
    Vorbis.writeCodeword(w, floorCw(0)._1, floorCw(0)._2)
    Vorbis.writeCodeword(w, floorCw(0)._1, floorCw(0)._2)
    // residue type 2, mono: one inner vector of length N2
    val partSize = 16
    val partitions = N2 / partSize // 8
    val classes = Array.tabulate(partitions) { p =>
      if ((p * partSize until (p + 1) * partSize)
          .exists(k => digits(k) != 1)) 1 else 0
    }
    // pass 0: classwords = 2 → 4 classbook symbols, interleaved with
    // their partitions' vectors (the spec's decode order)
    var p = 0
    while (p < partitions) {
      if (p % 2 == 0) {
        val t = classes(p) * 2 + classes(p + 1)
        Vorbis.writeCodeword(w, classCw(t)._1, classCw(t)._2)
      }
      if (classes(p) == 1) {
        var v = 0
        while (v < partSize / 4) {
          val off = p * partSize + v * 4
          val e = partEntry(Array(digits(off), digits(off + 1),
            digits(off + 2), digits(off + 3)))
          Vorbis.writeCodeword(w, partCw(e)._1, partCw(e)._2)
          v += 1
        }
      }
      p += 1
    }
    w.bytes
  }

  /** Page a packet list into a complete single-stream Ogg (BOS page
    * for the id packet, EOS on the last; generic 255-lacing). */
  def oggStream(rate: Long, packets: Seq[Array[Byte]],
      granuleStep: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val serial = 0x00564221L
    def laces(p: Array[Byte]): Seq[Int] = {
      val full = Seq.fill(p.length / 255)(255)
      full :+ (p.length % 255)
    }
    out.write(Ogg.page(0x02, 0, serial, 0, laces(packets.head),
      packets.head))
    // headers 2..3 on page 1
    val hdr = packets.slice(1, 3)
    out.write(Ogg.page(0, 0, serial, 1,
      hdr.flatMap(laces), hdr.toArray.flatten.toArray))
    // audio packets: one page each
    var seq = 2L
    var granule = 0L
    packets.drop(3).zipWithIndex.foreach { case (p, i) =>
      granule += granuleStep
      val last = i == packets.length - 4
      out.write(Ogg.page(if (last) 0x04 else 0, granule, serial, seq,
        laces(p), p))
      seq += 1
    }
    out.toByteArray
  }

  /** STEREO profile (r16 — pins the square-polar coupling path): two
    * channels, one coupling step (magnitude = channel 0, angle =
    * channel 1), the same floor/books, residue type 2 over the
    * interleaved 2·N2 vector. */
  def stereoHeaders(rate: Long): (Array[Byte], Array[Byte], Array[Byte]) = {
    val id = Ogg.vorbisId(2, rate).clone()
    id(28) = 0x88.toByte
    val comment = Array[Byte](3, 'v', 'o', 'r', 'b', 'i', 's',
      0, 0, 0, 0, 0, 0, 0, 0, 1)
    val w = new Vorbis.BitWriter
    w.write(3 - 1, 8)
    writeScalarBook(w, 1, floorLengths)
    writeScalarBook(w, 2, classLengths)
    writePartBook(w)
    w.write(0, 6); w.write(0, 16) // time
    w.write(0, 6)  // floor count - 1
    w.write(1, 16) // floor type 1
    w.write(1, 5); w.write(0, 4)
    w.write(2 - 1, 3); w.write(0, 2); w.write(0 + 1, 8)
    w.write(2 - 1, 2); w.write(7, 4); w.write(42, 7); w.write(85, 7)
    w.write(0, 6)  // residue count - 1
    w.write(2, 16) // residue type 2
    w.write(0, 24)
    w.write(2 * N2, 24)   // end: the INTERLEAVED vector length
    w.write(16 - 1, 24)
    w.write(2 - 1, 6)
    w.write(1, 8)
    w.write(0, 3); w.write(0, 1)
    w.write(1, 3); w.write(0, 1)
    w.write(2, 8)
    w.write(0, 6)  // mapping count - 1
    w.write(0, 16) // mapping type 0
    w.write(0, 1)  // one submap
    w.write(1, 1)  // coupling present
    w.write(0, 8)  // steps - 1
    w.write(0, 1)  // magnitude = channel 0 (ilog(ch-1) = 1 bit)
    w.write(1, 1)  // angle = channel 1
    w.write(0, 2)  // reserved
    w.write(0, 8); w.write(0, 8); w.write(0, 8) // time/floor/residue
    w.write(0, 6)
    w.write(0, 1); w.write(0, 16); w.write(0, 16); w.write(0, 8)
    w.write(1, 1)
    val setup = Array[Byte](5, 'v', 'o', 'r', 'b', 'i', 's') ++ w.bytes
    (id, comment, setup)
  }

  /** One STEREO audio packet over the interleaved digit vector
    * (length 2·N2; even index = magnitude channel's line, odd = angle
    * channel's — the type-2 interleave order). Both channels carry
    * the flat max floor. */
  def stereoAudioPacket(digits: Array[Int]): Array[Byte] = {
    require(digits.length == 2 * N2)
    val w = new Vorbis.BitWriter
    w.write(0, 1)
    // floors, channel 0 then 1
    (0 until 2).foreach { _ =>
      w.write(1, 1)
      w.write(127, 7); w.write(127, 7)
      Vorbis.writeCodeword(w, floorCw(0)._1, floorCw(0)._2)
      Vorbis.writeCodeword(w, floorCw(0)._1, floorCw(0)._2)
    }
    val partSize = 16
    val partitions = 2 * N2 / partSize // 16
    val classes = Array.tabulate(partitions) { p =>
      if ((p * partSize until (p + 1) * partSize)
          .exists(k => digits(k) != 1)) 1 else 0
    }
    var p = 0
    while (p < partitions) {
      if (p % 2 == 0) {
        val t = classes(p) * 2 + classes(p + 1)
        Vorbis.writeCodeword(w, classCw(t)._1, classCw(t)._2)
      }
      if (classes(p) == 1) {
        var v = 0
        while (v < partSize / 4) {
          val off = p * partSize + v * 4
          val e = partEntry(Array(digits(off), digits(off + 1),
            digits(off + 2), digits(off + 3)))
          Vorbis.writeCodeword(w, partCw(e)._1, partCw(e)._2)
          v += 1
        }
      }
      p += 1
    }
    w.bytes
  }

  /** The seeded audio-packet sequence shared by BOTH container
    * fixtures (a few active partitions per packet, the rest silent
    * class-0) — same (rate, nPackets, seed) ⇒ same packet bytes, so
    * Ogg and WebM wrappings of one stream must decode identically. */
  def audioPackets(nPackets: Int, seed: Long): Seq[Array[Byte]] =
    (0 until nPackets).map { k =>
      val digits = Array.fill(N2)(1) // 1 = component 0
      var j = 0
      while (j < 12) {
        val pos = (((seed + k) * 131 + j * 47) % N2).toInt.abs
        digits(pos) = (((seed >> 3) + k + j) % 3).toInt.abs match {
          case 0 => 0
          case 1 => 2
          case _ => if (j % 2 == 0) 0 else 2
        }
        j += 1
      }
      audioPacket(digits)
    }

  /** Deterministic fixture stream: `nPackets` audio packets in real
    * Ogg pages. */
  def fixture(rate: Long, nPackets: Int, seed: Long): Array[Byte] = {
    val (id, comment, setup) = headers(rate)
    oggStream(rate, Seq(id, comment, setup) ++
      audioPackets(nPackets, seed), VorbisEnc.N2)
  }

  /** Matroska CodecPrivate carrying the three header packets,
    * Xiph-laced ([[Vorbis.xiphLacedPackets]]'s exact inverse). */
  def codecPrivate(rate: Long): Array[Byte] = {
    val (id, comment, setup) = headers(rate)
    val out = new java.io.ByteArrayOutputStream()
    out.write(2) // packet count - 1
    Seq(id, comment).foreach { p =>
      var rest = p.length
      while (rest >= 255) { out.write(255); rest -= 255 }
      out.write(rest)
    }
    out.write(id, 0, id.length)
    out.write(comment, 0, comment.length)
    out.write(setup, 0, setup.length)
    out.toByteArray
  }

  /** The WebM twin of [[fixture]]: the SAME audio packets for the
    * same (rate, nPackets, seed), muxed as an A_VORBIS track (headers
    * in CodecPrivate, packets as SimpleBlocks) beside the standard
    * pinned VP8 video sequence — the cross-container decode-equality
    * fixture. */
  def webmFixture(rate: Long, nPackets: Int, seed: Long): Array[Byte] = {
    val (w, h, frames) = Vp8Fixtures.interSeq
    Webm.build(w, h, frames, clusterEvery = 2,
      audio = Some(Webm.AudioMux("A_VORBIS", 1, rate.toInt,
        audioPackets(nPackets, seed), codecPrivate(rate))))
  }
}
