package graft.operators

/** Parquet footer triage — dataset repositories ship parquet, so a
  * crawl of them meets parquet BLOBS in a binary column long before
  * anything mounts them as tables. Triage (schema, row counts, row
  * groups, writer) needs only the footer: the file tail is a 4-byte
  * little-endian metadata length + `PAR1`, and the metadata is a
  * Thrift COMPACT-protocol `FileMetaData` struct.
  *
  * This is a real compact-protocol decoder, not a sniff:
  *
  *  - varints (ULEB128) and zigzag i16/i32/i64;
  *  - struct field headers (`delta<<4 | type`, long-form ids via
  *    zigzag i16), booleans-in-header, doubles, binaries;
  *  - list/set/map headers with the 0xF long-size escape;
  *  - a generic recursive skipper (depth-capped) so fields this
  *    subset doesn't model — column chunks, statistics, encodings,
  *    new additions — are walked structurally, never by guess.
  *
  * Extracted: version, num_rows, row-group count + summed
  * total_byte_size, created_by, and the schema field names in
  * depth-first order (root excluded). The spec's conformance check
  * parses footers WRITTEN BY SPARK's parquet-mr and cross-checks
  * against what the DataFrame reader reports. Dirty bytes → None. */
object ParquetMeta {

  final case class Meta(version: Int, numRows: Long, rowGroups: Int,
      totalByteSize: Long, createdBy: String, fields: Vector[String])

  private val MaxDepth = 24
  private final class Bad extends RuntimeException

  private final class In(val b: Array[Byte], var pos: Int, val end: Int) {
    def u8(): Int = {
      if (pos >= end) throw new Bad
      val v = b(pos) & 0xff
      pos += 1
      v
    }
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var going = true
      while (going) {
        val c = u8()
        v |= (c & 0x7fL) << shift
        shift += 7
        if (shift > 70) throw new Bad
        going = (c & 0x80) != 0
      }
      v
    }
    def zigzag(): Long = {
      val v = varint()
      (v >>> 1) ^ -(v & 1)
    }
    def binary(): Array[Byte] = {
      val n = varint()
      if (n < 0 || pos + n > end) throw new Bad
      val out = java.util.Arrays.copyOfRange(b, pos, (pos + n).toInt)
      pos += n.toInt
      out
    }
    def skipBytes(n: Int): Unit = {
      if (pos + n > end) throw new Bad
      pos += n
    }
  }

  // compact-protocol type codes
  private val STOP = 0
  private val TRUE = 1
  private val FALSE = 2
  private val BYTE = 3
  private val I16 = 4
  private val I32 = 5
  private val I64 = 6
  private val DOUBLE = 7
  private val BINARY = 8
  private val LIST = 9
  private val SET = 10
  private val MAP = 11
  private val STRUCT = 12

  /** Skip one value of `typ` (list-element context: bools are one
    * byte here, unlike in field headers). */
  private def skip(in: In, typ: Int, depth: Int): Unit = {
    if (depth > MaxDepth) throw new Bad
    typ match {
      case TRUE | FALSE | BYTE => in.skipBytes(1)
      case I16 | I32 | I64 => in.varint(); ()
      case DOUBLE => in.skipBytes(8)
      case BINARY => in.binary(); ()
      case LIST | SET =>
        val (n, et) = listHeader(in)
        var i = 0L
        while (i < n) { skip(in, et, depth + 1); i += 1 }
      case MAP =>
        val n = in.varint()
        if (n > 0) {
          val kv = in.u8()
          val kt = (kv >> 4) & 0xf
          val vt = kv & 0xf
          var i = 0L
          while (i < n) {
            skip(in, kt, depth + 1); skip(in, vt, depth + 1)
            i += 1
          }
        }
      case STRUCT => skipStruct(in, depth + 1)
      case _ => throw new Bad
    }
  }

  private def skipStruct(in: In, depth: Int): Unit = {
    if (depth > MaxDepth) throw new Bad
    var going = true
    while (going) {
      val h = in.u8()
      if (h == STOP) going = false
      else {
        val typ = h & 0xf
        if ((h >> 4) == 0) { in.zigzag(); () } // long-form field id
        // header-encoded bools carry no payload
        if (typ != TRUE && typ != FALSE) skip(in, typ, depth)
      }
    }
  }

  private def listHeader(in: In): (Long, Int) = {
    val h = in.u8()
    val et = h & 0xf
    val short = (h >> 4) & 0xf
    val n = if (short == 0xf) in.varint() else short.toLong
    if (n < 0 || n > (1 << 24)) throw new Bad
    (n, et)
  }

  /** Iterate a struct's fields, calling `f(fieldId, type)` positioned
    * at the VALUE; `f` must consume it (or call `skip`). */
  private def readStruct(in: In, depth: Int)(f: (Int, Int) => Unit): Unit = {
    if (depth > MaxDepth) throw new Bad
    var id = 0
    var going = true
    while (going) {
      val h = in.u8()
      if (h == STOP) going = false
      else {
        val typ = h & 0xf
        val delta = (h >> 4) & 0xf
        id = if (delta == 0) in.zigzag().toInt else id + delta
        f(id, typ)
      }
    }
  }

  def parse(bytes: Array[Byte]): Option[Meta] = {
    try {
      if (bytes == null || bytes.length < 12) return None
      val n = bytes.length
      if (!(bytes(0) == 'P' && bytes(1) == 'A' && bytes(2) == 'R' &&
        bytes(3) == '1' && bytes(n - 4) == 'P' && bytes(n - 3) == 'A' &&
        bytes(n - 2) == 'R' && bytes(n - 1) == '1')) return None
      val metaLen = (bytes(n - 8) & 0xff) | ((bytes(n - 7) & 0xff) << 8) |
        ((bytes(n - 6) & 0xff) << 16) | ((bytes(n - 5) & 0xff) << 24)
      if (metaLen <= 0 || metaLen > n - 12) return None
      val in = new In(bytes, n - 8 - metaLen, n - 8)
      var version = 0
      var numRows = 0L
      var rowGroups = 0
      var totalBytes = 0L
      var createdBy = ""
      val fields = Vector.newBuilder[String]
      readStruct(in, 0) { (id, typ) =>
        (id, typ) match {
          case (1, I32) => version = in.zigzag().toInt
          case (2, LIST) => // schema elements, depth-first; skip root
            val (cnt, et) = listHeader(in)
            if (et != STRUCT) throw new Bad
            var i = 0L
            while (i < cnt) {
              var name: String = null
              readStruct(in, 1) { (fid, ftyp) =>
                (fid, ftyp) match {
                  case (4, BINARY) => name = new String(in.binary(), "UTF-8")
                  case _ => if (ftyp != TRUE && ftyp != FALSE)
                    skip(in, ftyp, 1)
                }
              }
              if (name == null) throw new Bad
              if (i > 0) fields += name // element 0 is the root
              i += 1
            }
          case (3, I64) => numRows = in.zigzag()
          case (4, LIST) => // row groups
            val (cnt, et) = listHeader(in)
            if (et != STRUCT) throw new Bad
            var i = 0L
            while (i < cnt) {
              readStruct(in, 1) { (fid, ftyp) =>
                (fid, ftyp) match {
                  case (2, I64) => totalBytes += in.zigzag()
                  case _ => if (ftyp != TRUE && ftyp != FALSE)
                    skip(in, ftyp, 1)
                }
              }
              rowGroups += 1
              i += 1
            }
          case (6, BINARY) => createdBy = new String(in.binary(), "UTF-8")
          case _ => if (typ != TRUE && typ != FALSE) skip(in, typ, 0)
        }
      }
      if (version == 0 && numRows == 0 && rowGroups == 0) return None
      Some(Meta(version, numRows, rowGroups, totalBytes, createdBy,
        fields.result()))
    } catch { case _: Exception => None }
  }

  // ---------------------------------------------------------------- writer

  private final class Out {
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { u8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      u8(v.toInt)
    }
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    def binary(b: Array[Byte]): Unit = { varint(b.length.toLong); bos.write(b, 0, b.length) }
    def fieldHeader(delta: Int, typ: Int): Unit = {
      require(delta >= 1 && delta <= 15)
      u8((delta << 4) | typ)
    }
    def listHeader(n: Int, et: Int): Unit =
      if (n < 15) u8((n << 4) | et)
      else { u8(0xf0 | et); varint(n.toLong) }
    def stop(): Unit = u8(0)
  }

  /** A minimal-but-real parquet file: `PAR1`, filler, a compact-
    * protocol FileMetaData footer (schema root + named i64 fields,
    * row groups with byte sizes), the length word, `PAR1`. */
  def parquet(version: Int, numRows: Long, fieldNames: Seq[String],
      rowGroupBytes: Seq[Long], createdBy: String): Array[Byte] = {
    val o = new Out
    // field 1: version (i32)
    o.fieldHeader(1, I32); o.zigzag(version.toLong)
    // field 2: schema list<struct>
    o.fieldHeader(1, LIST)
    o.listHeader(1 + fieldNames.length, STRUCT)
    // root: name (4), num_children (5)
    o.fieldHeader(4, BINARY); o.binary("schema".getBytes("UTF-8"))
    o.fieldHeader(1, I32); o.zigzag(fieldNames.length.toLong)
    o.stop()
    fieldNames.foreach { fn =>
      // type (1) = INT64 (enum 2), repetition (3) = optional (1),
      // name (4)
      o.fieldHeader(1, I32); o.zigzag(2L)
      o.fieldHeader(2, I32); o.zigzag(1L)
      o.fieldHeader(1, BINARY); o.binary(fn.getBytes("UTF-8"))
      o.stop()
    }
    // field 3: num_rows (i64)
    o.fieldHeader(1, I64); o.zigzag(numRows)
    // field 4: row_groups list<struct>
    o.fieldHeader(1, LIST)
    o.listHeader(rowGroupBytes.length, STRUCT)
    rowGroupBytes.foreach { sz =>
      // columns (1) = empty list<struct>, total_byte_size (2),
      // num_rows (3)
      o.fieldHeader(1, LIST); o.listHeader(0, STRUCT)
      o.fieldHeader(1, I64); o.zigzag(sz)
      o.fieldHeader(1, I64); o.zigzag(numRows)
      o.stop()
    }
    // field 6: created_by (delta 2 from field 4)
    o.fieldHeader(2, BINARY); o.binary(createdBy.getBytes("UTF-8"))
    o.stop()
    val meta = o.bos.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("PAR1".getBytes("US-ASCII"))
    out.write(new Array[Byte](4)) // filler "data"
    out.write(meta, 0, meta.length)
    out.write(meta.length & 0xff); out.write((meta.length >> 8) & 0xff)
    out.write((meta.length >> 16) & 0xff); out.write((meta.length >> 24) & 0xff)
    out.write("PAR1".getBytes("US-ASCII"))
    out.toByteArray
  }
}
