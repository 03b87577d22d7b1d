package graft.operators

/** Content-defined chunking (gear rolling hash, the FastCDC family)
  * — the dedup primitive for OPAQUE binary columns: archives, model
  * checkpoints, media, crawl payloads. Fixed-size blocking breaks on
  * a single inserted byte; a content-defined boundary resynchronizes
  * within one window, so shared substrings chunk identically across
  * blobs and a hash-keyed groupBy finds them.
  *
  * The rolling hash is the gear construction: `h = (h << 1) + G(b)`
  * over a public 256-entry table derived from splitmix64 — h is a
  * sliding ~64-byte window (older bytes shift out), and a boundary
  * fires when `(h & (avg-1)) == 0` after `min` bytes, forced at
  * `max`. Chunk identity is xxhash64 of the content (seed 42 — the
  * same function/seed as Spark SQL's `xxhash64`, so engine-side and
  * SQL-side chunk ids agree).
  *
  * 100 TB design: chunking is a per-row map riding the scan; dedup
  * is ONE shuffle keyed by chunk hash (first-occurrence-keeps). The
  * chunk table is bytes/avg rows — itself partitionable by hash.
  * The oracle trusts NO hashes: it re-derives every dedup verdict
  * from actual chunk bytes (blob slices in SQL) and gates the
  * geometry by re-measuring blob lengths. */
object Cdc {

  /** splitmix64 — the public PRNG finalizer; fixed constants. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The gear table: G(b) = splitmix64(b) — deterministic, engine-
    * independent, reproducible from this one line. */
  val Gear: Array[Long] = Array.tabulate(256)(b => splitmix64(b.toLong))

  final case class Chunk(offset: Int, length: Int, hash: Long)

  /** Gear-CDC chunk boundaries + content hashes. `avgSize` must be a
    * power of two (the boundary mask); every chunk length is in
    * [minSize, maxSize] except a shorter final tail. Empty/null in →
    * empty out. */
  def chunks(bytes: Array[Byte], minSize: Int, avgSize: Int,
      maxSize: Int): Array[Chunk] = {
    require(Integer.bitCount(avgSize) == 1,
      s"avgSize must be a power of two, got $avgSize")
    require(minSize >= 1 && minSize <= avgSize && avgSize <= maxSize,
      s"need 1 <= min <= avg <= max, got $minSize/$avgSize/$maxSize")
    if (bytes == null || bytes.isEmpty) return Array.empty
    val mask = (avgSize - 1).toLong
    val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize) {
        out += Chunk(start, len, contentHash(bytes, start, len))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length)
      out += Chunk(start, bytes.length - start,
        contentHash(bytes, start, bytes.length - start))
    out.toArray
  }

  /** xxhash64(content, seed 42) — byte-compatible with Spark SQL's
    * `xxhash64` over the same bytes. */
  def contentHash(bytes: Array[Byte], offset: Int, len: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + offset,
      len, 42L)
}
