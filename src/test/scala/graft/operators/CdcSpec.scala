package graft.operators

import graft.SparkTestBase

/** Gear CDC: tiling/size invariants, the boundary rule re-derived
  * brute-force, the resynchronization property that makes CDC dedup
  * work, real cross-blob sharing on the fixture pool, and hash
  * compatibility with Spark SQL's xxhash64. */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def blobOf(seed: Long, n: Int): Array[Byte] =
    Array.tabulate[Byte](n)(i =>
      ((i * 31 + seed * 97 + (i * i) % 89) % 251).toByte)

  test("chunks tile the blob; sizes respect [min, max] with only a " +
    "shorter tail; every interior cut satisfies the gear rule") {
    val bytes = blobOf(5L, 7000)
    val min = 64; val avg = 256; val max = 1024
    val cs = Cdc.chunks(bytes, min, avg, max)
    assert(cs.head.offset == 0)
    cs.sliding(2).foreach {
      case Array(a, b) => assert(a.offset + a.length == b.offset)
      case _ =>
    }
    assert(cs.map(_.length).sum == bytes.length)
    cs.dropRight(1).foreach(c =>
      assert(c.length >= min && c.length <= max, c))
    assert(cs.last.length <= max)
    // re-derive each interior boundary decision from the raw rule
    val mask = (avg - 1).toLong
    cs.dropRight(1).foreach { c =>
      var h = 0L
      var i = c.offset
      while (i < c.offset + c.length) {
        h = (h << 1) + Cdc.Gear(bytes(i) & 0xff)
        i += 1
      }
      assert((h & mask) == 0L || c.length == max,
        s"cut at ${c.offset + c.length} satisfies neither rule")
    }
  }

  test("resynchronization: content shifted by an insertion re-aligns " +
    "— the property fixed-size blocking lacks") {
    val base = blobOf(9L, 9000)
    val shifted = Array[Byte](1, 2, 3, 4, 5, 6, 7) ++ base
    val a = Cdc.chunks(base, 64, 256, 1024).map(_.hash).toSet
    val b = Cdc.chunks(shifted, 64, 256, 1024).map(_.hash)
    // most chunks of the shifted blob match the original exactly
    val shared = b.count(a.contains)
    assert(shared >= b.length - 3,
      s"only $shared/${b.length} chunks resynchronized")
  }

  test("fixture blobs share chunks across docs (the pool makes the " +
    "dedup real), and chunking is deterministic") {
    val c3 = Cdc.chunks(MediaFixtures.cdcMediaFor(3L), 64, 256, 1024)
    val c20 = Cdc.chunks(MediaFixtures.cdcMediaFor(20L), 64, 256, 1024)
    // ids 3 and 20: pools {9,14,2,7,(12)} and {9,14,2,7,(12,0)} overlap
    val shared = c20.map(_.hash).toSet intersect c3.map(_.hash).toSet
    assert(shared.nonEmpty, "no cross-doc chunk sharing")
    val again = Cdc.chunks(MediaFixtures.cdcMediaFor(3L), 64, 256, 1024)
    assert(c3.toSeq == again.toSeq)
    assert(Cdc.chunks(Array.emptyByteArray, 64, 256, 1024).isEmpty)
    assert(Cdc.chunks(null, 64, 256, 1024).isEmpty)
  }

  test("chunk identity IS Spark SQL xxhash64 over the same bytes") {
    val bytes = blobOf(2L, 500)
    val cs = Cdc.chunks(bytes, 64, 256, 1024)
    val slices = cs.map(c =>
      java.util.Arrays.copyOfRange(bytes, c.offset, c.offset + c.length))
    val sql = slices.toSeq.toDF("b")
      .selectExpr("xxhash64(b) AS h").collect().map(_.getLong(0))
    assert(sql.toSeq == cs.map(_.hash).toSeq)
  }
}
