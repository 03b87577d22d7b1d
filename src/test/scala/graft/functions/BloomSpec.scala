package graft.functions

import graft.SparkTestBase
import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Bloom filter over the portable mix: no false negatives ever, FP
  * rate in the analytic ballpark, OR-merge partition invariance, the
  * self-describing header, and the broadcast filter shape. */
class BloomSpec extends SparkTestBase {

  private val P = 1000000007L
  private def mix(i: Long): Long = {
    val h0 = (i % P) * 2654435761L % P
    val h1 = (h0 ^ (h0 >>> 16)) * 73244475L % P
    (h1 ^ (h1 >>> 16)) * 73244475L % P
  }

  test("members are ALWAYS found (no false negatives), FP rate lands " +
    "near (1 - e^(-kn/m))^k") {
    val buf = new BloomBuffer(4096, 3)
    (0L until 300L).foreach(i => buf.add(mix(i)))
    val ser = buf.serialized
    (0L until 300L).foreach { i =>
      assert(BloomContains.test(ser, mix(i)) == java.lang.Boolean.TRUE, i)
    }
    val fps = (10000L until 30000L).count(i =>
      BloomContains.test(ser, mix(i)) == java.lang.Boolean.TRUE)
    val rate = fps / 20000.0
    // analytic FP ~ (1 - e^(-3*300/4096))^3 ~ 0.0076
    assert(rate < 0.03, s"fp rate $rate")
  }

  test("filters compose: OR-merging two halves equals the whole") {
    def build(ids: Seq[Long]): BloomBuffer = {
      val b = new BloomBuffer(1024, 3)
      ids.foreach(i => b.add(mix(i)))
      b
    }
    val l = build(0L until 100L)
    val r = build(50L until 200L)
    var i = 0
    while (i < l.bits.length) {
      l.bits(i) = (l.bits(i) | r.bits(i)).toByte
      i += 1
    }
    assert(java.util.Arrays.equals(l.bits, build(0L until 200L).bits))
  }

  test("the SQL aggregate is partition-invariant and the broadcast " +
    "filter shape finds every member") {
    graft.Graft.init(spark)
    def filterOf(parts: Int): Array[Byte] =
      spark.range(500).toDF("v").repartition(parts)
        .withColumn("h", Sampling.portableMix(col("v")))
        .selectExpr("bloom_build(h, 8192, 4) AS bf").head().getAs[Array[Byte]](0)
    val a = filterOf(1)
    val b = filterOf(11)
    assert(java.util.Arrays.equals(a, b))
    val bench = spark.range(500).toDF("v")
      .withColumn("h", Sampling.portableMix(col("v")))
      .agg(expr("bloom_build(h, 8192, 4)").as("bf"))
    val hits = spark.range(2000).toDF("v")
      .withColumn("h", Sampling.portableMix(col("v")))
      .crossJoin(broadcast(bench))
      .selectExpr("v", "bloom_contains(bf, h) AS hit")
    // every true member hits; the non-member band shows only FPs
    assert(hits.filter("v < 500 AND NOT hit").count() == 0)
    val fp = hits.filter("v >= 500 AND hit").count()
    assert(fp < 150, s"fp=$fp") // ~2.4% of 1500 expected
  }

  test("malformed filter bytes yield null, not a throw; bad literals " +
    "are rejected") {
    assert(BloomContains.test(null, 1L) == null)
    assert(BloomContains.test(Array[Byte](1, 2, 3), 1L) == null)
    val good = new BloomBuffer(64, 2).serialized
    assert(BloomContains.test(good.dropRight(1), 1L) == null) // short body
    val badM = good.clone(); badM(3) = 65 // m=65 not a multiple of 8
    assert(BloomContains.test(badM, 1L) == null)
    graft.Graft.init(spark)
    intercept[Exception] {
      spark.range(5).toDF("v")
        .selectExpr("bloom_build(CAST(v AS BIGINT), 100, 3)").collect()
    } // m not a power of two
  }
}
