package graft.functions

import graft.SparkTestBase
import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** HyperLogLog distinct sketch over the portable mix: estimator
  * accuracy, both correction regimes, partition invariance (the
  * mergeability that makes it a sketch), and the register file
  * checked against an independent recompute. */
class HllSpec extends SparkTestBase {

  private def sketch(df: org.apache.spark.sql.DataFrame, b: Int) = {
    graft.Graft.init(spark)
    df.withColumn("h", Sampling.portableMix(col("v")))
      .selectExpr(s"hll_distinct(h, $b) AS sk")
      .selectExpr("sk.n_distinct", "sk.corrected").head()
  }

  test("the estimate lands within 3 standard errors on 50k distinct " +
    "(sigma = 1.04/sqrt(m)); duplicates don't move it") {
    val df = spark.range(50000).toDF("v")
    val row = sketch(df, 8)
    assert(!row.getBoolean(1))
    val est = row.getLong(0).toDouble
    assert(math.abs(est - 50000) / 50000 < 3 * 1.04 / 16, s"est=$est")
    // every row duplicated: identical sketch
    val dup = sketch(df.union(df).union(df), 8)
    assert(dup.getLong(0) == row.getLong(0))
  }

  test("small cardinalities fall into the linear-counting branch and " +
    "land near-exact") {
    val row = sketch(spark.range(40).toDF("v"), 8)
    assert(row.getBoolean(1), "expected the corrected regime")
    assert(math.abs(row.getLong(0) - 40L) <= 3, s"est=${row.getLong(0)}")
  }

  test("partition-invariant: 1 vs 13 partitions produce the identical " +
    "estimate (max-merge associativity)") {
    val df = spark.range(30000).toDF("v")
    val a = sketch(df.repartition(1), 8).getLong(0)
    val c = sketch(df.repartition(13), 8).getLong(0)
    assert(a == c)
  }

  test("the register file equals an independent recompute of " +
    "bucket/rho/max over the same hashes") {
    val hashes = (0L until 5000L).map { i =>
      // the Scala-side portable mix, re-derived here independently
      val P = 1000000007L
      val h0 = (i % P) * 2654435761L % P
      val h1 = (h0 ^ (h0 >>> 16)) * 73244475L % P
      (h1 ^ (h1 >>> 16)) * 73244475L % P
    }
    val buf = new HllBuffer(8)
    hashes.foreach(buf.add(_, 22))
    val expected = new Array[Byte](256)
    hashes.foreach { h =>
      val bucket = (h % 256).toInt
      val w = h / 256
      val rho = if (w == 0) 23 else 22 - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > expected(bucket)) expected(bucket) = rho.toByte
    }
    assert(java.util.Arrays.equals(buf.regs, expected))
    // and the engine's estimate over the same ids agrees with a
    // direct evaluation of the formula on these registers
    val m = 256
    var intSum = 0L; var zeros = 0
    expected.foreach { mj =>
      intSum += 1L << (23 - mj); if (mj == 0) zeros += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m * math.pow(2.0, 23) / intSum
    val est = if (raw <= 2.5 * m && zeros > 0)
      m * math.log(m.toDouble / zeros) else raw
    val engine = sketch(spark.range(5000).toDF("v"), 8).getLong(0)
    assert(engine == math.round(est))
  }

  test("sketches compose: max-merging two halves' buffers equals the " +
    "whole corpus' buffer") {
    def bufOf(ids: Seq[Long]): HllBuffer = {
      val b = new HllBuffer(8)
      val P = 1000000007L
      ids.foreach { i =>
        val h0 = (i % P) * 2654435761L % P
        val h1 = (h0 ^ (h0 >>> 16)) * 73244475L % P
        b.add((h1 ^ (h1 >>> 16)) * 73244475L % P, 22)
      }
      b
    }
    val left = bufOf(0L until 3000L)
    val right = bufOf(1500L until 6000L) // overlapping halves
    left.merge(right)
    assert(java.util.Arrays.equals(left.regs, bufOf(0L until 6000L).regs))
  }

  test("b outside [7, 16] and non-bigint hashes are rejected") {
    graft.Graft.init(spark)
    intercept[Exception] {
      spark.range(10).toDF("v")
        .selectExpr("hll_distinct(CAST(v AS BIGINT), 3) AS sk").collect()
    }
    intercept[Exception] {
      spark.range(10).toDF("v")
        .selectExpr("hll_distinct(CAST(v AS STRING), 8) AS sk").collect()
    }
  }
}
