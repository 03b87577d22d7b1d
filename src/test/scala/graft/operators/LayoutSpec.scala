package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Z-order layout: the interleave kernel against a bit-by-bit
  * reference, locality (Z-buckets beat row-order buckets on the
  * second dimension), determinism, and the out-of-domain contract. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def refInterleave(x: Long, y: Long): Long =
    (0 until 21).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("z_value matches the bit-by-bit reference and known points") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
      (12345L, 67890L), ((1L << 21) - 1, (1L << 21) - 1))
    val got = pts.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    got.zip(pts).foreach { case (z, (x, y)) =>
      assert(z == refInterleave(x, y), s"($x, $y)")
    }
    assert(got.take(4).toSeq == Seq(0L, 1L, 2L, 3L)) // the unit square
  }

  test("out-of-domain inputs null out and drop from the layout") {
    val df = Seq((-1L, 5L), (5L, 1L << 22), (3L, 4L)).toDF("x", "y")
    val z = df.select(Layout.zValue(col("x"), col("y")).as("z")).collect()
    assert(z(0).isNullAt(0) && z(1).isNullAt(0) && !z(2).isNullAt(0))
    assert(Layout.zorderBuckets(df, "x", "y", 4).count() == 1)
  }

  test("Z-buckets carry small bounding boxes in BOTH dimensions — " +
    "row-order bucketing only bounds the leading one") {
    // grid: x sequential, y decorrelated
    val pts = (0L until 4096L).map(i => (i, (i * 2654435761L) % 4096L))
    val df = pts.toDF("x", "y")
    val zStats = Layout.zorderStats(df, "x", "y", 16)
      .collect().map(r => (r.getLong(3) - r.getLong(2),
        r.getLong(5) - r.getLong(4)))
    val zMeanY = zStats.map(_._2).sum.toDouble / zStats.length
    // row-order baseline: bucket by x ranges
    val rowStats = df.withColumn("bucket", floor(col("x") * 16 / 4096))
      .groupBy("bucket").agg(max("y") - min("y")).collect()
      .map(_.getLong(1))
    val rowMeanY = rowStats.sum.toDouble / rowStats.length
    assert(zMeanY < rowMeanY * 0.7,
      s"z mean y-span $zMeanY vs row-order $rowMeanY")
    // and x stays bounded too (not a y-only sort)
    val zMeanX = zStats.map(_._1).sum.toDouble / zStats.length
    assert(zMeanX < 4096 * 0.6, s"z mean x-span $zMeanX")
  }

  test("bucketing is deterministic across runs") {
    val df = (0L until 500L).map(i => (i, (i * 37L) % 500L)).toDF("x", "y")
    val a = Layout.zorderBuckets(df, "x", "y", 8)
      .select("x", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1))
    val b = Layout.zorderBuckets(df, "x", "y", 8)
      .select("x", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a.toMap == b.toMap)
    assert(a.map(_._2).distinct.length > 1)
  }
}
