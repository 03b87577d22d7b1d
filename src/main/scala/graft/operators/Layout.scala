package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

import graft.functions.ZValue

/** Multi-dimensional data layout — the `OPTIMIZE ZORDER BY` step of
  * lakehouse table maintenance (Delta, Iceberg, Hudi all ship it):
  * cluster rows by the Morton interleave of two filter columns so
  * every output file carries a SMALL min/max bounding box in both,
  * and scans filtering on either column (or both) skip most files.
  * A single-column sort gives perfect pruning on one dimension and
  * none on the other; the Z-curve trades a little of each for a lot
  * of both — [[zorderStats]] MEASURES that trade on the actual data
  * (per-bucket bounding boxes under Z-layout), which is how the
  * clustering column choice gets justified instead of guessed.
  *
  * Shape at 100 TB: the z-key is a codegen'd per-row expression
  * ([[ZValue]]); the (zmin, zmax) normalizer is one aggregate row;
  * bucketing is fixed-width arithmetic on the key (deterministic —
  * no sampled range partitioner, so layout and oracle agree
  * run-to-run); the real write is `repartition(buckets, bucket)` +
  * local sort, one shuffle. Stats are one groupBy(bucket) with
  * min/max partials. */
object Layout {

  /** The Morton key column (null for out-of-domain inputs). */
  def zValue(x: Column, y: Column): Column =
    Shim.column(ZValue(Shim.expression(x), Shim.expression(y)))

  /** Rows with `bucket` ∈ [0, buckets) assigned by fixed-width
    * ranges of the z-key — the deterministic stand-in for a sampled
    * range partitioner (same bucket for the same row on every run
    * and every engine). Out-of-domain rows (negative / > 21 bits)
    * are dropped. */
  def zorderBuckets(
      df: DataFrame,
      xCol: String,
      yCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val z = df
      .withColumn("__z", zValue(col(xCol).cast("long"), col(yCol).cast("long")))
      .filter(col("__z").isNotNull)
    val mm = z.agg(min("__z").as("__zmin"), max("__z").as("__zmax"))
    z.crossJoin(broadcast(mm))
      // integer `div`, not floating `/`: the key reaches 2^42 and the
      // oracle's BIGINT // must agree bit-for-bit at every boundary
      .withColumn("bucket",
        expr(s"((__z - __zmin) * ${buckets}L) div (__zmax - __zmin + 1L)"))
      .drop("__z", "__zmin", "__zmax")
  }

  /** Per-bucket bounding boxes of the Z-layout: (bucket, n_rows,
    * x_min, x_max, y_min, y_max) — the min/max stats a file-skipping
    * scan would consult, measured instead of assumed. */
  def zorderStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      buckets: Int): DataFrame =
    zorderBuckets(df, xCol, yCol, buckets)
      .groupBy("bucket")
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(col(xCol).cast("long")).as("x_min"),
        max(col(xCol).cast("long")).as("x_max"),
        min(col(yCol).cast("long")).as("y_min"),
        max(col(yCol).cast("long")).as("y_max"))
}
