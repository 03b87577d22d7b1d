package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Distribution statistics at scale. */
object Stats {

  /** Exact linear-interpolated quantiles (the `percentile_cont` /
    * DuckDB `quantile_cont` definition: value at rank p·(n−1),
    * interpolating between floor and ceil neighbors).
    *
    * Spark's builtin exact `percentile` aggregates a value→count map on
    * a single reducer — 5.7 s on 600 K rows and O(distinct values)
    * memory. This implementation is a parallel range-partitioned sort +
    * `zipWithIndex` (per-partition counts + driver prefix sums), then a
    * lookup of only the ≤ 2·|ps| boundary rows: no single-node
    * aggregation state anywhere, so it holds at any corpus size.
    *
    * Returns one row with a `q<percent>` double column per requested p.
    */
  def quantilesExact(
      df: DataFrame, valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val spark = df.sparkSession
    val sorted = df.select(col(valueCol).cast("double"))
      .filter(col(valueCol).isNotNull)
      .orderBy(valueCol)
      .rdd.map(_.getDouble(0))
      .zipWithIndex()
      .map { case (v, i) => (i, v) }
    sorted.cache()
    try {
      val n = sorted.count()
      require(n > 0, "quantilesExact on empty input")
      val idx: Set[Long] = ps.flatMap { p =>
        val pos = p * (n - 1)
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.toSet
      val boundary = sorted.filter { case (i, _) => idx.contains(i) }
        .collect().toMap
      val values = ps.map { p =>
        val pos = p * (n - 1)
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val frac = pos - lo
        boundary(lo) + frac * (boundary(hi) - boundary(lo))
      }
      // label by basis points when the percent isn't integral so e.g.
      // p=0.054 and p=0.046 can't both land on "q5"
      def label(p: Double): String = {
        val pct = p * 100
        if (pct == math.floor(pct)) s"q${pct.toInt}"
        else s"q${math.round(p * 10000)}bp"
      }
      val labels = ps.map(label)
      require(labels.distinct.size == labels.size,
        s"quantile labels collide: $labels — use more distinct percentiles")
      val schema = StructType(labels.map(l =>
        StructField(l, DoubleType, nullable = false)))
      spark.createDataFrame(
        java.util.List.of(Row.fromSeq(values)), schema)
    } finally sorted.unpersist(blocking = false)
  }
}
