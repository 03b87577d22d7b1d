package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dense, deterministic row-id assignment at scale.
  *
  * The reference assigns docids from a per-row mutable counter
  * (`config["offset"]`, weaviate.py:67,149) — inherently single-writer.
  * The naive Spark port (`row_number().over(Window.orderBy(...))`) funnels
  * every row through ONE partition: a non-starter at 100 TB.
  *
  * This implementation keeps ids dense AND deterministic without a global
  * sort bottleneck: range-repartition + sort within partitions by the
  * caller's key (deterministic total order, parallel sort), then
  * per-partition counts + driver-side prefix sums (`zipWithIndex`) so ids
  * are `base(partition) + local offset`. Equivalent to
  * `row_number() OVER (ORDER BY key)` but the heavy data never leaves its
  * partition for a single-reducer sort.
  */
object Ids {

  /** Adds `idCol` = offset + rank of the row under `order` (0-based).
    * `order` must be a total order (include a unique tiebreaker). */
  def withDenseId(
      df: DataFrame,
      idCol: String,
      order: Seq[Column],
      offset: Long = 0L,
      numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(math.max(1, df.rdd.getNumPartitions))
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema
    // zipWithIndex = one lightweight count job + per-partition base offsets;
    // the range-shuffle output is reused between the two passes.
    val withId = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + offset))
    }
    spark.createDataFrame(withId, schema.add(idCol, LongType, nullable = false))
  }
}
