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
  * per-partition counts + driver-side prefix sums so ids are
  * `base(partition) + local offset`. Equivalent to
  * `row_number() OVER (ORDER BY key)` but the heavy data never leaves its
  * partition for a single-reducer sort.
  *
  * (r18 note: a materialize-the-sort + codegen-projection variant —
  * localCheckpoint, then `base(pid) + (monotonically_increasing_id() −
  * pid·2^33)` — was built and MEASURED WORSE on the prefix-doubling
  * consumer: suffix_maxrep 2.28 → 3.54 s, 75 → 81 jobs. The extra
  * materialization pass plus one more planned query per call cost more
  * than the re-run reduce-side sort and per-row boxing it removed —
  * the same trade the r17 quantilesExact rejection measured. The
  * zipWithIndex shape below is the keeper; its internal count job is
  * unrolled so the total is exposed to callers for free.)
  */
object Ids {

  /** Adds `idCol` = offset + rank of the row under `order` (0-based).
    * `order` must be a total order (include a unique tiebreaker). */
  def withDenseId(
      df: DataFrame,
      idCol: String,
      order: Seq[Column],
      offset: Long = 0L,
      numPartitions: Option[Int] = None): DataFrame =
    withDenseIdCounted(df, idCol, order, offset, numPartitions)._1

  /** [[withDenseId]] plus the input's row count. zipWithIndex already
    * ran a per-partition count job to compute its start indices but
    * kept the total private; this unrolled form (same jobs, same
    * ordering, same ids) hands the total to callers that would
    * otherwise pay a separate count/max job over the result — the
    * prefix-doubling dense-rank census (r18). */
  def withDenseIdCounted(
      df: DataFrame,
      idCol: String,
      order: Seq[Column],
      offset: Long = 0L,
      numPartitions: Option[Int] = None): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(math.max(1, df.rdd.getNumPartitions))
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema
    val rdd = sorted.rdd
    // one lightweight count job (exactly zipWithIndex's internal one);
    // the range-shuffle output is reused between the two passes
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().toMap
    val n = rdd.getNumPartitions
    val bases = new Array[Long](math.max(n, 1))
    var acc = offset
    var p = 0
    while (p < n) { bases(p) = acc; acc += counts.getOrElse(p, 0L); p += 1 }
    val total = acc - offset
    val withId = rdd.mapPartitionsWithIndex { (i, it) =>
      var k = bases(i) - 1L
      it.map { row => k += 1L; Row.fromSeq(row.toSeq :+ k) }
    }
    (spark.createDataFrame(withId,
      schema.add(idCol, LongType, nullable = false)), total)
  }
}
