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

  private[operators] def quantileLabel(p: Double): String = {
    val pct = p * 100
    if (pct == math.floor(pct)) s"q${pct.toInt}"
    else s"q${math.round(p * 10000)}bp"
  }

  /** Exact per-GROUP quantiles, same `quantile_cont` interpolation as
    * [[quantilesExact]]: one window sort within each group (the
    * irreducible cost of exact grouped quantiles — a per-key sort
    * through one shuffle, the same bound as any grouped sort) plus one
    * hash aggregation that keeps only the two boundary rows per
    * requested p. No driver-side state, no per-group collect; group
    * count and interpolation run as column arithmetic.
    *
    * Parallelism regime: with FEW huge groups the window partition
    * count equals the group count (3 groups = 3 sort tasks, whatever
    * the cluster size) — use [[groupedQuantilesSorted]] there (parallel
    * range sort, bit-identical results). With many groups — the common
    * case for per-language/per-source corpus stats — the window
    * spreads naturally and this plan is the right one.
    *
    * Output: keyCols + one `q<percent>` double column per p. */
  def groupedQuantiles(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(keyCols.nonEmpty && ps.nonEmpty &&
      ps.forall(p => p >= 0.0 && p <= 1.0))
    val labels = ps.map(quantileLabel)
    require(labels.distinct.size == labels.size,
      s"quantile labels collide: $labels — use more distinct percentiles")
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val values = df
      .select(keys :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
    // group sizes via a small aggregate instead of a second
    // full-partition window pass (a frameless count().over(partition)
    // buffers every row again in WindowExec). No broadcast hint: AQE
    // broadcasts when #groups is small and falls back to a co-located
    // join otherwise — the window output is already hash-partitioned
    // on the keys, so the big side never reshuffles.
    val counts = values.groupBy(keyCols.head, keyCols.tail: _*)
      .agg(count(lit(1)).cast("double").as("__n"))
    val ranked = values
      .withColumn("__rn", row_number().over(w).cast("double") - 1)
      .join(counts, keyCols)
    val posOf = ps.map(p => (col("__n") - 1) * p)
    val aggs = ps.indices.flatMap { i =>
      Seq(
        max(when(col("__rn") === floor(posOf(i)), col("__v")))
          .as(s"__lo$i"),
        max(when(col("__rn") === ceil(posOf(i)), col("__v")))
          .as(s"__hi$i"))
    } :+ max("__n").as("__gn")
    val out = ps.indices.map { i =>
      val pos = (col("__gn") - 1) * ps(i)
      val frac = pos - floor(pos)
      (col(s"__lo$i") + frac * (col(s"__hi$i") - col(s"__lo$i")))
        .as(labels(i))
    }
    ranked.groupBy(keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keys ++ out: _*)
  }

  /** [[groupedQuantiles]] for the FEW-HUGE-GROUPS regime, where the
    * window plan degrades to one sort task per group: this is
    * [[quantilesExact]]'s construction generalized per key — a
    * range-partitioned PARALLEL sort over (key, value) (every core
    * sorts a slice regardless of group count), per-partition per-key
    * counts + driver prefix sums (the `Ids.withDenseId` pattern, tiny:
    * partitions × groups entries), then a second pass that emits ONLY
    * the ≤ 2·|ps| boundary rows per group. Same `quantile_cont`
    * interpolation, bit-identical results to [[groupedQuantiles]]
    * (spec-enforced). Driver state is O(groups), so this variant
    * assumes group count is modest (its design regime). */
  def groupedQuantilesSorted(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      ps: Seq[Double],
      maxGroups: Int = 100000): DataFrame = {
    require(keyCols.nonEmpty && ps.nonEmpty &&
      ps.forall(p => p >= 0.0 && p <= 1.0))
    val labels = ps.map(quantileLabel)
    require(labels.distinct.size == labels.size,
      s"quantile labels collide: $labels — use more distinct percentiles")
    val spark = df.sparkSession
    val keys = keyCols.map(col)
    val parts = spark.sparkContext.defaultParallelism
    // materialized ONCE (r17 optimization round): both passes below
    // (per-partition counts, boundary pick) walk the range-sorted
    // rows, and without the checkpoint pass 2 re-ran the whole
    // post-shuffle sort stage (the shuffle files are reused across
    // jobs, the reduce-side sort is not). The materialization holds
    // the same bytes the shuffle already wrote.
    val parted = df
      .select(keys :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .repartitionByRange(parts, keys :+ col("__v"): _*)
      .sortWithinPartitions(keys :+ col("__v"): _*)
      .localCheckpoint()
    val nk = keyCols.size
    // pass 1 as a codegen'd partial aggregate (r17 optimization
    // round): the per-partition per-key counts used to be an
    // interpreted Row loop over every sorted row; a
    // groupBy(partition_id, keys) count produces the identical
    // (pid, key, count) table with map-side combine and whole-stage
    // codegen. The few-huge-groups contract is enforced at the same
    // strength: take() bounds what can ever reach the driver
    // (partitions × maxGroups + 1 rows) and the distinct-key census
    // over that bounded sample fails loudly on misuse.
    //
    // __mid = monotonically_increasing_id() = (partition index << 33)
    // + row index within the partition, evaluated on the CHECKPOINTED
    // rows before the aggregate's exchange. Rows of one (pid, key) are
    // contiguous within their partition (the partition is sorted by
    // (keys, __v)), so min(__mid) is the key's first row in that
    // partition and the row at per-key local index i has
    // __mid = min + i. Both passes below iterate the same materialized
    // blocks in the same order, so the ids are stable across jobs —
    // the same two-pass determinism the old mapPartitions pair relied
    // on, now expressed so pass 2 can be a codegen'd filter instead of
    // an interpreted per-row rank loop.
    val withMid = parted.withColumn("__mid", monotonically_increasing_id())
    val cRows = withMid
      .groupBy(spark_partition_id().as("__pid") +: keys: _*)
      .agg(count(lit(1)).as("__c"), min(col("__mid")).as("__m0"))
      .take(parts * maxGroups + 1)
    val counts: Array[(Int, Seq[Any], Long)] = cRows.map { r =>
      (r.getInt(0), (1 to nk).map(r.get), r.getLong(nk + 1))
    }
    val firstMid: Map[(Int, Seq[Any]), Long] = cRows.map { r =>
      ((r.getInt(0), (1 to nk).map(r.get): Seq[Any]), r.getLong(nk + 2))
    }.toMap
    if (counts.map(_._2).distinct.size > maxGroups ||
        cRows.length > parts * maxGroups)
      throw new IllegalArgumentException(
        s"groupedQuantilesSorted: more than $maxGroups distinct " +
          "groups — this variant keeps O(partitions x groups) " +
          "driver state and targets the few-huge-groups regime; " +
          "use groupedQuantiles (the window form) for many-group " +
          "inputs, or raise maxGroups deliberately")
    val totals = counts.groupBy(_._2).map { case (k, cs) =>
      k -> cs.map(_._3).sum
    }
    // global start offset of each key within each partition
    val offsets: Map[(Int, Seq[Any]), Long] = counts.groupBy(_._2)
      .flatMap { case (k, cs) =>
        var run = 0L
        cs.sortBy(_._1).map { case (pid, _, c) =>
          val o = ((pid, k), run); run += c; o
        }
      }
    // boundary ranks per key (the only rows pass 2 must emit)
    val boundary: Map[Seq[Any], Set[Long]] = totals.map { case (k, n) =>
      k -> ps.flatMap { p =>
        val pos = p * (n - 1)
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
      }.toSet
    }
    // pass 2 (r17 optimization round, second session): the driver
    // already knows, for every boundary rank b of key k, WHICH
    // partition holds it (the offsets prefix sums) and its per-key
    // local index — so it can name the exact row id:
    //   __mid(b, k) = firstMid(pid, k) + (b - offset(pid, k)).
    // The boundary pick is then a codegen'd scan + InSet filter over
    // the checkpointed rows collecting <= 2·|ps|·groups rows, instead
    // of the former interpreted Row loop that hashed every key and
    // consulted two broadcast maps per row.
    val targetMid: Map[(Seq[Any], Long), Long] = boundary.toSeq.flatMap {
      case (k, ranks) =>
        // this key's per-partition segments in rank order:
        // (pid, global start offset, count)
        val segs = counts.filter(_._2 == k).sortBy(_._1)
          .map { case (pid, _, c) => (pid, offsets((pid, k)), c) }
        ranks.toSeq.map { b =>
          val (pid, off, _) =
            segs.find { case (_, o, c) => o <= b && b < o + c }.get
          ((k, b), firstMid((pid, k)) + (b - off))
        }
    }.toMap
    val mids = targetMid.values.toSeq.distinct.map(lit)
    val picked: Map[Long, Double] = withMid
      .filter(col("__mid").isin(mids: _*))
      .select(col("__mid"), col("__v"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byKey = boundary.map { case (k, ranks) =>
      k -> ranks.map(b => b -> picked(targetMid((k, b)))).toMap
    }
    val keySchema = org.apache.spark.sql.types.StructType(
      df.select(keys: _*).schema.fields)
    val schema = org.apache.spark.sql.types.StructType(
      keySchema.fields ++ labels.map(l =>
        org.apache.spark.sql.types.StructField(l,
          org.apache.spark.sql.types.DoubleType, nullable = false)))
    val resultRows = totals.toSeq.map { case (k, n) =>
      val vals = byKey(k)
      val qs = ps.map { p =>
        val pos = p * (n - 1)
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val frac = pos - lo
        vals(lo) + frac * (vals(hi) - vals(lo))
      }
      Row.fromSeq(k ++ qs)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(resultRows, 1), schema)
  }
}
