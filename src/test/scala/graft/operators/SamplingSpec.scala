package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Deterministic splitting: stability, proportions, decorrelation from
  * id locality, and the split-boundary contract. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val ids = spark.range(0, 10000).toDF("id")

  test("split assignment is deterministic and partitioning-independent") {
    val a = Sampling.withSplit(ids, "id", Seq("train" -> 80, "test" -> 20))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.withSplit(ids.repartition(13), "id",
        Seq("train" -> 80, "test" -> 20))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("proportions land near the requested percents") {
    val counts = Sampling.withSplit(ids, "id",
        Seq("train" -> 80, "valid" -> 10, "test" -> 10))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000L) < 300, counts)
    assert(math.abs(counts("valid") - 1000L) < 150, counts)
    assert(math.abs(counts("test") - 1000L) < 150, counts)
  }

  test("consecutive ids do not stripe into the same split (mix " +
    "decorrelates id locality)") {
    val splits = Sampling.withSplit(ids.limit(100), "id",
        Seq("train" -> 80, "test" -> 20))
      .orderBy("id").collect().map(_.getString(1))
    // a raw id%100 split would put ids 0..79 all in train
    val firstTwenty = splits.take(20)
    assert(firstTwenty.distinct.length == 2,
      s"first 20 consecutive ids all landed in ${firstTwenty.head}")
  }

  test("deterministicSample(p) is a subset of deterministicSample(p+10) " +
    "(monotone growth, the property random sampling lacks)") {
    val s20 = Sampling.deterministicSample(ids, "id", 20)
      .collect().map(_.getLong(0)).toSet
    val s30 = Sampling.deterministicSample(ids, "id", 30)
      .collect().map(_.getLong(0)).toSet
    assert(s20.subsetOf(s30) && s20.nonEmpty && s30.size > s20.size)
  }

  test("stratifiedSplit: EXACT proportions inside every stratum, " +
    "including small ones where hash splitting drifts") {
    val df = spark.range(0, 1030).select(col("id"),
      when(col("id") < 1000, "en").otherwise("de").as("lang"))
    val got = Sampling.stratifiedSplit(df, "id", Seq("lang"),
        Seq("train" -> 80, "test" -> 20))
      .groupBy("lang", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got(("en", "train")) == 800 && got(("en", "test")) == 200)
    // the 30-row stratum still lands exactly 80/20 (24/6); an id-hash
    // split would drift by several rows here
    assert(got(("de", "train")) == 24 && got(("de", "test")) == 6, got)
  }

  test("stratifiedSplit is deterministic and partitioning-independent") {
    val df = spark.range(0, 500).select(col("id"),
      (col("id") % 7).cast("string").as("g"))
    val a = Sampling.stratifiedSplit(df, "id", Seq("g"),
        Seq("train" -> 90, "test" -> 10))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.stratifiedSplit(df.repartition(11), "id", Seq("g"),
        Seq("train" -> 90, "test" -> 10))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
  }

  test("bucket values stay in [0,100) and every intermediate is " +
    "non-negative (the DuckDB-portability contract)") {
    val buckets = ids.select(Sampling.bucket(col("id")).as("b"))
      .agg(min("b"), max("b")).head()
    assert(buckets.getLong(0) >= 0L && buckets.getLong(1) < 100L)
  }
}
