package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** KMV distinct sketch: exact below k, statistically sound above,
  * partition-invariant (the mergeability that makes it a sketch). */
class KmvSpec extends SparkTestBase {

  test("below k distinct the sketch is exact and flagged exact, " +
    "with duplicates ignored") {
    graft.Graft.init(spark)
    import spark.implicits._
    val df = (0 until 10000).map(i => i % 700).toDF("v")
    val row = df.selectExpr("kmv_distinct(xxhash64(v), 1024) AS sk")
      .selectExpr("sk.n_distinct", "sk.exact").head()
    assert(row.getLong(0) == 700 && row.getBoolean(1))
  }

  test("above k the estimate lands within 5% on 200k distinct with " +
    "k=1024 (relative error ~ 1/sqrt(k))") {
    graft.Graft.init(spark)
    val df = spark.range(200000).toDF("v")
    val row = df.selectExpr("kmv_distinct(xxhash64(v), 1024) AS sk")
      .selectExpr("sk.n_distinct", "sk.exact").head()
    assert(!row.getBoolean(1))
    val est = row.getLong(0).toDouble
    assert(math.abs(est - 200000) / 200000 < 0.05, s"est=$est")
  }

  test("partition-invariance: 1, 7 and 32 input partitions produce " +
    "the identical sketch result (merge is a true set union)") {
    graft.Graft.init(spark)
    val results = Seq(1, 7, 32).map { p =>
      spark.range(50000).toDF("v").repartition(p)
        .selectExpr("kmv_distinct(xxhash64(v), 512) AS sk")
        .selectExpr("sk.n_distinct").head().getLong(0)
    }
    assert(results.distinct.size == 1, results.toString)
  }

  test("per-group grouping + map-side partial aggregation in the plan") {
    graft.Graft.init(spark)
    import spark.implicits._
    val df = (0 until 5000).map(i => (i % 3, i % 900)).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(expr("kmv_distinct(xxhash64(v), 4096)").as("sk"))
      .selectExpr("g", "sk.n_distinct AS n", "sk.exact AS e")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmv_distinct"), plan)
    val rows = out.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // v = i % 900 per g = i % 3: each residue class hits 300 values
    assert(rows == Map(0 -> 300L, 1 -> 300L, 2 -> 300L))
    assert(out.collect().forall(_.getBoolean(2)))
  }
}
