package graft.sources

import org.apache.spark.sql.functions._

import graft.{Graft, Sources, SparkTestBase}

/** Bucketed tables: the pay-the-shuffle-once-at-ingest story. Joining
  * two tables bucketed on the same key with the same bucket count must
  * plan WITHOUT any Exchange — the scan layout IS the partitioning. */
class BucketedJoinSpec extends SparkTestBase {

  test("equal-bucketed tables join with zero exchanges and correct rows") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Sources.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8)
    Sources.writeBucketed(lineitem, "b_lineitem", Seq("o_orderkey"), 8)
    // the test corpus is broadcast-sized, which would bypass the bucket
    // layout entirely; disable broadcast to exercise the plan a LARGE
    // fact-fact join gets (where bucketing is the whole point)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      // correctness: equals the plain parquet join
      val want = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == want && want > 0)
      // grouped aggregation on the bucket key also plans shuffle-free
      val aggPlan = spark.table("b_lineitem")
        .groupBy("o_orderkey").agg(sum("l_quantity"))
        .queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"), aggPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
