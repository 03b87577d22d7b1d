package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Binned range join: exact pair set vs the non-equi join, once per
  * pair, and a hash-join (not nested-loop) plan. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val values = spark.range(0, 1000)
    .select(col("id").as("vid"), (col("id") % 97).as("v"))
  private lazy val ranges = spark.range(0, 40)
    .select(col("id").as("rid"),
      (col("id") * 3).as("lo"), (col("id") * 3 + 10).as("hi"))

  test("pair set equals the plain non-equi join, each pair exactly once") {
    val want = values.join(ranges,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("vid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = RangeJoin.binned(values, "v", ranges, "lo", "hi", binWidth = 8)
      .select("vid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == want.sorted && want.nonEmpty)
    assert(got.size == got.distinct.size, "pairs must appear exactly once")
  }

  test("bin width does not change results (1, 5, 64)") {
    val base = RangeJoin.binned(values, "v", ranges, "lo", "hi", 5)
      .select("vid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(1L, 64L).foreach { w =>
      val alt = RangeJoin.binned(values, "v", ranges, "lo", "hi", w)
        .select("vid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(alt == base, s"binWidth $w")
    }
  }

  test("the plan is a hash join on the bin key, not a nested loop") {
    val plan = RangeJoin.binned(values, "v", ranges, "lo", "hi", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin"), plan)
  }
}
