package graft.operators

import graft.SparkTestBase

/** Corpus snapshot diff: verdicts on every regime (added, removed,
  * changed, unchanged, null text both ways) and the 100 TB plan shape
  * — content hashed below the join so the shuffle never carries
  * text. */
class CorpusDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("added / removed / changed / unchanged / null-text verdicts") {
    val old = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (4L, null.asInstanceOf[String]), (5L, "delta"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val next = Seq(
      (1L, "alpha"),              // unchanged
      (2L, "beta EDITED"),        // changed
      // 3 removed
      (4L, null.asInstanceOf[String]), // null == null: unchanged
      (5L, null.asInstanceOf[String]), // text -> null: changed
      (6L, "was null"),           // null -> text: changed
      (9L, "brand new")).toDF("doc_id", "text")
    val got = CorpusDiff.diff(old, next, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed",
      5L -> "changed", 6L -> "changed", 9L -> "added"))
  }

  test("the shuffle carries (id, hash) — text is hashed below the " +
    "join, and the join is a real equi-join") {
    val old = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val next = Seq((1L, "a"), (3L, "c")).toDF("doc_id", "text")
    val plan = CorpusDiff.diff(old, next, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    // below the join sit only (id, hash) columns — the Exchanges
    // (and their scans) never mention text: the shuffle carries
    // 16 bytes per row however large the documents are
    val joinAt = plan.indexOf("Join")
    assert(joinAt >= 0, plan)
    val belowJoin = plan.substring(joinAt)
    assert(belowJoin.contains("old_hash") &&
      belowJoin.contains("new_hash"), plan)
    assert(!belowJoin.contains("text#"), plan)
  }

  test("diffing a snapshot against itself is empty") {
    val df = Seq((1L, "x"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(CorpusDiff.diff(df, df, "doc_id", "text").count() == 0)
  }
}
