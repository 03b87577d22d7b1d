package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** As-of join: inclusive boundary, left-outer nulls, tiebreak
  * determinism, and equivalence with a brute-force per-row lookup. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val trades = Seq(
    (1L, 100L, "t1"), (1L, 205L, "t2"), (1L, 300L, "t3"),
    (2L, 50L, "t4")).toDF("key", "t", "trade")
  private val quotes = Seq(
    (1L, 90L, 1.0), (1L, 200L, 2.0), (1L, 205L, 3.0), (1L, 400L, 9.0),
    (3L, 10L, 7.0)).toDF("key", "qt", "px")

  test("greatest right time <= left time wins; inclusive boundary; " +
    "no-match rows keep null") {
    val got = AsOfJoin.asof(trades, quotes, "key", "t", "qt", Seq("px"))
      .orderBy("key", "t")
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toSeq
    assert(got == Seq(
      ("t1", Some(1.0)),   // 100 -> quote@90
      ("t2", Some(3.0)),   // 205 -> quote@205 (inclusive)
      ("t3", Some(3.0)),   // 300 -> quote@205, not 400
      ("t4", None)))       // key 2 has no quotes
  }

  test("duplicate right times resolve by the tiebreak column (last wins)") {
    val dupQuotes = Seq(
      (1L, 100L, 10L, 1.0), (1L, 100L, 20L, 2.0), (1L, 100L, 15L, 1.5))
      .toDF("key", "qt", "qid", "px")
    val one = Seq((1L, 150L, "x")).toDF("key", "t", "trade")
    val got = AsOfJoin.asof(one, dupQuotes, "key", "t", "qt",
      Seq("px"), tieBreak = Some("qid")).head()
    assert(got.getDouble(3) == 2.0) // qid 20 is the max tiebreak
  }

  test("matches a brute-force per-row lookup on real events " +
    "(purchase <- latest prior click per user)") {
    val ev = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("us").as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("c_us"),
        col("event_id").as("click_id"))
    val got = AsOfJoin.asof(purchases, clicks, "user_id", "p_us", "c_us",
        Seq("click_id"), tieBreak = Some("click_id"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    val clickRows = clicks.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val purchaseRows = purchases.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(purchaseRows.nonEmpty && clickRows.nonEmpty)
    purchaseRows.foreach { case (pid, uid, pus) =>
      val want = clickRows.filter(c => c._1 == uid && c._2 <= pus)
        .sortBy(c => (c._2, c._3)).lastOption.map(_._3)
      assert(got(pid) == want, s"purchase $pid: ${got(pid)} vs $want")
    }
  }

  test("a NULL payload field in the matched right row stays NULL " +
    "(row-atomic carry, no mixing of right rows)") {
    val one = Seq((1L, 300L, "x")).toDF("key", "t", "trade")
    val q = Seq(
      (1L, 100L, Some(1.0), Some("a")),
      (1L, 200L, None: Option[Double], Some("b")))
      .toDF("key", "qt", "px", "src")
    val got = AsOfJoin.asof(one, q, "key", "t", "qt", Seq("px", "src")).head()
    // the match is quote@200 wholesale: px NULL (NOT 1.0 from quote@100)
    assert(Option(got.get(3)).isEmpty, got)
    assert(got.getString(4) == "b")
  }

  test("right rows with NULL time are never matched") {
    val one = Seq((1L, 300L, "x")).toDF("key", "t", "trade")
    val q = Seq((1L, Some(400L), 9.0), (1L, None: Option[Long], 7.0))
      .toDF("key", "qt", "px")
    // candidates: quote@400 (future) and a NULL-time quote -> no match
    val got = AsOfJoin.asof(one, q, "key", "t", "qt", Seq("px")).head()
    assert(Option(got.get(3)).isEmpty, got)
  }

  test("plan shape: one exchange (the window partition), no join node, " +
    "no row multiplication") {
    val plan = AsOfJoin.asof(trades, quotes, "key", "t", "qt", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.split("Exchange hashpartitioning").length <= 2, plan)
  }
}
