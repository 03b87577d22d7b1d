package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: exact below k, guaranteed lower bounds
  * and presence above, partition-invariant error accounting. */
class HeavyHittersSpec extends SparkTestBase {

  test("universe within k: exact counts, flagged exact, " +
    "deterministically ordered") {
    graft.Graft.init(spark)
    import spark.implicits._
    val data = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c")
    val row = data.toDF("v")
      .agg(expr("heavy_hitters(v, 16)").as("hh"))
      .selectExpr("hh.exact", "hh.err", "hh.items").head()
    assert(row.getBoolean(0) && row.getLong(1) == 0L)
    val items = row.getSeq[org.apache.spark.sql.Row](2)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(items == Seq(("a", 40L), ("b", 25L), ("c", 10L)))
  }

  test("beyond k: every true heavy item survives, reported counts " +
    "are lower bounds within err of the truth") {
    graft.Graft.init(spark)
    import spark.implicits._
    // 5 heavy items (10_000 each) in a sea of 20_000 singletons
    val heavy = (0 until 5).flatMap(h => Seq.fill(10000)(s"H$h"))
    val noise = (0 until 20000).map(i => s"n$i")
    val df = scala.util.Random.shuffle(heavy ++ noise).toDF("v")
      .repartition(8)
    val row = df.agg(expr("heavy_hitters(v, 64)").as("hh"))
      .selectExpr("hh.exact", "hh.err", "hh.items").head()
    assert(!row.getBoolean(0))
    val err = row.getLong(1)
    val items = row.getSeq[org.apache.spark.sql.Row](2)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    (0 until 5).foreach { h =>
      val c = items.getOrElse(s"H$h", fail(s"heavy item H$h evicted " +
        s"(err=$err, true=10000)"))
      assert(c <= 10000 && 10000 - c <= err, s"H$h count=$c err=$err")
    }
  }

  test("merge is partition-invariant in the exact regime: 1, 5 and " +
    "32 partitions yield the identical summary") {
    graft.Graft.init(spark)
    import spark.implicits._
    val data = (0 until 9000).map(i => s"t${i % 100}")
    val results = Seq(1, 5, 32).map { p =>
      data.toDF("v").repartition(p)
        .agg(expr("heavy_hitters(v, 128)").as("hh"))
        .selectExpr("hh.exact", "hh.items").head()
    }
    assert(results.forall(_.getBoolean(0)))
    assert(results.map(_.getSeq[org.apache.spark.sql.Row](1).toList)
      .distinct.size == 1)
  }

  test("map-side partial aggregation in the plan") {
    graft.Graft.init(spark)
    import spark.implicits._
    val out = (0 until 100).map(i => s"x${i % 7}").toDF("v")
      .agg(expr("heavy_hitters(v, 32)").as("hh"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_heavy_hitters"), plan)
  }
}
