package graft.operators

import graft.SparkTestBase

/** Codebook drift: in-distribution incoming reads ~zero drift,
  * shifted incoming fires the trigger, per-cluster accounting holds
  * for one-sided clusters. */
class IvfDriftSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(5)
  private def around(dir: Int, n: Int, from: Long) =
    (0 until n).map { i =>
      (from + i, Array.tabulate(8)(d =>
        (if (d == dir) 1.0f else 0.0f) + rnd.nextFloat() * 0.15f))
    }

  test("in-distribution incoming: drift_frac ~ 0; shifted incoming: " +
    "drift fires") {
    val ref = (around(0, 60, 0L) ++ around(2, 60, 100L))
      .toDF("vec_id", "embedding")
    val model = Ivf.train(ref, "embedding", k = 2, sampleSize = 200)
    val sameDist = (around(0, 40, 500L) ++ around(2, 40, 600L))
      .toDF("vec_id", "embedding")
    val ok = Ivf.drift(ref, sameDist, "embedding", model)
      .collect().map(r => r.getDouble(5))
    assert(ok.forall(_ < 0.2), ok.toSeq.toString)
    // shifted: a direction the codebook never saw
    val shifted = around(5, 80, 700L).toDF("vec_id", "embedding")
    val bad = Ivf.drift(ref, shifted, "embedding", model)
      .collect().map(r => (r.getLong(3), r.getDouble(5)))
    val weighted = bad.map { case (n, f) => n * f }.sum /
      bad.map(_._1).sum.toDouble
    assert(weighted > 0.8, bad.toSeq.toString)
  }

  test("per-cluster accounting: a cluster with no incoming rows " +
    "carries n_new 0 and null new-side stats") {
    val ref = (around(0, 50, 0L) ++ around(2, 50, 100L))
      .toDF("vec_id", "embedding")
    val model = Ivf.train(ref, "embedding", k = 2, sampleSize = 100)
    val incOneSide = around(0, 30, 500L).toDF("vec_id", "embedding")
    val rows = Ivf.drift(ref, incOneSide, "embedding", model)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(3), r.isNullAt(4))).toMap
    assert(rows.size == 2)
    assert(rows.values.exists { case (nr, nn, nullNew) =>
      nr > 0 && nn == 0 && nullNew })
    assert(rows.values.exists { case (nr, nn, nullNew) =>
      nr > 0 && nn > 0 && !nullNew })
  }
}
