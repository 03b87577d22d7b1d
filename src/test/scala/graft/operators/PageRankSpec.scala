package graft.operators

import graft.SparkTestBase

/** PageRank: hand-computed two-node graph (dangling arm included),
  * mass conservation, hub-vs-periphery ordering, convergence, and the
  * parameter contract. */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  test("one iteration matches the hand-computed update, dangling " +
    "mass included") {
    // A -> B, B dangling. N=2, r0 = (1/2, 1/2), d = 0.85:
    //   dangling = r(B) = 1/2
    //   r'(A) = 0.15/2 + 0.85 * (0 + 0.25)   = 0.2875
    //   r'(B) = 0.15/2 + 0.85 * (0.5 + 0.25) = 0.7125
    val edges = Seq(("A", "B")).toDF("src", "dst")
    val out = PageRank.hostRank(edges, "src", "dst", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("A") - 0.2875) < 1e-6, s"$out")
    assert(math.abs(out("B") - 0.7125) < 1e-6, s"$out")
  }

  test("rank mass is conserved: sum(rank) == 1 every run") {
    val edges = (1 to 60).map(i =>
      (s"h${i % 12}", s"h${(i * i + 1) % 7}")).distinct
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    val ranks = PageRank.hostRank(edges, "src", "dst")
      .collect().map(_.getDouble(1))
    assert(math.abs(ranks.sum - 1.0) < 1e-4, s"sum=${ranks.sum}")
    assert(ranks.forall(_ > 0))
  }

  test("a hub with many in-links outranks the periphery") {
    // star: spokes 1..10 all link to 'hub'; hub links to s1
    val edges = ((1 to 10).map(i => (s"s$i", "hub")) :+ (("hub", "s1")))
      .toDF("src", "dst")
    val out = PageRank.hostRank(edges, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("hub") > out("s2") * 5, s"$out")
    // s1 gets the hub's whole out-mass, so it beats the other spokes
    assert(out("s1") > out("s2"), s"$out")
  }

  test("power iteration converges: 20 and 25 iterations agree to 1e-6") {
    val edges = (1 to 80).map(i =>
      (s"h${i % 16}", s"h${(i * 3 + 1) % 16}")).distinct
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
    val a = PageRank.hostRank(edges, "src", "dst", iterations = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = PageRank.hostRank(edges, "src", "dst", iterations = 25)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    a.foreach { case (h, r) =>
      assert(math.abs(r - b(h)) <= 1e-6, s"$h: $r vs ${b(h)}") }
  }

  test("parameter contract") {
    val edges = Seq(("A", "B")).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      PageRank.hostRank(edges, "src", "dst", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.hostRank(edges, "src", "dst", damping = 1.0)
    }
  }
}
