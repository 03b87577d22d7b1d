package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Connected components over dup-pair edges: label correctness on known
  * graph shapes, convergence on chains (worst diameter), and corpus
  * labeling with singleton + representative semantics. */
class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("two disjoint cliques and a chain resolve to min-id components") {
    // clique {1,2,3}, chain 10-11-12-13 (diameter 3), pair {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L),
      (20L, 21L)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L)
    assert(got == want)
  }

  test("a long chain (diameter 30) still converges within maxIter") {
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 31 && got.values.forall(_ == 0L))
  }

  test("labelCorpus: singletons label themselves, representatives " +
    "are marked, non-representatives are not") {
    val docs = Seq(1L, 2L, 3L, 7L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Components.labelCorpus(docs, "doc_id", pairs, "id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (7L, 7L, true), (9L, 9L, true)))
  }

  test("components over real near-dup pairs agree with a driver-side " +
    "union-find on the same edges") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = TextDedup.ngramJaccardPairs(
      docs, "doc_id", "text", n = 3, threshold = 0.2).cache()
    val edges = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "test corpus must contain near-dup pairs")
    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    val got = Components.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    pairs.unpersist()
  }
}
