package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SemDeDup: duplicate-pair pruning keeps the diversity-preserving
  * (lowest cos-to-centroid) member, singletons survive, prune()
  * filters, and the parameter contract holds. */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def df2(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  // two well-separated direction clusters; (1, 2) are a near-dup pair
  private val fixture = Seq(
    1L -> Array(1.0f, 0.0f),
    2L -> Array(0.999f, 0.0447f),
    3L -> Array(0.8f, 0.6f),
    4L -> Array(0.0f, 1.0f),
    5L -> Array(-0.0447f, 0.999f),
    6L -> Array(-0.6f, 0.8f))

  private def run(tau: Double) = {
    val emb = df2(fixture)
    val model = Ivf.train(emb, "embedding", k = 2, sampleSize = 6)
    SemDedup.verdicts(Ivf.assign(emb, "embedding", model),
      "vec_id", "embedding", tau)
  }

  test("one row per input; the near-dup pair loses exactly its " +
    "more-centroid-redundant member; distinct members survive") {
    val out = run(0.99).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out.size == 6)
    // vectors 1 and 2 are within tau of each other; 3 is not
    val (_, ca1, kept1) = out(1L)
    val (_, ca2, kept2) = out(2L)
    assert(kept1 != kept2, s"exactly one of the pair survives: $out")
    val keptCa = if (kept1) ca1 else ca2
    val dropCa = if (kept1) ca2 else ca1
    assert(keptCa <= dropCa,
      s"kept member must be the LOW cos-to-centroid one: $out")
    // the pair (4, 5) mirrors (1, 2) in the other cluster
    assert(out(4L)._3 != out(5L)._3, s"$out")
    assert(out(3L)._3 && out(6L)._3, s"distinct members survive: $out")
  }

  test("with tau above every intra-cluster similarity nothing drops") {
    val out = run(0.9999999)
    assert(out.filter("NOT kept").count() == 0)
  }

  test("prune keeps exactly the kept ids with the input columns") {
    val emb = df2(fixture)
    val model = Ivf.train(emb, "embedding", k = 2, sampleSize = 6)
    val assigned = Ivf.assign(emb, "embedding", model)
    val kept = SemDedup.verdicts(assigned, "vec_id", "embedding", 0.99)
      .filter("kept").collect().map(_.getLong(0)).toSet
    val pruned = SemDedup.prune(assigned, "vec_id", "embedding", 0.99)
    assert(pruned.collect().map(_.getLong(0)).toSet == kept)
    assert(pruned.columns.toSeq == assigned.columns.toSeq)
  }

  test("parameter contract") {
    val emb = df2(fixture)
    val model = Ivf.train(emb, "embedding", k = 2, sampleSize = 6)
    intercept[IllegalArgumentException] {
      SemDedup.verdicts(Ivf.assign(emb, "embedding", model),
        "vec_id", "embedding", tau = 0.0)
    }
  }

  // one PLANTED giant cluster (every row pre-assigned cluster 0): a
  // common direction u plus a per-row deterministic offset, with every
  // id >= 300 an EXACT duplicate of id - 300 — tight neighborhoods the
  // residual-LSH sub-blocking must keep together
  private def giantCluster(n: Int, dim: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(7L)
    val u = Array.fill(dim)(1.0f)
    val base = (0 until n).map { i =>
      val v = u.clone()
      (0 until dim).foreach(d => v(d) += (rnd.nextFloat() - 0.5f) * 0.8f)
      i.toLong -> v
    }
    val dups = base.map { case (i, v) => (i + 300L) -> v.clone() }
    (base ++ dups).map { case (i, v) => (i, v, 0) }
      .toDF("vec_id", "embedding", "cluster")
  }

  test("skew hardening: a planted giant cluster sub-blocks to bounded " +
    "pair groups and the verdicts equal the unsplit brute force " +
    "(exact-dup neighborhoods never straddle blocks)") {
    val assigned = giantCluster(300, 8) // 600 rows, ONE cluster
    val brute = SemDedup.verdicts(assigned, "vec_id", "embedding", 0.9999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val bounded = SemDedup.verdictsBounded(assigned, "vec_id", "embedding",
      0.9999, maxClusterSize = 64, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(bounded == brute)
    // exactly the 300 exact-dup losers drop
    assert(bounded.count(!_._2) == 300, bounded.count(!_._2).toString)
    // the pair-blocking really is bounded: replay the sub-label logic
    // and measure the largest block (600-row cluster, 64-cap -> 4 bits
    // -> 16 blocks, expected ~38 per block; assert far under the
    // unsplit 600 with binomial headroom)
    val lsh = HyperplaneLsh(8, nbits = 20, 42L)
    val cent = assigned.agg(graft.Graft.vectorAvg(col("embedding")))
      .head().getSeq[Double](0).toArray
    val blocks = assigned.collect().map { r =>
      val v = r.getSeq[Float](1)
      val res = v.indices.map(d => (v(d) - cent(d)).toFloat).toArray
      lsh.bucketOf(res) & ((1 << 4) - 1)
    }.groupBy(identity).map(_._2.length)
    assert(blocks.max < 150, s"largest sub-block ${blocks.max}")
    assert(blocks.size > 8, s"only ${blocks.size} blocks used")
  }

  test("no oversized cluster -> verdictsBounded == verdicts " +
    "bit-for-bit (the exact path)") {
    val emb = df2(fixture)
    val model = Ivf.train(emb, "embedding", k = 2, sampleSize = 6)
    val assigned = Ivf.assign(emb, "embedding", model)
    val a = SemDedup.verdicts(assigned, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    val b = SemDedup.verdictsBounded(assigned, "vec_id", "embedding",
      0.99, maxClusterSize = 100, dim = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    assert(a == b)
  }
}
