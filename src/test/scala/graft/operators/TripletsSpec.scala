package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Triplet mining: brute-force validation of both argmaxes against
  * the engine's own bucket assignment, the label contracts, and the
  * drop rules. */
class TripletsSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val fixture = (1L to 40L).map { i =>
    val l = (i % 4).toInt
    // label-correlated direction + noise so positives beat negatives
    val v = Array.tabulate(8)(d =>
      (if (d == l * 2) 1.0f else 0.0f) + rnd.nextFloat() * 0.4f)
    (i, v, l)
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("positives and negatives are the brute-force argmaxes under " +
    "the label and bucket constraints") {
    val emb = fixture.toDF("vec_id", "embedding", "label")
    val lsh = HyperplaneLsh(dim = 8, nbits = 2, seed = 42L)
    val buckets = AnnLsh.bucketize(emb, "embedding", lsh)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byId = fixture.map(f => f._1 -> f).toMap
    val out = Triplets.mine(emb, "vec_id", "embedding", "label", lsh)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).toMap
    assert(out.nonEmpty)
    out.foreach { case (aid, (pid, pc, nid, nc)) =>
      val (_, av, al) = byId(aid)
      // contracts
      assert(byId(pid)._3 == al, s"positive label mismatch for $aid")
      assert(byId(nid)._3 != al, s"negative label match for $aid")
      assert(buckets(nid) == buckets(aid), s"negative out of bucket for $aid")
      // brute-force argmax (score desc, id asc)
      val bfPos = fixture.filter(f => f._3 == al && f._1 != aid)
        .map(f => (cos(av, f._2), f._1)).sortBy { case (s, i) => (-s, i) }.head
      assert(pid == bfPos._2 && math.abs(pc - bfPos._1) < 1e-6,
        s"pos for $aid: got ($pid, $pc) want $bfPos")
      val bfNeg = fixture
        .filter(f => f._3 != al && buckets(f._1) == buckets(aid))
        .map(f => (cos(av, f._2), f._1)).sortBy { case (s, i) => (-s, i) }.head
      assert(nid == bfNeg._2 && math.abs(nc - bfNeg._1) < 1e-6,
        s"neg for $aid: got ($nid, $nc) want $bfNeg")
    }
  }

  test("hard negatives are genuinely hard: mean neg_cos above the " +
    "mean off-label cosine (the mining signal)") {
    val emb = fixture.toDF("vec_id", "embedding", "label")
    val lsh = HyperplaneLsh(dim = 8, nbits = 1, seed = 42L)
    val out = Triplets.mine(emb, "vec_id", "embedding", "label", lsh)
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    val meanNeg = out.map(_._2).sum / out.length
    val offPairs = for {
      (i, vi, li) <- fixture; (j, vj, lj) <- fixture if li != lj
    } yield cos(vi, vj)
    val meanOff = offPairs.sum / offPairs.size
    assert(meanNeg > meanOff + 0.05, s"meanNeg=$meanNeg meanOff=$meanOff")
  }

  test("anchors with a singleton label drop out") {
    val emb = (fixture :+ ((99L, Array.fill(8)(0.5f), 9)))
      .toDF("vec_id", "embedding", "label")
    val lsh = HyperplaneLsh(dim = 8, nbits = 1, seed = 42L)
    val ids = Triplets.mine(emb, "vec_id", "embedding", "label", lsh)
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(99L))
  }
}
