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

  test("retrain-in-place completes the drift loop: only flagged " +
    "partitions are rewritten (untouched file mtimes pinned), the " +
    "patched codebook restores recall in the drifted region") {
    import org.apache.spark.sql.functions._
    val dim = 8
    // 3 tight reference clusters on axes 0/2/4
    val ref = (around(0, 60, 0L) ++ around(2, 60, 100L) ++
      around(4, 60, 200L)).toDF("vec_id", "embedding")
    val model = Ivf.train(ref, "embedding", k = 3, sampleSize = 300)
    val path = java.nio.file.Files
      .createTempDirectory("graft-retrain").toString + "/idx"
    val idx0 = graft.index.IvfVectorIndex.build(
      ref, "embedding", "vec_id", path, model)
    // a batch from a NEVER-SEEN direction (axis 6), biased slightly
    // toward axis 0 so the whole batch lands in ONE stale cluster —
    // the targeted-drift scenario retrain-in-place exists for
    val driftBatch = (0 until 80).map { i =>
      (700L + i, Array.tabulate(dim)(dd =>
        (if (dd == 6) 1.0f else if (dd == 0) 0.4f else 0.0f) +
          rnd.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding")
    idx0.append(driftBatch, "embedding", "vec_id")
    val d = Ivf.drift(ref, driftBatch, "embedding", model)
      .filter(col("drift_frac") > 0.5)
      .select("cluster").collect().map(_.getInt(0)).toSeq
    assert(d.nonEmpty, "drift must fire for the new direction")
    // mtimes of untouched partitions before the retrain
    val untouched = (0 until 3).filterNot(d.contains)
    assert(untouched.nonEmpty)
    // the r17 manifest layout spreads a partition over generation
    // dirs: an untouched cluster's files — across ALL generations —
    // must stay byte-for-byte alone through the retrain
    def mtimes(cs: Seq[Int]): Map[Int, Seq[Long]] = cs.map { c =>
      c -> new java.io.File(path).listFiles()
        .filter(g => g.isDirectory && g.getName.startsWith("gen="))
        .flatMap { g =>
          val dir = new java.io.File(g, s"cluster=$c")
          if (dir.exists()) dir.listFiles().toSeq else Seq.empty
        }
        .filter(_.getName.endsWith(".parquet"))
        .map(_.lastModified).sorted.toSeq
    }.toMap
    val before = mtimes(untouched)
    val query = Array.tabulate(dim)(i => if (i == 6) 1.0f else 0.0f)
    def recallAt10(ix: graft.index.IvfVectorIndex): Double = {
      val got = ix.search(query, 10, nprobe = 1)
        .select("docid").collect().map(_.getLong(0)).toSet
      val truth = Knn.search(ix.df, "vector", "docid", query, 10)
        .select("docid").collect().map(_.getLong(0)).toSet
      (got intersect truth).size / 10.0
    }
    val beforeRecall = recallAt10(idx0)
    val idx1 = idx0.retrainInPlace(d)
    // untouched partitions: byte-for-byte left alone
    assert(mtimes(untouched) == before)
    // total row count preserved (no loss, no duplication)
    assert(idx1.count() == 180 + 80)
    // the patched book now has a centroid facing direction 6: the
    // drifted region's top-10 is (near-)exact under 1-probe search
    val afterRecall = recallAt10(idx1)
    assert(afterRecall >= 0.9, s"after=$afterRecall before=$beforeRecall")
    assert(afterRecall >= beforeRecall)
    // load round-trips the patched codebook
    val reloaded = graft.index.IvfVectorIndex.load(spark, path)
    assert(reloaded.model.centroids.toSeq.map(_.toSeq) ==
      idx1.model.centroids.toSeq.map(_.toSeq))
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
