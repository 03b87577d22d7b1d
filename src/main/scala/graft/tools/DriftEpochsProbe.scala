package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.IvfVectorIndex
import graft.operators.{Ivf, Knn}

/** SUSTAINED-drift probe (r17, the r16 verdict's #3): one grow epoch
  * is measured superbly ([[GrowScaleProbe]]); this measures TEN —
  * each epoch appends a batch concentrated in a NEVER-SEEN mode and
  * runs the ingestIvf maintenance decision, tracking per epoch:
  *
  *   k (codebook length), occupied cells (k minus dead),
  *   epoch maintenance seconds, cumulative seconds,
  *   recall@10 at nprobe=2 over queries at EVERY mode seen so far.
  *
  * Two arms:
  *  - UNBOUNDED (`maxCells=0`): k grows monotonically, each epoch
  *    pays the lake-wide capture scan — the trajectory the r16
  *    verdict asked to see, closed with the cost of ONE rebuild on
  *    the final corpus (the alternative a bounded policy amortizes).
  *  - BOUNDED (`maxCells = seedK * 3 / 2`): grows until the cap,
  *    then REBUILDS re-fitting the seed budget
  *    ([[IvfVectorIndex.rebuild]] — dead cells retire, k resets),
  *    then grows again; the policy `IndexStream.ingestIvf` ships.
  *
  * Run: sbt "runMain graft.tools.DriftEpochsProbe [nBase] [nEpoch]"
  * (defaults 200000 / 15000, 10 epochs). Results in BASELINE.md. */
object DriftEpochsProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(200000)
    val nEpochBatch = args.lift(1).map(_.toInt).getOrElse(15000)
    val epochs = 10
    val dim = 32
    val seedK = 16
    val nQueriesPerMode = 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(17)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def around(c: Array[Float], sigma: Float): Seq[Float] =
      c.map(x => x + sigma * rnd.nextGaussian().toFloat).toSeq
    val baseCenters = Array.fill(12)(unit())
    val epochCenters = Array.fill(epochs)(unit())
    val baseDf = (0 until nBase).map(i =>
        (i.toLong, around(baseCenters(i % 12), 0.15f)))
      .toDF("docid", "vector").repartition(32).localCheckpoint(true)
    val epochDfs = (0 until epochs).map { e =>
      (0 until nEpochBatch).map(i =>
          (nBase + e.toLong * nEpochBatch + i,
            around(epochCenters(e), 0.15f)))
        .toDF("docid", "vector").repartition(8).localCheckpoint(true)
    }

    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // recall@10 nprobe=2 over queries at every mode seen through
    // epoch e, against exact brute force on the same corpus
    def recallAt(idx: IvfVectorIndex, throughEpoch: Int): Double = {
      val centers = baseCenters ++ epochCenters.take(throughEpoch + 1)
      val queries = centers.zipWithIndex.flatMap { case (c, ci) =>
        (0 until nQueriesPerMode).map(qi =>
          ((ci * nQueriesPerMode + qi).toLong, around(c, 0.15f)))
      }.toSeq.toDF("qid", "qvec").localCheckpoint(true)
      val corpus = idx.df.localCheckpoint(true)
      val truth = Knn.searchBatch(corpus, "vector", "docid",
        queries, "qvec", "qid", k = 10).select(col("qid"), col("id"))
      val got = Ivf.searchBatch(corpus, "vector", "docid",
        queries, "qvec", "qid", k = 10, idx.model, nprobe = 2)
        .select(col("qid"), col("id"))
      val n = centers.length * nQueriesPerMode * 10
      truth.join(got, Seq("qid", "id")).count().toDouble / n
    }

    // the ingestIvf maintenance block, replayed offline: drift report
    // -> share+frac gate -> novel-vs-moved split -> grow (or rebuild
    // past the bound). Returns (newIdx, rebuilt, seconds).
    def maintain(idx: IvfVectorIndex,
        batch: org.apache.spark.sql.DataFrame,
        maxCells: Int): (IvfVectorIndex, Boolean, Double) = {
      val ((next, rebuilt), s) = timeIt {
        val report = Ivf.drift(
          idx.df.withColumnRenamed("vector", "v"),
          batch.withColumnRenamed("vector", "v"), "v", idx.model)
        val batchN = math.max(1L, batch.count())
        val drifted = report
          .filter(col("n_new") >= lit(0.05 * batchN) &&
            col("drift_frac") >= 0.5)
          .select("cluster", "ref_mean_cos", "new_mean_cos")
          .collect()
          .map(r => (r.getInt(0),
            if (r.isNullAt(1)) Double.NaN else r.getDouble(1),
            if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
          .toSeq
        val (novel, moved) = drifted.partition { case (_, rm, nm) =>
          rm.isNaN || nm < 0.5 * rm
        }
        var cur = idx
        var didRebuild = false
        if (novel.nonEmpty) {
          val k0 = cur.model.centroids.length
          if (maxCells > 0 && k0 + novel.size > maxCells) {
            val refit = Ivf.trainDistributed(
              cur.df, "vector", k = seedK, iters = 5)
            cur = cur.rebuild(refit)
            didRebuild = true
          } else cur = cur.growClusters(novel.map(_._1), add = novel.size)
        }
        if (moved.nonEmpty && !didRebuild)
          cur = cur.retrainInPlace(moved.map(_._1))
        (cur, didRebuild)
      }
      (next, rebuilt, s)
    }

    def occupiedCells(idx: IvfVectorIndex): Int =
      idx.df.select("cluster").distinct().count().toInt

    def runArm(label: String, maxCells: Int): (IvfVectorIndex, Double) = {
      println(s"\n[driftepochs] ===== arm: $label (maxCells=$maxCells) =====")
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_drift_epochs_$label").toString
      val model = Ivf.train(baseDf, "vector", k = seedK,
        sampleSize = 16384)
      var idx = IvfVectorIndex.build(
        baseDf, "vector", "docid", s"$root/idx", model)
      println(f"[driftepochs] $label e=-- k=$seedK%3d " +
        f"recall=${recallAt(idx, -1)}%.3f (base corpus)")
      var cumulative = 0.0
      (0 until epochs).foreach { e =>
        idx.append(epochDfs(e), "vector", "docid")
        idx = IvfVectorIndex.load(spark, s"$root/idx")
        val (next, rebuilt, s) = maintain(idx, epochDfs(e), maxCells)
        idx = next
        cumulative += s
        val k = idx.model.centroids.length
        val occ = occupiedCells(idx)
        val rec = recallAt(idx, e)
        println(f"[driftepochs] $label e=$e%2d k=$k%3d occ=$occ%3d " +
          f"dead=${k - occ}%2d recall@10=$rec%.3f epoch=$s%6.1f s " +
          f"cum=$cumulative%6.1f s rebuilt=$rebuilt")
      }
      (idx, cumulative)
    }

    val (grownIdx, growCum) = runArm("unbounded", 0)
    // the alternative the unbounded arm's cumulative cost compares
    // against: ONE rebuild of the final corpus at the end
    val (_, endRebuildT) = timeIt {
      val refit = Ivf.trainDistributed(
        grownIdx.df, "vector", k = seedK, iters = 5)
      grownIdx.rebuild(refit)
    }
    val endRecall = recallAt(
      IvfVectorIndex.load(spark, grownIdx.path), epochs - 1)
    println(f"\n[driftepochs] unbounded arm: cumulative maintenance " +
      f"$growCum%.1f s across $epochs epochs; ONE end rebuild " +
      f"$endRebuildT%.1f s -> recall@10=$endRecall%.3f (but every " +
      "epoch BEFORE it would have searched the stale book)")

    runArm("bounded", seedK * 3 / 2)
    spark.stop()
  }
}
