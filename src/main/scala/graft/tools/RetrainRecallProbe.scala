package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.IvfVectorIndex
import graft.operators.{Ivf, Knn}

/** Retrain-in-place RECALL probe (r15): the drift loop's value side.
  * `IvfIndexCrashSpec`/`IvfStreamRetrainSpec` pin that the in-stream
  * retrain is crash-safe and loses no rows; this probe measures what
  * it BUYS — the recall an IVF index loses when the corpus drifts
  * away from its codebook, and how much of it a partition-pruned
  * `retrainInPlace` of only the flagged clusters claws back without a
  * full rebuild.
  *
  * Shape: `nBase` vectors in 8 tight clusters train a k=16 codebook;
  * `nDrift` vectors then arrive around 2 NOVEL directions (appended
  * with the stored book — the pruning contract). 100 queries near
  * the novel directions are answered three ways: exact brute force
  * (truth), IVF nprobe∈{1,2} before retrain, and the same after
  * `Ivf.drift` flags the contaminated clusters and `retrainInPlace`
  * re-clusters them. Output: recall@10 per configuration.
  *
  * Run: sbt "runMain graft.tools.RetrainRecallProbe [nBase] [nDrift]"
  * (defaults 200000 / 50000, dim 32). Results in BASELINE.md.
  */
object RetrainRecallProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(200000)
    val nDrift = args.lift(1).map(_.toInt).getOrElse(50000)
    val dim = 32
    val nQueries = 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(42)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def around(c: Array[Float], sigma: Float): Seq[Float] =
      c.map(x => x + sigma * rnd.nextGaussian().toFloat).toSeq

    val baseCenters = Array.fill(8)(unit())
    val driftCenters = Array.fill(2)(unit())
    val base = (0 until nBase).map(i =>
      (i.toLong, around(baseCenters(i % 8), 0.15f)))
    val drift = (0 until nDrift).map(i =>
      (nBase + i.toLong, around(driftCenters(i % 2), 0.15f)))
    val baseDf = base.toDF("docid", "vector").localCheckpoint(true)
    val driftDf = drift.toDF("docid", "vector").localCheckpoint(true)
    val allDf = baseDf.union(driftDf).localCheckpoint(true)

    val model = Ivf.train(baseDf, "vector", k = 16, sampleSize = 16384)
    val root = java.nio.file.Files
      .createTempDirectory("graft_retrain_recall").toString
    val idx = IvfVectorIndex.build(baseDf, "vector", "docid",
      s"$root/idx", model)
    idx.append(driftDf, "vector", "docid")

    val queries = (0 until nQueries).map(q =>
      (q.toLong, around(driftCenters(q % 2), 0.15f)))
      .toDF("qid", "qvec").localCheckpoint(true)

    val truth = Knn.searchBatch(allDf, "vector", "docid",
      queries, "qvec", "qid", k = 10)
      .select(col("qid"), col("id")).localCheckpoint(true)

    def recall(index: IvfVectorIndex, nprobe: Int): Double = {
      val got = Ivf.searchBatch(index.df, "vector", "docid",
        queries, "qvec", "qid", k = 10, index.model, nprobe = nprobe)
        .select(col("qid"), col("id"))
      val hits = truth.join(got, Seq("qid", "id")).count()
      hits.toDouble / (nQueries * 10)
    }

    val loaded = IvfVectorIndex.load(spark, s"$root/idx")
    val before = Seq(1, 2).map(p => p -> recall(loaded, p))

    // the drift detector's per-cluster report — the same one the
    // in-stream retrain consumes (IndexStream.ingestIvf)
    val report = Ivf.drift(
      loaded.df.withColumnRenamed("vector", "v"),
      driftDf.withColumnRenamed("vector", "v"), "v", loaded.model)
      .collect()
    report.sortBy(_.getInt(0)).foreach { r =>
      println(s"[recall] report cluster=${r.get(0)} n_ref=${r.get(1)} " +
        s"ref_mean=${r.get(2)} n_new=${r.get(3)} new_mean=${r.get(4)} " +
        s"drift_frac=${r.get(5)}")
    }
    def flaggedBy(minFrac: Double, minShare: Double): Seq[Int] = report
      .filter(r => !r.isNullAt(3) && r.getLong(3) > minShare * nDrift &&
        !r.isNullAt(5) && r.getDouble(5) >= minFrac)
      .map(_.getInt(0)).toSeq

    println(f"[recall] corpus=${nBase + nDrift} (drifted $nDrift), " +
      f"k=16, dim=$dim, queries=$nQueries near the novel directions")
    before.foreach { case (p, b) =>
      println(f"[recall] nprobe=$p before any retrain: $b%.3f")
    }
    // sweep the flagging rule: frac-only (the naive form) vs
    // frac + a minimum incoming SHARE (retrain only where the drifted
    // mass actually lives)
    Seq(("frac>=0.5 only", flaggedBy(0.5, 0.0)),
        ("frac>=0.5 & share>=5%", flaggedBy(0.5, 0.05))).foreach {
      case (label, flagged) =>
        println(s"[recall] strategy '$label': clusters $flagged")
        // retrain a fresh copy of the index (rebuild to a new path so
        // strategies don't contaminate each other)
        val p2 = s"$root/idx_${label.hashCode.toHexString}"
        val cp = IvfVectorIndex.build(baseDf, "vector", "docid", p2, model)
        cp.append(driftDf, "vector", "docid")
        val t0 = System.nanoTime()
        val retrained = IvfVectorIndex.load(spark, p2)
          .retrainInPlace(flagged, iters = 5)
        val sec = (System.nanoTime() - t0) / 1e9
        Seq(1, 2).foreach { p =>
          println(f"[recall]   nprobe=$p after retrain: " +
            f"${recall(retrained, p)}%.3f (retrain $sec%.1f s, " +
            f"${flagged.size} clusters)")
        }
    }
    // GROW instead of move (r16): same flags as the mass-gated
    // strategy, but novel mass gets NEW centroids — the response
    // IndexStream.ingestIvf picks when drift_frac >= growFrac
    locally {
      val flagged = flaggedBy(0.5, 0.05)
      println(s"[recall] strategy 'grow (frac>=0.5 & share>=5%)': " +
        s"clusters $flagged")
      val p3 = s"$root/idx_grow"
      val cp = IvfVectorIndex.build(baseDf, "vector", "docid", p3, model)
      cp.append(driftDf, "vector", "docid")
      val t0 = System.nanoTime()
      val grown = IvfVectorIndex.load(spark, p3)
        .growClusters(flagged, add = 2, iters = 5)
      val sec = (System.nanoTime() - t0) / 1e9
      Seq(1, 2).foreach { p =>
        println(f"[recall]   nprobe=$p after GROW: " +
          f"${recall(grown, p)}%.3f (grow $sec%.1f s, " +
          f"${flagged.size} flagged -> +2 cells, " +
          f"k=${grown.model.centroids.length})")
      }
    }
    // the ceiling: a full retrain + rebuild over the union
    val fullModel = Ivf.train(allDf, "vector", k = 16, sampleSize = 16384)
    val full = IvfVectorIndex.build(allDf, "vector", "docid",
      s"$root/full", fullModel)
    Seq(1, 2).foreach { p =>
      println(f"[recall] nprobe=$p full-rebuild ceiling: " +
        f"${recall(full, p)}%.3f")
    }

    // ---- scenario B: GRADUAL drift (retrainInPlace's intended use —
    // the clusters themselves shift, rows stay home) ----
    val shiftDirs = Array.fill(8)(unit())
    def shifted(c: Int): Array[Float] = {
      val v = baseCenters(c).zip(shiftDirs(c))
        .map { case (b, s) => b + 0.5f * s }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val gradDrift = (0 until nDrift).map(i =>
      (nBase + i.toLong, around(shifted(i % 8), 0.15f)))
      .toDF("docid", "vector").localCheckpoint(true)
    val gradAll = baseDf.union(gradDrift).localCheckpoint(true)
    val gradQueries = (0 until nQueries).map(q =>
      (q.toLong, around(shifted(q % 8), 0.15f)))
      .toDF("qid", "qvec").localCheckpoint(true)
    val gradTruth = Knn.searchBatch(gradAll, "vector", "docid",
      gradQueries, "qvec", "qid", k = 10)
      .select(col("qid"), col("id")).localCheckpoint(true)
    def recallG(index: IvfVectorIndex, nprobe: Int): Double = {
      val got = Ivf.searchBatch(index.df, "vector", "docid",
        gradQueries, "qvec", "qid", k = 10, index.model, nprobe = nprobe)
        .select(col("qid"), col("id"))
      gradTruth.join(got, Seq("qid", "id")).count().toDouble /
        (nQueries * 10)
    }
    val gp = s"$root/grad"
    IvfVectorIndex.build(baseDf, "vector", "docid", gp, model)
      .append(gradDrift, "vector", "docid")
    val gIdx = IvfVectorIndex.load(spark, gp)
    val gBefore = Seq(1, 2).map(p => p -> recallG(gIdx, p))
    val gReport = Ivf.drift(
      gIdx.df.withColumnRenamed("vector", "v"),
      gradDrift.withColumnRenamed("vector", "v"), "v", gIdx.model)
      .collect()
    gReport.sortBy(_.getInt(0)).foreach { r =>
      println(s"[recall] GRADUAL report cluster=${r.get(0)} " +
        s"n_ref=${r.get(1)} ref_mean=${r.get(2)} n_new=${r.get(3)} " +
        s"new_mean=${r.get(4)} drift_frac=${r.get(5)}")
    }
    val gFlagged = gReport
      .filter(r => !r.isNullAt(3) && r.getLong(3) > 0.05 * nDrift &&
        !r.isNullAt(5) && r.getDouble(5) >= 0.5)
      .map(_.getInt(0)).toSeq
    println(s"[recall] GRADUAL flagged (frac>=0.5 & share>=5%): $gFlagged")
    val gRetrained = gIdx.retrainInPlace(
      if (gFlagged.nonEmpty) gFlagged else Seq(0), iters = 5)
    val gAfter = Seq(1, 2).map(p => p -> recallG(gRetrained, p))
    val gFullModel = Ivf.train(gradAll, "vector", k = 16,
      sampleSize = 16384)
    val gFull = IvfVectorIndex.build(gradAll, "vector", "docid",
      s"$root/gradfull", gFullModel)
    gBefore.zip(gAfter).foreach { case ((p, b), (_, a)) =>
      println(f"[recall] GRADUAL nprobe=$p: before $b%.3f -> " +
        f"after retrain $a%.3f (full-rebuild ceiling " +
        f"${recallG(gFull, p)}%.3f)")
    }
    // THE STREAM POLICY row (r16): what IndexStream.ingestIvf with
    // (driftFrac=0.5, minShare=0.05, growFrac=0.9) actually does in
    // each scenario — grow the near-1 frac flags, relocate the
    // mid-band flags, touch nothing otherwise. The r15 verdict's bar:
    // maintained recall >= no-maintenance in BOTH scenarios.
    def policy(flags: Seq[(Int, Double, Double)], path: String,
        idx: IvfVectorIndex): IvfVectorIndex = {
      // IndexStream.ingestIvf's rule: novel mass collapses the
      // incoming mean cosine relative to the reference mean
      val (novel, moved) = flags.partition { case (_, rm, nm) =>
        rm.isNaN || nm < 0.5 * rm
      }
      var cur = idx
      if (novel.nonEmpty)
        cur = cur.growClusters(novel.map(_._1), add = novel.size)
      if (moved.nonEmpty) cur = cur.retrainInPlace(moved.map(_._1))
      println(s"[recall] policy at $path: grow=${novel.map(_._1)} " +
        s"relocate=${moved.map(_._1)}")
      cur
    }
    def flagsOf(rep: Array[org.apache.spark.sql.Row])
        : Seq[(Int, Double, Double)] = rep
      .filter(r => !r.isNullAt(3) && r.getLong(3) > 0.05 * nDrift &&
        !r.isNullAt(5) && r.getDouble(5) >= 0.5)
      .map(r => (r.getInt(0),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toSeq
    val aFlags = flagsOf(report)
    val pA = s"$root/policy_novel"
    IvfVectorIndex.build(baseDf, "vector", "docid", pA, model)
      .append(driftDf, "vector", "docid")
    val polA = policy(aFlags, pA, IvfVectorIndex.load(spark, pA))
    Seq(1, 2).foreach { p =>
      println(f"[recall] POLICY novel-modes nprobe=$p: maintained " +
        f"${recall(polA, p)}%.3f vs no-maintenance " +
        f"${before.toMap.apply(p)}%.3f")
    }
    val gFlags = flagsOf(gReport)
    val pG = s"$root/policy_grad"
    IvfVectorIndex.build(baseDf, "vector", "docid", pG, model)
      .append(gradDrift, "vector", "docid")
    val polG = policy(gFlags, pG, IvfVectorIndex.load(spark, pG))
    Seq(1, 2).foreach { p =>
      println(f"[recall] POLICY gradual nprobe=$p: maintained " +
        f"${recallG(polG, p)}%.3f vs no-maintenance " +
        f"${gBefore.toMap.apply(p)}%.3f")
    }
    spark.stop()
  }
}
