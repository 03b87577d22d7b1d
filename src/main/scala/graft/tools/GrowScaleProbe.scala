package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.IvfVectorIndex
import graft.operators.{Ivf, Knn}

/** GROW-vs-alternatives COST probe at corpus scale (r16): the recall
  * case for [[IvfVectorIndex.growClusters]] is measured by
  * [[RetrainRecallProbe]]; this probe measures what the 100 TB story
  * actually claims about COST — that grow is
  * O(flagged-partitions train + one map-only capture pass + movers'
  * partitions rewrite) while the rebuild it replaces is O(corpus
  * train + corpus shuffle + corpus write), and that the gap widens
  * with corpus size while recall stays at/above no-maintenance.
  *
  * Shape: `nBase` vectors (dim 32, 16 tight modes) under a k=64
  * stored book; `nDrift` rows in 2 NOVEL modes appended with the
  * stored book. Timed: the append, the drift report, growClusters
  * (plus a standalone capture-pass timing for attribution), the
  * relocate alternative on the same flags, and the full
  * retrain+rebuild. Recall@10 vs exact at nprobe=1/2 for
  * no-maintenance / grow / rebuild.
  *
  * Run: sbt "runMain graft.tools.GrowScaleProbe [nBase] [nDrift]"
  * (defaults 1000000 / 100000). Results in BASELINE.md. */
object GrowScaleProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(1000000)
    val nDrift = args.lift(1).map(_.toInt).getOrElse(100000)
    val dim = 32
    val k = 64
    val nQueries = 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
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
    val baseCenters = Array.fill(16)(unit())
    val driftCenters = Array.fill(2)(unit())
    val baseDf = (0 until nBase).map(i =>
        (i.toLong, around(baseCenters(i % 16), 0.15f)))
      .toDF("docid", "vector").repartition(32).localCheckpoint(true)
    val driftDf = (0 until nDrift).map(i =>
        (nBase + i.toLong, around(driftCenters(i % 2), 0.15f)))
      .toDF("docid", "vector").repartition(32).localCheckpoint(true)
    val allDf = baseDf.union(driftDf).localCheckpoint(true)

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[growscale] $label: $s%.2f s")
      (r, s)
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft_grow_scale").toString
    val (model, trainT) = time(s"train stored book (k=$k, sample)") {
      Ivf.train(baseDf, "vector", k = k, sampleSize = 16384)
    }
    val (_, buildT) = time(s"build base index ($nBase rows)") {
      IvfVectorIndex.build(baseDf, "vector", "docid", s"$root/idx", model)
    }
    val (_, appendT) = time(s"stored-book append ($nDrift novel rows)") {
      IvfVectorIndex.load(spark, s"$root/idx")
        .append(driftDf, "vector", "docid")
    }
    val loaded = IvfVectorIndex.load(spark, s"$root/idx")
    val (report, driftT) = time("drift report (detector)") {
      Ivf.drift(loaded.df.withColumnRenamed("vector", "v"),
        driftDf.withColumnRenamed("vector", "v"), "v", loaded.model)
        .collect()
    }
    val flags = report
      .filter(r => !r.isNullAt(3) && r.getLong(3) > 0.05 * nDrift &&
        !r.isNullAt(5) && r.getDouble(5) >= 0.5)
      .map(_.getInt(0)).toSeq.sorted
    println(s"[growscale] flagged clusters: $flags")

    // attribution: one standalone map-only capture-equivalent pass,
    // plus how widely the novel mass SCATTERED (the grow rewrite's
    // real cost driver: it rewrites every partition holding a mover)
    val (_, scanT) = time("one map-only full-lake assign pass " +
      "(the capture pass's cost class)") {
      Ivf.assign(loaded.df.withColumnRenamed("cluster", "__old"),
        "vector", loaded.model)
        .filter(col("cluster") =!= col("__old")).count()
    }
    val nTouched = loaded.df.filter(col("docid") >= nBase)
      .select("cluster").distinct().count()
    println(s"[growscale] novel mass scattered over $nTouched of $k " +
      "stored cells — the grow rewrite touches exactly these")

    val (grown, growT) = time(s"growClusters(${flags.size} flagged, " +
      "+2 cells) TOTAL") {
      loaded.growClusters(flags, add = 2)
    }
    val movers = grown.df
      .filter(col("cluster") >= k).count()
    println(s"[growscale] movers captured into new cells: $movers " +
      s"of ${nBase + nDrift}")

    // recall machinery (used before AND after the relocate timing)
    val queries = (0 until nQueries).map(q =>
      (q.toLong, around(driftCenters(q % 2), 0.15f)))
      .toDF("qid", "qvec").localCheckpoint(true)
    val truth = Knn.searchBatch(allDf, "vector", "docid",
      queries, "qvec", "qid", k = 10)
      .select(col("qid"), col("id")).localCheckpoint(true)
    def recall(ix: IvfVectorIndex, nprobe: Int): Double =
      truth.join(
        Ivf.searchBatch(ix.df, "vector", "docid", queries, "qvec",
          "qid", k = 10, ix.model, nprobe = nprobe)
          .select(col("qid"), col("id")),
        Seq("qid", "id")).count().toDouble / (nQueries * 10)

    // the relocate alternative on a fresh copy — no-maintenance
    // recall read from it BEFORE the relocate mutates it
    val (_, b2T) = time("(setup) rebuild copy for relocate timing") {
      val cp = IvfVectorIndex.build(baseDf, "vector", "docid",
        s"$root/idx2", model)
      cp.append(driftDf, "vector", "docid")
    }
    val noMaintRecall = Seq(1, 2).map(p =>
      p -> recall(IvfVectorIndex.load(spark, s"$root/idx2"), p)).toMap
    val (relocated, relocT) = time(
      s"retrainInPlace(${flags.size} flagged) — the relocate " +
      "alternative") {
      IvfVectorIndex.load(spark, s"$root/idx2")
        .retrainInPlace(flags, iters = 5)
    }
    // the rebuild alternative
    val (fullModel, ftrainT) = time(s"full retrain (k=${k + 2}) " +
      "over the union") {
      Ivf.train(allDf, "vector", k = k + 2, sampleSize = 16384)
    }
    val (full, fbuildT) = time("full rebuild (corpus shuffle + write)") {
      IvfVectorIndex.build(allDf, "vector", "docid", s"$root/full",
        fullModel)
    }
    println(f"[growscale] GROW total ${growT}%.2f s vs relocate " +
      f"${relocT}%.2f s vs rebuild ${ftrainT + fbuildT}%.2f s " +
      f"(capture-pass share of grow: ${scanT}%.2f s)")
    Seq(1, 2).foreach { p =>
      println(f"[growscale] recall@10 nprobe=$p: grow " +
        f"${recall(grown, p)}%.3f vs no-maintenance " +
        f"${noMaintRecall(p)}%.3f vs relocate " +
        f"${recall(relocated, p)}%.3f vs rebuild " +
        f"${recall(full, p)}%.3f")
    }
    buildT + appendT + driftT + b2T + trainT // silence unused
    spark.stop()
  }
}
