package graft.index

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Ivf

/** Codebook GROW for novel drift (r16, the r15 verdict's ask): when
  * incoming mass forms genuinely new modes, moving centroids costs
  * recall — [[IvfVectorIndex.growClusters]] instead adds new cells
  * with the OLD centroids frozen and captures movers lake-wide, so
  * assignment == routing for every row afterwards (the
  * self-consistency that makes stored-book IVF recall-robust). This
  * spec pins the semantics, the pruning (untouched partitions are
  * never rewritten), and the crash footprints of the grown staged
  * commit. */
class IvfGrowSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(23)
  private def around(dir: Int, n: Int, from: Long) =
    (0 until n).map { i =>
      (from + i, Array.tabulate(8)(d =>
        (if (d == dir) 1.0f else 0.0f) + rnd.nextFloat() * 0.15f))
    }

  private def freshIndex(tag: String): (String, IvfVectorIndex) = {
    val path = java.nio.file.Files
      .createTempDirectory(s"graft-ivfgrow-$tag").toString + "/idx"
    val ref = (around(0, 40, 0L) ++ around(2, 40, 100L) ++
      around(4, 40, 200L)).toDF("vec_id", "embedding")
    val model = Ivf.train(ref, "embedding", k = 3, sampleSize = 200)
    (path, IvfVectorIndex.build(ref, "embedding", "vec_id", path, model))
  }

  private def rows(path: String): Set[(Long, Int)] =
    spark.read.parquet(path).select("docid", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("grow adds cells for a novel mode: old centroids bit-frozen, " +
    "novel rows land whole in the new cell, untouched partitions " +
    "never rewritten, and assignment == routing for every row") {
    val (path, idx) = freshIndex("novel")
    val before = rows(path)
    // novel mass along axis 6 — far from all three stored centroids —
    // appended with the STORED book (the pruning contract), so it
    // lands in whichever old cell is nearest
    val novel = around(6, 50, 300L).toDF("vec_id", "embedding")
    idx.append(novel, "embedding", "vec_id")
    val loaded = IvfVectorIndex.load(spark, path)
    val novelHomes = loaded.df.filter(col("docid") >= 300L)
      .select("cluster").distinct().collect().map(_.getInt(0)).toSet
    // record mtimes of partitions that hold NO novel rows: grow must
    // not touch them
    val untouched = (0 until 3).filterNot(novelHomes)
    val mtBefore = untouched.map(c => c ->
      new java.io.File(s"$path/cluster=$c").lastModified()).toMap
    val grown = loaded.growClusters(novelHomes.toSeq, add = 1)
    assert(grown.model.centroids.length == 4, "codebook grew by one")
    // frozen book: the three old centroids are bit-identical
    (0 until 3).foreach { c =>
      assert(java.util.Arrays.equals(
        grown.model.centroids(c), loaded.model.centroids(c)),
        s"old centroid $c must not move")
    }
    // every novel row captured into the new cell — including any that
    // had landed in partitions OUTSIDE the flagged set
    val after = rows(path)
    val novelAfter = after.filter(_._1 >= 300L)
    assert(novelAfter.size == 50 && novelAfter.forall(_._2 == 3),
      s"novel rows must all live in the new cell: $novelAfter")
    // base rows keep their ids and clusters
    assert(after.filter(_._1 < 300L) == before)
    untouched.foreach { c =>
      assert(new java.io.File(s"$path/cluster=$c").lastModified() ==
        mtBefore(c), s"untouched partition cluster=$c was rewritten")
    }
    // self-consistency: every row's stored partition IS its nearest
    // patched centroid — assignment == routing, the recall invariant
    val stored = IvfVectorIndex.load(spark, path)
    val mismatch = Ivf.assign(
        stored.df.withColumnRenamed("cluster", "old"), "vector",
        stored.model)
      .filter(col("cluster") =!= col("old")).count()
    assert(mismatch == 0, s"$mismatch rows route away from their cell")
    // a query at the novel mode finds novel rows at nprobe=1
    val q = Array.tabulate(8)(d => if (d == 6) 1.0f else 0.0f)
    val top = stored.search(q, 5, nprobe = 1)
      .select("docid").as[Long].collect()
    assert(top.forall(id => id >= 300L), s"novel probe hit: ${top.toSeq}")
    // reload round-trips the grown codebook
    assert(IvfVectorIndex.load(spark, path).model.centroids.length == 4)
  }

  test("grow on an IVF+PQ index: codes ride the capture untouched " +
    "(content-addressed), searchAdc works against the grown book") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfgrow-pq").toString + "/idx"
    val ref = (around(0, 60, 0L) ++ around(2, 60, 100L))
      .toDF("vec_id", "embedding")
    val model = graft.operators.Ivf.train(ref, "embedding", k = 2,
      sampleSize = 200)
    val pq = graft.operators.Pq.train(ref, "embedding", m = 8, ksub = 16)
    IvfVectorIndex.build(ref, "embedding", "vec_id", path, model,
      Some(pq))
    val novel = around(6, 40, 300L).toDF("vec_id", "embedding")
    IvfVectorIndex.load(spark, path)
      .append(novel, "embedding", "vec_id")
    val codesBefore = spark.read.parquet(path)
      .select("docid", "code").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val loaded = IvfVectorIndex.load(spark, path)
    val homes = loaded.df.filter(col("docid") >= 300L)
      .select("cluster").distinct().collect().map(_.getInt(0)).toSeq
    val grown = loaded.growClusters(homes, add = 1)
    assert(grown.model.centroids.length == 3)
    assert(grown.pqModel.isDefined, "PQ book must survive the grow")
    // every row keeps its code byte-for-byte — codes are a function
    // of (vector, PQ book), not of the cluster id
    val codesAfter = spark.read.parquet(path)
      .select("docid", "code").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(codesAfter == codesBefore)
    // the two-phase ADC search probes the NEW cell and finds novel rows
    val q = Array.tabulate(8)(d => if (d == 6) 1.0f else 0.0f)
    val top = IvfVectorIndex.load(spark, path)
      .searchAdc(q, 5, nprobe = 1)
      .select("docid").collect().map(_.getLong(0))
    assert(top.nonEmpty && top.forall(_ >= 300L), top.toSeq.toString)
  }

  test("grow crash BEFORE the COMMIT marker: staging (with its new " +
    "cell and grown codebook) rolled back, index byte-identical") {
    val (path, _) = freshIndex("precommit")
    val before = rows(path)
    // footprint: staged new-cell data + a 4-row codebook, no marker
    spark.read.parquet(path).filter($"cluster" === 0)
      .withColumn("cluster", lit(3))
      .write.partitionBy("cluster").parquet(s"$path/_retrain/data")
    spark.read.parquet(s"$path/_centroids")
      .union(spark.read.parquet(s"$path/_centroids")
        .filter($"cluster" === 0).withColumn("cluster", lit(3)))
      .write.parquet(s"$path/_retrain/centroids")
    val idx = IvfVectorIndex.load(spark, path)
    assert(!new java.io.File(s"$path/_retrain").exists)
    assert(rows(path) == before)
    assert(idx.model.centroids.length == 3, "codebook must not grow")
  }

  test("grow crash AFTER the COMMIT marker: load rolls forward — the " +
    "NEW cell (no live twin to delete) and the grown codebook go live") {
    val (path, _) = freshIndex("committed")
    val before = rows(path)
    // footprint: a completed staging for a grow that moves cluster 0's
    // rows with docid >= 20 into new cell 3, plus the 4-row codebook,
    // COMMIT written — death before any promote rename
    val c0 = spark.read.parquet(path).filter($"cluster" === 0)
    val stay = c0.filter($"docid" < 20L)
    val move = c0.filter($"docid" >= 20L).withColumn("cluster", lit(3))
    stay.union(move)
      .write.partitionBy("cluster").parquet(s"$path/_retrain/data")
    spark.read.parquet(s"$path/_centroids")
      .union(spark.read.parquet(s"$path/_centroids")
        .filter($"cluster" === 0).withColumn("cluster", lit(3)))
      .write.mode("overwrite").parquet(s"$path/_retrain/centroids")
    new java.io.File(s"$path/_retrain/COMMIT").createNewFile()
    val recovered = IvfVectorIndex.load(spark, path)
    assert(!new java.io.File(s"$path/_retrain").exists, "staging reaped")
    assert(recovered.model.centroids.length == 4, "grown codebook live")
    val after = rows(path)
    assert(after.map(_._1) == before.map(_._1), "zero rows lost/added")
    assert(after.filter(_._2 == 3).nonEmpty, "new cell promoted")
    assert(after.filter(t => t._2 == 0 && t._1 >= 20L).isEmpty,
      "moved rows must not remain in the old cell")
  }
}
