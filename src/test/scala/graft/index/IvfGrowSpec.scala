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
    IvfVectorIndex.load(spark, path).df.select("docid", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  /** File mtimes of cluster `c` across every generation dir (r17
    * manifest layout). */
  private def clusterMtimes(path: String, c: Int): Seq[Long] =
    new java.io.File(path).listFiles()
      .filter(g => g.isDirectory && g.getName.startsWith("gen="))
      .flatMap { g =>
        val dir = new java.io.File(g, s"cluster=$c")
        if (dir.exists()) dir.listFiles().toSeq else Seq.empty
      }
      .filter(_.getName.endsWith(".parquet"))
      .map(_.lastModified).sorted.toSeq

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
    val mtBefore = untouched.map(c => c -> clusterMtimes(path, c)).toMap
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
      assert(clusterMtimes(path, c) == mtBefore(c),
        s"untouched partition cluster=$c was rewritten")
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
    val codesBefore = IvfVectorIndex.load(spark, path).df
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
    val codesAfter = IvfVectorIndex.load(spark, path).df
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

  test("grow crash BEFORE the manifest commit (r17): the staged " +
    "generation and grown book are orphans — index byte-identical, " +
    "orphans reaped by the next commit") {
    val (path, idx) = freshIndex("precommit")
    val before = rows(path)
    // footprint: the rewrite landed whole (new-cell data + a 4-row
    // book) but the JVM died before the manifest rename — nothing
    // references either
    idx.df.filter($"cluster" === 0)
      .withColumn("cluster", lit(3))
      .write.partitionBy("cluster")
      .parquet(s"$path/gen=g-0000000099")
    spark.read.parquet(s"$path/_books/b-0000000001/centroids")
      .union(spark.read.parquet(s"$path/_books/b-0000000001/centroids")
        .filter($"cluster" === 0).withColumn("cluster", lit(3)))
      .write.parquet(s"$path/_books/b-0000000099/centroids")
    val recovered = IvfVectorIndex.load(spark, path)
    assert(rows(path) == before, "the index must be byte-identical")
    assert(recovered.model.centroids.length == 3,
      "codebook must not grow")
    // a query can never see the orphan (the manifest IS the index)
    assert(recovered.count() == before.size)
    // the next commits reap the orphans (retention window = 3)
    (0 until 3).foreach(_ =>
      IvfVectorIndex.load(spark, path).compact())
    assert(!new java.io.File(s"$path/gen=g-0000000099").exists,
      "orphan generation reaped")
    assert(!new java.io.File(s"$path/_books/b-0000000099").exists,
      "orphan book reaped")
  }

  test("the manifest commit is the SINGLE visibility point (r17): " +
    "once it lands, the grown snapshot is whole — rows, dropped old " +
    "partitions, and codebook together; there is no roll-forward " +
    "window to repair") {
    val (path, idx) = freshIndex("atomic")
    val before = rows(path)
    // a real grow (public API), then prove load needs NOTHING beyond
    // the manifest: no staging dirs, no markers, no pending state
    val novel = around(6, 30, 300L).toDF("vec_id", "embedding")
    idx.append(novel, "embedding", "vec_id")
    val loaded = IvfVectorIndex.load(spark, path)
    val homes = loaded.df.filter(col("docid") >= 300L)
      .select("cluster").distinct().collect().map(_.getInt(0)).toSeq
    val grown = loaded.growClusters(homes, add = 1)
    assert(grown.model.centroids.length == 4)
    val residue = new java.io.File(path).listFiles().map(_.getName)
      .filter(n => n.contains("retrain") || n.contains("COMMIT") ||
        n.contains("pending"))
    assert(residue.isEmpty, s"no staging residue may remain: " +
      residue.toSeq.toString)
    val after = rows(path)
    assert(after.filter(_._1 < 300L) == before, "base rows unmoved")
    assert(after.filter(_._1 >= 300L).forall(_._2 == 3),
      "novel rows live in the new cell")
    assert(IvfVectorIndex.load(spark, path).model.centroids.length == 4)
  }
}
