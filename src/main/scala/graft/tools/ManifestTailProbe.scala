package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{IvfVectorIndex, Manifests}
import graft.operators.Ivf

/** The MANIFEST-TAIL cost of streamed appends (r17): under the
  * snapshot storage every delivered batch commits one generation, so
  * an uncompacted ingest stream grows three things linearly with the
  * batch count — the snapshot's file count (the classic small-file
  * tax), the manifest's part-line count, and the per-query listing
  * set a reader must resolve. This probe measures all three against
  * the batch count, then shows ONE compact folding them back to the
  * ideal, i.e. why `IndexStream.ingestIvf(compactEvery =
  * IngestStream.AutoCompact)` is the shipped cadence.
  *
  * Run: sbt "runMain graft.tools.ManifestTailProbe [nBase] [batches]"
  * (defaults 50000 / 200). Results in BASELINE.md. */
object ManifestTailProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(50000)
    val batches = args.lift(1).map(_.toInt).getOrElse(200)
    val batchRows = 200
    val dim = 32
    val k = 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def around(c: Array[Float], s: Float): Seq[Float] =
      c.map(x => x + s * rnd.nextGaussian().toFloat).toSeq
    val centers = Array.fill(12)(unit())
    val baseDf = (0 until nBase).map(i =>
        (i.toLong, around(centers(i % 12), 0.15f)))
      .toDF("docid", "vector").repartition(32).localCheckpoint(true)

    val root = java.nio.file.Files
      .createTempDirectory("graft_manifest_tail").toString
    val model = Ivf.train(baseDf, "vector", k = k, sampleSize = 16384)
    var idx = IvfVectorIndex.build(
      baseDf, "vector", "docid", s"$root/idx", model)
    val q = around(centers(0), 0.15f).toArray

    def measure(label: String): Unit = {
      val m = Manifests.require(spark, s"$root/idx")
      val (files, _) = idx.storageFootprint()
      val t0 = System.nanoTime()
      val n = idx.df.count() // resolve manifest + list + scan
      val resolveScan = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      idx.search(q, 10, nprobe = 2).collect()
      val searchS = (System.nanoTime() - t1) / 1e9
      println(f"[manifesttail] $label%-18s parts=${m.parts.size}%5d " +
        f"files=$files%5d rows=$n%7d df.count=$resolveScan%6.2f s " +
        f"search=$searchS%5.2f s")
    }

    measure("after build")
    var t0 = System.nanoTime()
    (0 until batches).foreach { b =>
      val batch = (0 until batchRows).map(i =>
          (nBase + b.toLong * batchRows + i,
            around(centers((b + i) % 12), 0.15f)))
        .toDF("docid", "vector")
      idx = idx.append(batch, "vector", "docid")
      if ((b + 1) % 50 == 0) {
        println(f"[manifesttail] ...$b%4d appends, " +
          f"${(System.nanoTime() - t0) / 1e9}%6.1f s cumulative append")
        measure(s"after ${b + 1} appends")
      }
    }
    println(f"[manifesttail] shouldCompact: ${idx.shouldCompact()}")
    t0 = System.nanoTime()
    idx = idx.compact()
    println(f"[manifesttail] compact: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    measure("after compact")
    spark.stop()
  }
}
