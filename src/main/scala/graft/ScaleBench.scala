package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnLsh, HyperplaneLsh, Knn}

/** Scale probe: replicates the embeddings corpus N× (perturbed ids) to
  * measure kNN/ANN throughput well beyond the testdata row counts —
  * the "would this hold at 100×" check the small SFs can't give.
  * Not part of the driver contract; run manually:
  *
  * {{{ sbt "runMain graft.ScaleBench [replicas] [batchQueries]" }}}
  *
  * replicas=500 → 1M vectors; replicas=5000 → 10M vectors (the r2
  * probe). batchQueries sizes the batch-kNN fan-out (default 32; 1000
  * probes the many-query regime where the broadcast+heap plan must not
  * degrade into a window sort).
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(500)
    val batchQueries = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    val base = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n = base.count()
    // replicate with distinct ids; rotate vector values per replica so
    // buckets stay spread (slice-and-concat is a cheap deterministic mix)
    val big = base.crossJoin(
        spark.range(replicas).select(col("id").as("rep")))
      .select(
        (col("vec_id") + col("rep") * n).as("vec_id"),
        when(col("rep") % 2 === 0, col("embedding"))
          .otherwise(concat(slice(col("embedding"), 33, 32),
            slice(col("embedding"), 1, 32))).as("embedding"))
      .repartition(cpus.toInt)
      .cache()
    val total = big.count()
    println(s"corpus: $total vectors x 64 dims")

    val q = base.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.2f s (${total / s / 1e6}%.1f Mvec/s)")
      s
    }

    time("exact knn k=10 (cold)") {
      Knn.search(big, "embedding", "vec_id", q, 10).collect()
    }
    time("exact knn k=10 (warm)") {
      Knn.search(big, "embedding", "vec_id", q, 10).collect()
    }
    val queries = base.limit(batchQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    time(s"batch knn $batchQueries queries k=10") {
      Knn.searchBatch(big, "embedding", "vec_id", queries, "qvec", "qid", 10)
        .collect()
    }
    // storage-level pruning: the bucket-partitioned index skips unprobed
    // files entirely (a cached/in-memory filter cannot prune — it still
    // scans every row, which is why AnnLsh on a cached DF ties exact)
    val lsh = HyperplaneLsh(dim = 64, nbits = 8, seed = 42L)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-scale-lsh").toString
    time("build bucket-partitioned index (write)") {
      graft.index.LshVectorIndex.build(
        big, "embedding", "vec_id", idxDir, lsh)
    }
    val idx = graft.index.LshVectorIndex.load(spark, idxDir)
    // apples-to-apples: exact scan over the same on-disk parquet
    val flatDir = java.nio.file.Files
      .createTempDirectory("graft-scale-flat").toString
    big.write.mode("overwrite").parquet(flatDir)
    val flat = spark.read.parquet(flatDir)
    time("exact knn from parquet (no pruning)") {
      Knn.search(flat, "embedding", "vec_id", q, 10).collect()
    }
    time("ann search probes=1 (partition-pruned parquet)") {
      idx.search(q, 10, probes = 1).collect()
    }
    time("ann search probes=2") {
      idx.search(q, 10, probes = 2).collect()
    }

    // packed-binary layout: fixed-width blobs skip parquet array
    // assembly on every scan
    val packedDir = java.nio.file.Files
      .createTempDirectory("graft-scale-packed").toString
    big.select(col("vec_id"), Graft.packVector(col("embedding")).as("vec"))
      .write.mode("overwrite").parquet(packedDir)
    val packed = spark.read.parquet(packedDir)
    val qPacked = graft.functions.PackedVectors.packFloats(q)
    def knnPacked() = packed
      .select(col("vec_id"),
        Graft.cosineSimPacked(col("vec"), lit(qPacked)).as("score"))
      .orderBy(desc("score"), col("vec_id")).limit(10).collect()
    time("exact knn from parquet, PACKED binary (cold)") { knnPacked() }
    time("exact knn from parquet, PACKED binary (warm)") { knnPacked() }

    // product quantization: 8-byte codes (32x smaller than the floats);
    // the ADC scan touches only (vec_id, code) — measure both the
    // one-time encode and the per-query approximate scan
    val pq = operators.Pq.train(big, "embedding", m = 8, ksub = 256)
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft-scale-pq").toString
    time("pq encode 10M vectors -> 8-byte codes (write)") {
      operators.Pq.encode(big, "embedding", pq)
        .select("vec_id", "code")
        .write.mode("overwrite").parquet(pqDir)
    }
    val codes = spark.read.parquet(pqDir)
    def adcScan() = operators.Pq.adcScore(codes, "code", q, pq)
      .orderBy(desc("adc_score"), col("vec_id").asc).limit(50).collect()
    time("pq ADC scan from parquet, top-50 (cold)") { adcScan() }
    time("pq ADC scan from parquet, top-50 (warm)") { adcScan() }
    spark.stop()
  }
}
