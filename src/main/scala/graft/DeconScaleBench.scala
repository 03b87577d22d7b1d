package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Decontaminate

/** Decontamination scale probe: a replicated multi-million-doc train
  * side against a benchmark-sized eval window, measuring both serving
  * shapes — the inverted shingle join (pair evidence, broadcast test
  * side) and the stateless set-based filter (the streaming-ingest
  * shape). Not part of the driver contract; run manually:
  *
  * {{{ sbt "runMain graft.DeconScaleBench [replicas]" }}}
  */
object DeconScaleBench {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val nDocs = docs0.count()
    val big = docs0.crossJoin(
        spark.range(replicas).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * nDocs).as("doc_id"), col("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-scale-decon").toString
    big.write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    println(s"train corpus: ${corpus.count()} docs")
    // benchmark-sized eval window (50 original docs)
    val bench = docs0.filter(col("doc_id") >= 450 && col("doc_id") < 500)
      .select(col("doc_id"), col("text"))
    println(s"benchmark: ${bench.count()} docs")

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.2f s")
      s
    }

    time("overlaps: inverted shingle join, broadcast test side (cold)") {
      println("  pairs: " + Decontaminate.overlaps(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 5, minHits = 2).count())
    }
    val set = Decontaminate.benchmarkShingles(bench, "doc_id", "text", 5)
    println(s"benchmark shingle set: ${set.size}")
    time("cleanWithSet: stateless per-row expression (cold)") {
      println("  kept: " + Decontaminate.cleanWithSet(
        corpus, "text", set, n = 5, minHits = 1).count())
    }
    time("cleanWithSet (warm)") {
      Decontaminate.cleanWithSet(corpus, "text", set, 5, 1).count()
    }
    spark.stop()
  }
}
