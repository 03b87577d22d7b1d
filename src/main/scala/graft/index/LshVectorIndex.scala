package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnLsh, HyperplaneLsh, Knn}

/** Vector index stored *partitioned by LSH bucket* — the storage-level
  * ANN layout for 100 TB corpora.
  *
  * The reference's HNSW graph (weaviate.py:26) is a single-node
  * in-memory structure; the Spark-native equivalent of "don't touch
  * most of the data" is Hive-style partition pruning: vectors land in
  * `bucket=<id>/` directories at write time, and a search reads ONLY
  * the probed buckets — visible as `PartitionFilters` in the scan, with
  * unprobed files never opened. With `nbits` hyperplanes the corpus
  * splits into 2^nbits partitions, each a self-contained brute-force
  * problem; multi-probe trades recall vs files read.
  */
class LshVectorIndex private (
    val spark: SparkSession,
    val path: String,
    val lsh: HyperplaneLsh) {

  def df: DataFrame = spark.read.parquet(path)

  /** Exact top-k inside the probed buckets (approximate overall; probes
    * = nbits degrades gracefully to exact full-scan). */
  def search(queryVec: Array[Float], k: Int, probes: Int = 1): DataFrame = {
    val buckets = lsh.probeSet(queryVec, probes)
    Knn.search(df.filter(col("bucket").isin(buckets: _*)),
      "vector", "docid", queryVec, k)
  }

  def count(): Long = df.count()
}

object LshVectorIndex {

  /** Build from (docid, vector, …) rows: assign buckets, write
    * partitioned. `maxRecordsPerFile` keeps any hot bucket from
    * producing a single giant file. */
  def build(
      docs: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      lsh: HyperplaneLsh,
      maxRecordsPerFile: Long = 5000000L): LshVectorIndex = {
    val spark = docs.sparkSession
    AnnLsh.bucketize(docs, vecCol, lsh)
      .withColumnRenamed(vecCol, "vector")
      .withColumnRenamed(idCol, "docid")
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .parquet(path)
    new LshVectorIndex(spark, path, lsh)
  }

  def load(spark: SparkSession, path: String, lsh: HyperplaneLsh): LshVectorIndex =
    new LshVectorIndex(spark, path, lsh)
}
