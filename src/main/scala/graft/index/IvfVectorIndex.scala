package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Knn}

/** Vector index stored *partitioned by IVF cluster* — the k-means twin
  * of [[LshVectorIndex]], same 100 TB storage story: vectors land in
  * `cluster=<id>/` directories at write time, and a search reads ONLY
  * the `nprobe` probed clusters (Hive partition pruning — unprobed
  * files are never opened). Unlike the hyperplane buckets, IVF cells
  * follow the data distribution, so probing the nearest cells gives
  * better recall per file read on clustered corpora (the usual case for
  * embedding spaces).
  *
  * The codebook is persisted next to the data (`_centroids/`, an
  * underscore-prefixed dir the partition reader ignores) so `load`
  * searches with exactly the centroids the index was built with —
  * floats round-trip bit-exact through parquet. */
class IvfVectorIndex private (
    val spark: SparkSession,
    val path: String,
    val model: Ivf.Model) {

  def df: DataFrame = spark.read.parquet(path)

  /** Exact top-k inside the probed clusters (approximate overall;
    * nprobe = k clusters degrades gracefully to exact full-scan). */
  def search(queryVec: Array[Float], k: Int, nprobe: Int = 1): DataFrame = {
    val probes = model.nearest(queryVec, nprobe)
    Knn.search(df.filter(col("cluster").isin(probes: _*)),
      "vector", "docid", queryVec, k)
  }

  def count(): Long = df.count()
}

object IvfVectorIndex {

  /** Build from (docid, vector, …) rows with a trained codebook. */
  def build(
      docs: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      model: Ivf.Model,
      maxRecordsPerFile: Long = 5000000L): IvfVectorIndex = {
    val spark = docs.sparkSession
    Ivf.assign(docs, vecCol, model)
      .withColumnRenamed(vecCol, "vector")
      .withColumnRenamed(idCol, "docid")
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("cluster")
      .parquet(path)
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_centroids")
    new IvfVectorIndex(spark, path, model)
  }

  /** Open an index, recovering the persisted codebook. */
  def load(spark: SparkSession, path: String): IvfVectorIndex = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_centroids")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) throw new IndexNotFoundException(
      s"No IVF codebook at $path/_centroids")
    val rows = spark.read.parquet(s"$path/_centroids")
      .orderBy("cluster").collect()
    val centroids = rows.map(_.getSeq[Float](1).toArray)
    new IvfVectorIndex(spark, path, Ivf.Model(centroids))
  }
}
