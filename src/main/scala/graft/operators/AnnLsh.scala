package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Graft

/** Random-hyperplane LSH bucketing for approximate cosine kNN — the
  * sub-linear scale path next to [[Knn]]'s exact brute force.
  *
  * The reference delegates ANN to a single-node HNSW graph
  * (weaviate.py:26 `vectorIndexConfig`), which has no distributed
  * equivalent in Spark's execution model. The Spark-native analogue is
  * *partition pruning*: assign every vector a bucket from `nbits` signed
  * random hyperplanes (SimHash-for-vectors — bucket collision probability
  * is `1 - θ/π` per bit), store the table partitioned/clustered by
  * bucket, and search only the query's bucket ± multi-probe neighbors.
  * On a bucket-partitioned Parquet/bucketed table the `bucket IN (...)`
  * predicate prunes file groups at plan time — executors never read the
  * rest of the corpus.
  *
  * Hyperplanes are seeded-deterministic so bucketing is reproducible
  * across sessions (SURVEY §7.4 determinism rule).
  */
case class HyperplaneLsh(dim: Int, nbits: Int = 8, seed: Long = 42L) {
  require(nbits <= 30, "nbits must fit an int bucket")

  /** Deterministic N(0,1) hyperplanes. */
  val planes: Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nbits)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Bucket id of a vector column: bit j = sign(vec · plane_j). */
  def bucket(vec: Column): Column =
    (0 until nbits).map { j =>
      when(Graft.dotProduct(vec, typedlit(planes(j))) > 0d, 1 << j)
        .otherwise(0)
    }.reduce(_ + _).cast("int")

  /** Bucket id of a single query vector (driver-side, same math). */
  def bucketOf(v: Array[Float]): Int =
    (0 until nbits).map { j =>
      val d = planes(j).zip(v).map { case (a, b) => a.toDouble * b.toDouble }.sum
      if (d > 0) 1 << j else 0
    }.sum

  /** Buckets within Hamming distance ≤ `probes` of the query's bucket
    * (multi-probe LSH: recovers most of the recall lost to boundary
    * splits at a cost of probing nbits extra buckets per flipped bit). */
  def probeSet(v: Array[Float], probes: Int): Seq[Int] = {
    val b0 = bucketOf(v)
    var acc = Set(b0)
    (1 to probes).foreach { _ =>
      acc = acc ++ acc.flatMap(b => (0 until nbits).map(j => b ^ (1 << j)))
    }
    acc.toSeq.sorted
  }
}

object AnnLsh {

  /** Add the LSH `bucket` column (write this partitioned/clustered by
    * `bucket` to get scan pruning at search time). */
  def bucketize(df: DataFrame, vecCol: String, lsh: HyperplaneLsh): DataFrame =
    df.withColumn("bucket", lsh.bucket(col(vecCol)))

  /** Approximate top-k: scan only the probed buckets, exact cosine
    * re-rank inside them. With `probes = nbits` this degrades gracefully
    * to exact search. */
  def search(
      bucketized: DataFrame,
      vecCol: String,
      idCol: String,
      queryVec: Array[Float],
      k: Int,
      lsh: HyperplaneLsh,
      probes: Int = 1): DataFrame = {
    val buckets = lsh.probeSet(queryVec, probes)
    Knn.search(
      bucketized.filter(col("bucket").isin(buckets: _*)),
      vecCol, idCol, queryVec, k)
  }
}
