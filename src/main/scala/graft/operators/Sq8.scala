package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

import graft.functions.{Sq8Cosine, Sq8Encode, Sq8Model, VectorMinMax}

/** Scalar (int8) vector quantization — the third member of the
  * compression family next to [[Pq]] (32×, coarse) and the packed
  * binary sign vectors (([[graft.functions.PackVector]]) 32×,
  * coarsest): 4× smaller than float32 at near-full recall, the faiss
  * `SQ8` workhorse used when memory matters but PQ's codebook recall
  * loss doesn't pay. Per-dimension affine codes:
  * code_i = round((v_i − min_i)/scale_i), scale_i = (max_i − min_i)/255.
  *
  * Unlike the sampled PQ/IVF codebooks (engine-side artifacts the
  * oracle receives as aux dumps), SQ8's training statistic is the
  * exact per-dimension corpus min/max — ONE [[VectorMinMax]] partial
  * aggregate (map-side dim-length buffers, row×dim never crosses the
  * shuffle) that an external SQL engine re-derives verbatim, so the
  * whole pipeline (train → encode → ADC search) is oracle-checkable
  * with no aux at all.
  *
  * Shape at 100 TB: training is one aggregate; encoding is a pure
  * map riding the scan (4× smaller index storage); search is the
  * asymmetric-distance scan ([[graft.functions.Sq8Cosine]], codegen'd
  * — query exact, corpus dequantized on the fly, no decode
  * materialization) into a bounded TakeOrdered top-k. */
object Sq8 {

  /** Exact per-dimension (min, scale) from the full corpus. */
  def train(df: DataFrame, vecCol: String): Sq8Model = {
    val row = df.agg(Shim.column(
      VectorMinMax(Shim.expression(col(vecCol))).toAggregateExpression())
      .as("mm")).head().getStruct(0)
    val mins = row.getSeq[Double](0).toArray
    val maxs = row.getSeq[Double](1).toArray
    Sq8Model(mins, maxs.zip(mins).map { case (mx, mn) => (mx - mn) / 255.0 })
  }

  /** Add the `code` binary column (dim bytes per row). */
  def encode(df: DataFrame, vecCol: String, m: Sq8Model): DataFrame =
    df.withColumn("code",
      Shim.column(Sq8Encode(Shim.expression(col(vecCol)), m)))

  /** ADC top-k over encoded vectors: (idCol, score), score = cosine
    * of the exact query against the dequantized code, rounded to 6
    * decimals, ordered score desc / id asc. */
  def search(
      encoded: DataFrame,
      codeCol: String,
      idCol: String,
      query: Array[Float],
      k: Int,
      m: Sq8Model): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    encoded
      .select(col(idCol),
        Shim.column(Sq8Cosine(Shim.expression(col(codeCol)), m,
          query.map(_.toDouble))).as("__s"))
      .orderBy(desc("__s"), col(idCol))
      .limit(k)
      .select(col(idCol), round(col("__s"), 6).as("score"))
  }
}
