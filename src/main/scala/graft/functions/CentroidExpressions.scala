package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** nearest_centroid(vec) -> int: index of the centroid with the highest
  * cosine similarity to `vec` (ties break to the smaller index; a
  * vector whose dimension doesn't match the centroids yields null —
  * same contract as the cosine kernels).
  *
  * The centroid table rides inside the expression (IVF codebooks are
  * small — k ≤ a few thousand — and broadcast with the serialized plan),
  * so assignment is one tight k×dim loop per row instead of k separate
  * `cosine_sim` expressions feeding an argmax HOF (the interpreted-
  * lambda trap measured in round 1). */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "nearest_centroid: empty codebook")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  // null on dim mismatch even for non-null input
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.simpleString}")
  }

  // lazy: dataType is illegal on an unresolved child at construction
  // (analyzer copies the expression via withNewChildInternal mid-resolution)
  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // per-centroid L2 norms, precomputed once per (deserialized) expression
  @transient private lazy val norms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = centroids(0).length
    if (v.numElements() != dim) return null
    val x = new Array[Double](dim)
    var nx = 0.0
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      nx += x(i) * x(i)
      i += 1
    }
    if (nx == 0.0) return 0 // zero vector: every cosine is 0 → centroid 0
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var dot = 0.0
      i = 0
      while (i < dim) { dot += x(i) * cen(i); i += 1 }
      val score = if (norms(c) == 0.0) 0.0 else dot / (math.sqrt(nx) * norms(c))
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** centroid_cosine(vec) -> double: the cosine similarity to the vec's
  * NEAREST centroid — the quantization-quality signal behind codebook
  * drift detection ([[graft.operators.Ivf.drift]]): when new data
  * stops resembling the data the codebook was trained on, this score
  * sinks, and the retrain trigger fires on the fraction below the
  * reference band. Same k×dim tight loop and contracts as
  * [[NearestCentroid]] (dim mismatch → null, zero vector → 0.0). */
case class CentroidCosine(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty, "centroid_cosine: empty codebook")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "centroid_cosine"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.simpleString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val norms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i); i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = centroids(0).length
    if (v.numElements() != dim) return null
    val x = new Array[Double](dim)
    var nx = 0.0
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      nx += x(i) * x(i)
      i += 1
    }
    if (nx == 0.0) return 0.0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var dot = 0.0
      i = 0
      while (i < dim) { dot += x(i) * cen(i); i += 1 }
      val score = if (norms(c) == 0.0) 0.0 else dot / (math.sqrt(nx) * norms(c))
      if (score > bestScore) bestScore = score
      c += 1
    }
    bestScore
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
