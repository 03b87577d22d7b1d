package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for vector math over `array<float>` /
  * `array<double>` columns.
  *
  * These are the engine's equivalent of the reference's delegated vector
  * kernel (Weaviate's cosine HNSW scoring, weaviate.py:26 `distance: cosine`;
  * score post-processing `1 - d`, weaviate.py:17-20). Implemented as
  * `BinaryExpression`s with `doGenCode` so they stay inside whole-stage
  * codegen — no UDF boxing on the hot path of a 100 TB scan.
  *
  * All accumulation is double-precision and strictly sequential in array
  * order, so results are deterministic and match a DuckDB oracle computing
  * the same reduction.
  */
private[functions] object VectorTypeSupport {
  def isVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  def isFloatElem(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Java getter snippet for element i of an ArrayData of this type. */
  def getter(dt: DataType, arr: String, i: String): String =
    if (isFloatElem(dt)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  def check(name: String, types: Seq[DataType]): TypeCheckResult =
    if (types.forall(isVector)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float> or array<double> arguments, got " +
        types.map(_.simpleString).mkString(", "))
}

/** cosine_sim(a, b) -> double in [-1, 1]; 0.0 for a zero vector.
  * Mismatched vector lengths yield NULL — scoring the common prefix of
  * a wrong-dimension query would be a quietly wrong answer. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorTypeSupport._
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // null on dim mismatch even for non-null inputs
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, Seq(left.dataType, right.dataType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = isFloatElem(left.dataType); val rf = isFloatElem(right.dataType)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xi = ${getter(left.dataType, a, i)};
            double $yi = ${getter(right.dataType, b, i)};
            $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
          }
          ${ev.value} = ($nx == 0.0 || $ny == 0.0)
            ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot_product(a, b) -> double. Equal to cosine similarity when both sides
  * are L2-normalized — the cheap path the reference never takes
  * (it always recomputes full cosine server-side).
  * Mismatched vector lengths yield NULL (see [[CosineSimilarity]]). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorTypeSupport._
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // null on dim mismatch even for non-null inputs
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, Seq(left.dataType, right.dataType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = isFloatElem(left.dataType); val rf = isFloatElem(right.dataType)
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += ${getter(left.dataType, a, i)} * ${getter(right.dataType, b, i)};
          }
          ${ev.value} = $dot;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2_norm(a) -> double. */
case class L2Norm(child: Expression)
    extends UnaryExpression {
  import VectorTypeSupport._
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"
  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, Seq(child.dataType))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val f = isFloatElem(child.dataType)
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      val xi = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      s += xi * xi; i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      s"""
        double $s = 0.0;
        for (int $i = 0; $i < $a.numElements(); $i++) {
          double $xi = ${getter(child.dataType, a, i)}; $s += $xi * $xi;
        }
        ${ev.value} = Math.sqrt($s);
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
