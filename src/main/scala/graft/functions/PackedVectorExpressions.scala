package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Packed vector storage: a dim-d float vector as a 4·d-byte binary
  * blob (little-endian IEEE754).
  *
  * Parquet `array<float>` pays per-element assembly (offsets,
  * definition levels, object headers) on every scan; a fixed-width
  * BINARY column decodes as one byte-array copy and scores via direct
  * unsafe reads — the layout a columnar vector engine uses internally.
  * `ScaleBench` measures the scan-speed difference; both layouts are
  * first-class (`pack_vector` / `unpack_vector` convert).
  */
object PackedVectors {
  def pack(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      Platform.putFloat(out, Platform.BYTE_ARRAY_OFFSET + i * 4L, arr.getFloat(i))
      i += 1
    }
    out
  }
}

/** pack_vector(array<float>) -> binary. */
case class PackVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_vector"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PackedVectors.pack(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.PackedVectors.pack($a)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** unpack_vector(binary) -> array<float>. */
case class UnpackVector(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "unpack_vector"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length / 4
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = Platform.getFloat(bytes, Platform.BYTE_ARRAY_OFFSET + i * 4L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** cosine_sim_packed(binary, binary) -> double — the packed-layout twin
  * of [[CosineSimilarity]]: identical math (double accumulation in
  * array order), reads floats straight out of the blob. */
case class CosineSimPacked(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_packed"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length) / 4
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val off = Platform.BYTE_ARRAY_OFFSET + i * 4L
      val xi = Platform.getFloat(x, off).toDouble
      val yi = Platform.getFloat(y, off).toDouble
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
      val yi = ctx.freshName("yi"); val off = ctx.freshName("off")
      val P = "org.apache.spark.unsafe.Platform"
      s"""
        int $n = Math.min($a.length, $b.length) / 4;
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          long $off = $P.BYTE_ARRAY_OFFSET + $i * 4L;
          double $xi = (double) $P.getFloat($a, $off);
          double $yi = (double) $P.getFloat($b, $off);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        ${ev.value} = ($nx == 0.0 || $ny == 0.0)
          ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
