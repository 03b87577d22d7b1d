package graft.functions

import graft.operators.{MediaFixtures, Tiff}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** jpeg_exif(bytes) -> struct<orientation:int, make:string,
  * model:string, datetime:string, exif_w:int, exif_h:int>: EXIF
  * triage from a JPEG's APP1 segment via the real TIFF IFD walk
  * ([[Tiff.parseExif]] — both byte orders, IFD0 + the Exif-private
  * sub-IFD). Orientation is the field image pipelines MUST read
  * before any pixel op. No-EXIF or dirty bytes → null. */
case class JpegExif(child: Expression) extends UnaryExpression {

  override def dataType: DataType = JpegExif.schema
  override def prettyName: String = "jpeg_exif"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    JpegExif.compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.JpegExif$$.MODULE$$.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object JpegExif {
  val schema: StructType = StructType(Seq(
    StructField("orientation", IntegerType, nullable = false),
    StructField("make", StringType, nullable = false),
    StructField("model", StringType, nullable = false),
    StructField("datetime", StringType, nullable = false),
    StructField("exif_w", IntegerType, nullable = false),
    StructField("exif_h", IntegerType, nullable = false)))

  /** The kernel; public so generated code can call it. Null = no EXIF. */
  def compute(bytes: Array[Byte]): GenericInternalRow =
    Tiff.parseExif(bytes) match {
      case Some(e) => new GenericInternalRow(Array[Any](
        e.orientation, UTF8String.fromString(e.make),
        UTF8String.fromString(e.model), UTF8String.fromString(e.dateTime),
        e.exifW, e.exifH))
      case None => null
    }
}

/** tiff_media_for_id(id) -> binary ([[MediaFixtures.tiffMediaFor]]). */
case class TiffMediaBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "tiff_media_for_id"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaFixtures.tiffMediaFor(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.operators.MediaFixtures$$.MODULE$$.tiffMediaFor($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** tiffpx_media_for_id(id) -> binary: FULLY pixel-decodable TIFF
  * ([[MediaFixtures.tiffPixelMediaFor]] — closed-form pixels through
  * gray/inverted-gray/RGB, none/PackBits, multi-strip, both byte
  * orders). */
case class TiffPixelMediaBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "tiffpx_media_for_id"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaFixtures.tiffPixelMediaFor(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.operators.MediaFixtures$$.MODULE$$.tiffPixelMediaFor($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** tiffext_media_for_id(id) -> binary: SEGMENTED-grammar TIFF
  * (tiled/planar/16-bit variants, [[MediaFixtures.tiffExtMediaFor]]). */
case class TiffExtMediaBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "tiffext_media_for_id"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaFixtures.tiffExtMediaFor(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.operators.MediaFixtures$$.MODULE$$.tiffExtMediaFor($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** g4_media_for_id(id) -> binary: EXTERNAL CCITT Group 4 fixture bytes
  * ([[graft.operators.G4Fixtures]] — real libtiff encodes, never
  * engine-written). */
case class G4MediaBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "g4_media_for_id"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    graft.operators.G4Fixtures.fileFor(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.operators.G4Fixtures$$.MODULE$$.fileFor($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** tiffjpeg_media_for_id(id) -> binary: JPEG-in-TIFF (Compression 7)
  * with a REAL decodable baseline JPEG strip
  * ([[MediaFixtures.tiffJpegFor]]). */
case class TiffJpegMediaBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "tiffjpeg_media_for_id"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaFixtures.tiffJpegFor(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.operators.MediaFixtures$$.MODULE$$.tiffJpegFor($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** jpeg_exif_media_for_id(id) -> binary
  * ([[MediaFixtures.jpegExifMediaFor]] — decodable JPEG + APP1). */
case class JpegExifMediaBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "jpeg_exif_media_for_id"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaFixtures.jpegExifMediaFor(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.operators.MediaFixtures$$.MODULE$$.jpegExifMediaFor($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
