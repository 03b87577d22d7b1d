package graft.functions

import graft.operators.{MediaFixtures, Pdf}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** pdf_text(bytes) -> struct<npages:int, text:string>: real PDF text
  * extraction — xref table → catalog → page-tree walk → FlateDecode
  * content streams → Tj/'/"/TJ interpretation with line-move newlines
  * ([[Pdf.text]]). One parse serves both fields. Encrypted files,
  * xref streams, and non-Flate filters are out of subset → null, as
  * are dirty bytes. */
case class PdfText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PdfText.schema
  override def prettyName: String = "pdf_text"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PdfText.compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.PdfText$$.MODULE$$.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PdfText {
  val schema: StructType = StructType(Seq(
    StructField("npages", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** The kernel; public so generated code can call it. Null = no parse. */
  def compute(bytes: Array[Byte]): GenericInternalRow =
    Pdf.extract(bytes) match {
      case Some((n, t)) => new GenericInternalRow(Array[Any](
        n, UTF8String.fromString(t)))
      case None => null
    }
}

/** pdf_media_for_id(id) -> binary ([[MediaFixtures.pdfMediaFor]] —
  * complete spec-valid PDFs, Flate on odd ids). */
case class PdfMediaBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pdf_media_for_id"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaFixtures.pdfMediaFor(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.operators.MediaFixtures$$.MODULE$$.pdfMediaFor($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
