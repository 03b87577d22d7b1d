package graft.functions

import graft.operators.{MediaFixtures, Sitemap, Zstd}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** zstd_meta(bytes) -> struct<content_size, has_content_size,
  * window_size, dict_id, has_checksum, skippable>: RFC 8878 frame-
  * header triage — declared size, window budget, dictionary
  * requirement, checksum flag, leading skippable frames counted
  * ([[Zstd.parse]]; block CONTENT is the documented codec seam).
  * Dirty bytes → null. */
case class ZstdMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ZstdMeta.schema
  override def prettyName: String = "zstd_meta"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ZstdMeta.compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.ZstdMeta$$.MODULE$$.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ZstdMeta {
  val schema: StructType = StructType(Seq(
    StructField("content_size", LongType, nullable = false),
    StructField("has_content_size", BooleanType, nullable = false),
    StructField("window_size", LongType, nullable = false),
    StructField("dict_id", LongType, nullable = false),
    StructField("has_checksum", BooleanType, nullable = false),
    StructField("skippable", IntegerType, nullable = false)))

  /** The kernel; public so generated code can call it. Null = no parse. */
  def compute(bytes: Array[Byte]): GenericInternalRow =
    Zstd.parse(bytes) match {
      case Some(m) => new GenericInternalRow(Array[Any](
        m.contentSize, m.hasContentSize, m.windowSize, m.dictId,
        m.hasChecksum, m.skippableFrames))
      case None => null
    }
}

/** zst_media_for_id(id) -> binary ([[MediaFixtures.zstMediaFor]]). */
case class ZstMediaBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "zst_media_for_id"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaFixtures.zstMediaFor(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.operators.MediaFixtures$$.MODULE$$.zstMediaFor($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** sitemap_entries(text) -> array<struct<loc, lastmod, priority>>:
  * sitemaps.org urlset/sitemapindex extraction — entity decoding,
  * CDATA, per-entry blocks, the 0.5 priority default ([[Sitemap
  * .parse]]). Dirty input → null. */
case class SitemapEntries(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(SitemapEntries.entrySchema, containsNull = false)
  override def prettyName: String = "sitemap_entries"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SitemapEntries.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.SitemapEntries$$.MODULE$$.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SitemapEntries {
  val entrySchema: StructType = StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = false),
    StructField("priority", DoubleType, nullable = false)))

  /** The kernel; public so generated code can call it. Null = no parse. */
  def compute(text: UTF8String): GenericArrayData =
    Sitemap.parse(text.toString) match {
      case Some(p) =>
        val rows = new Array[Any](p.entries.length)
        var i = 0
        while (i < p.entries.length) {
          val e = p.entries(i)
          rows(i) = new GenericInternalRow(Array[Any](
            UTF8String.fromString(e.loc), UTF8String.fromString(e.lastmod),
            e.priority))
          i += 1
        }
        new GenericArrayData(rows)
      case None => null
    }
}

/** sitemap_media_for_id(id) -> string ([[MediaFixtures
  * .sitemapMediaFor]] — urlset / sitemapindex cycling). */
case class SitemapMediaText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "sitemap_media_for_id"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      MediaFixtures.sitemapMediaFor(input.asInstanceOf[Long]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.operators.MediaFixtures$$.MODULE$$.sitemapMediaFor($c))")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
