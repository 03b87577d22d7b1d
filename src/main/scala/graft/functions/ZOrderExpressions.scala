package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** `z_value(x, y)` → BIGINT: Morton (Z-order) interleave of the low
  * 21 bits of two non-negative longs — bit i of x lands at position
  * 2i, bit i of y at 2i+1, so points close in BOTH dimensions are
  * close on the curve. The multi-dimensional clustering key behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`: sort-or-range-partition by
  * this key and every output file gets a small bounding box in BOTH
  * columns, which is what min/max file skipping needs (a single-
  * column sort gives perfect pruning on one dimension and none on
  * the other).
  *
  * Pure bit arithmetic (no lookup tables), so an external SQL oracle
  * re-derives every key; 21+21 bits keeps the result well under
  * 2^63. Negative inputs or values needing more than 21 bits → null
  * (the dirty-input contract: out-of-domain rows drop out of the
  * layout rather than folding into wrong buckets). */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "z_value"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) | (IntegerType, LongType) |
           (LongType, IntegerType) | (IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires integral inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a match { case i: Int => i.toLong; case l: Long => l }
    val y = b match { case i: Int => i.toLong; case l: Long => l }
    ZValue.interleave(x, y)
  }

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object zr = graft.functions.ZValue$$.MODULE$$.interleave((long) $a, (long) $b);
      ${ev.isNull} = zr == null;
      if (!${ev.isNull}) ${ev.value} = ((Long) zr).longValue();""")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object ZValue {
  final val Bits = 21
  private final val Max = (1L << Bits) - 1

  /** The kernel; boxed so out-of-domain inputs can return null.
    * Public so generated code can call it. */
  def interleave(x: Long, y: Long): java.lang.Long = {
    if (x < 0 || y < 0 || x > Max || y > Max) return null
    var z = 0L
    var i = 0
    while (i < Bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    java.lang.Long.valueOf(z)
  }
}
