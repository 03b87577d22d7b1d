package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** HyperLogLog registers: m = 2^b bytes, max-merged. Associative and
  * commutative, so map-side partial aggregation is sound, and
  * yesterday's sketch max-merged with today's IS the union's sketch. */
final class HllBuffer(val b: Int) {
  val regs = new Array[Byte](1 << b)

  /** Bucket by low `b` "digits" of the mix, rho from the remaining
    * width. The register update is max(). */
  def add(hash: Long, width: Int): Unit = {
    val m = 1 << b
    val h = java.lang.Math.floorMod(hash, 1L << 30)
    val bucket = (h % m).toInt
    val w = h / m
    val rho =
      if (w == 0) width + 1
      else width - (63 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > regs(bucket)) regs(bucket) = rho.toByte
  }

  def merge(other: HllBuffer): Unit = {
    var i = 0
    while (i < regs.length) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
  }
}

/** hll_distinct(hash, b) -> struct<n_distinct:bigint, corrected:boolean>
  *
  * Mergeable distinct-count sketch (HyperLogLog, Flajolet et al.
  * 2007) over the SQL-PORTABLE integer mix ([[graft.operators
  * .Sampling.portableMix]], domain [0, 2^30)): 2^b one-byte registers
  * per group, the classic harmonic-mean estimate with the
  * linear-counting small-range correction (`corrected` says which
  * regime fired). Relative error ≈ 1.04/√m.
  *
  * The portable hash is the point: unlike xxhash sketches, an
  * external SQL engine can rebuild the EXACT register file and
  * estimate from scratch, so the estimator itself — bucket math, rho,
  * harmonic sum, correction branch — is oracle-checkable, not just
  * spec-checked statistically. The harmonic sum is computed as an
  * INTEGER (Σ 2^(W+1−M_j) — every term a power of two, exact in
  * BIGINT on both engines) so no float-summation-order difference can
  * move the estimate.
  *
  * Deployment shape at 100 TB: a fixed m-byte buffer per group,
  * map-side partials, only numPartitions·m bytes cross the shuffle
  * (a count-distinct shuffles every distinct value), and sketches
  * compose across batches/streams by register max. Beside
  * [[KmvDistinct]]: KMV gives exact counts below k and adapts its
  * memory; HLL is 64× smaller per group at the same error and
  * composes by fixed-size max-merge — the right choice when groups
  * are many and memory is the constraint. */
case class HllDistinct(
    hash: Expression,
    bExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {

  private lazy val b: Int = {
    val v = bExpr.eval(InternalRow.empty) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"hll_distinct: b must be an integer literal, got $other")
    }
    require(v >= 7 && v <= 16, s"hll_distinct: b=$v out of [7, 16]")
    v
  }
  /** Bits left for rho after the bucket: the mix domain is 2^30. */
  private lazy val width: Int = 30 - b

  override def children: Seq[Expression] = Seq(hash, bExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = HllDistinct.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (hash.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hll_distinct requires a bigint hash column " +
          s"(use the portable mix), got ${hash.dataType.simpleString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(b)

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    val h = hash.eval(input)
    if (h != null) buf.add(h.asInstanceOf[Long], width)
    buf
  }

  override def merge(buf: HllBuffer, other: HllBuffer): HllBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: HllBuffer): Any = {
    val m = 1 << b
    // integer harmonic sum: Σ 2^(W+1 − M_j); exponents in [0, W+1],
    // total < 2^(W+1+b) < 2^38 — exact in a long on any engine
    var intSum = 0L
    var zeros = 0
    var j = 0
    while (j < m) {
      val mj = buf.regs(j)
      intSum += 1L << (width + 1 - mj)
      if (mj == 0) zeros += 1
      j += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m * java.lang.Math.pow(2.0, width + 1) / intSum
    val (est, corrected) =
      if (raw <= 2.5 * m && zeros > 0)
        (m * java.lang.Math.log(m.toDouble / zeros), true)
      else (raw, false)
    new GenericInternalRow(Array[Any](java.lang.Math.round(est), corrected))
  }

  override def serialize(buf: HllBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + buf.regs.length)
    out(0) = buf.b.toByte
    System.arraycopy(buf.regs, 0, out, 1, buf.regs.length)
    out
  }

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.regs, 0, buf.regs.length)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), bExpr = newChildren(1))

  override def prettyName: String = "hll_distinct"
}

object HllDistinct {
  val schema: StructType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("corrected", BooleanType, nullable = false)))
}
