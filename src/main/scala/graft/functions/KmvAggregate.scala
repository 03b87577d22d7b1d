package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bounded k-minimum-values buffer over UNSIGNED 64-bit hash order.
  * A sorted set of the k smallest distinct hashes seen; merge is set
  * union re-capped at k — associative and commutative, so map-side
  * partial aggregation is sound. */
final class KmvBuffer(val k: Int) {
  // unsigned order via the sign-flip trick: (h ^ Long.MinValue) makes
  // signed compares behave as unsigned compares of h
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(hash: Long): Unit = {
    val key = hash ^ Long.MinValue
    if (set.size < k) { set.add(key); () }
    else if (key < set.last()) {
      if (set.add(key)) { set.remove(set.last()); () }
    }
  }

  def merge(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) {
      val key = it.next().longValue()
      if (set.size < k) { set.add(key); () }
      else if (key < set.last()) {
        if (set.add(key)) { set.remove(set.last()); () }
      }
    }
  }
}

/** kmv_distinct(hash, k) -> struct<n_distinct:bigint, exact:boolean>
  *
  * Mergeable distinct-count sketch (k-minimum-values, Bar-Yossef et
  * al. 2002): keeps the k smallest distinct 64-bit hashes per group.
  * Two regimes, explicitly flagged:
  *
  *  - fewer than k distinct hashes seen → the buffer IS the distinct
  *    hash set and `n_distinct` is EXACT (modulo 64-bit collisions —
  *    ~n²/2⁶⁵, irrelevant below billions of rows); `exact = true`.
  *  - at k capacity → the classic KMV estimate
  *    `(k−1) / fraction-of-keyspace-covered-by-the-kth-minimum`;
  *    `exact = false`. Unbiased, relative error ≈ 1/√(k−2).
  *
  * Deployment shape at 100 TB: a bounded O(k) buffer per group that
  * partially aggregates map-side (only numPartitions·k hashes cross
  * the shuffle — a groupBy-count-distinct shuffles EVERY distinct
  * value), merges associatively across any partitioning, and — unlike
  * a count — composes over time: yesterday's sketch + today's sketch
  * = the union's sketch. Callers hash with the codegen'd builtin
  * (`kmv_distinct(xxhash64(col), k)`). */
case class KmvDistinct(
    hash: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"kmv_distinct: k must be an integer literal, got $other")
    }
    require(v >= 16 && v <= (1 << 22), s"kmv_distinct: k=$v out of [16, 4M]")
    v
  }

  override def children: Seq[Expression] = Seq(hash, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = KmvDistinct.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (hash.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct requires a bigint hash column " +
          s"(use xxhash64(col)), got ${hash.dataType.simpleString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hash.eval(input)
    if (h != null) buf.add(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val n = buf.set.size
    if (n < k) new GenericInternalRow(Array[Any](n.toLong, true))
    else {
      // kth minimum as a fraction of the unsigned keyspace: stored
      // keys are sign-flipped (key = h ^ MIN_VALUE), so the unsigned
      // magnitude of h is key + 2^63
      val kthUnsignedAsDouble =
        buf.set.last().longValue().toDouble + math.pow(2.0, 63)
      val frac = kthUnsignedAsDouble / math.pow(2.0, 64)
      val est = math.round((k - 1).toDouble / frac)
      new GenericInternalRow(Array[Any](est, false))
    }
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.set.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  val schema: StructType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("exact", BooleanType, nullable = false)))
}
