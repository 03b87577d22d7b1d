package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries summary: at most k counters plus the total decremented
  * mass (`err`). `err == 0` ⇔ every counter is an EXACT frequency. */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()
  var err: Long = 0L

  def add(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + 1)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      // decrement-all: the classic MG step (amortized O(1) — each
      // global decrement is paid for by k prior arrivals)
      err += 1
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1)
      }
    }
  }

  /** Mergeable-summaries merge (Agarwal et al. 2012): add counters,
    * then if over k survivors subtract the (k+1)-th largest count
    * from everyone and drop the non-positive. */
  def merge(other: MgBuffer): Unit = {
    err += other.err
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > k) {
      val values = new Array[Long](counts.size)
      val vit = counts.values().iterator()
      var i = 0
      while (vit.hasNext) { values(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(values)
      val cut = values(values.length - k - 1) // (k+1)-th largest
      err += cut
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
  }
}

/** heavy_hitters(item, k) ->
  * struct<exact:boolean, err:bigint, items:array<struct<item:string,
  * count:bigint>>>
  *
  * Mergeable heavy-hitters sketch (Misra-Gries 1982; mergeability per
  * Agarwal et al. 2012). The 100 TB frequency question — "which
  * tokens/domains/urls dominate?" — without shuffling every distinct
  * value: each partition keeps ≤ k counters, merges are associative,
  * and only numPartitions·k counters cross the exchange.
  *
  * Guarantees, surfaced honestly in the output:
  *  - `err` is the total decremented mass; every reported count is a
  *    LOWER bound within `err` of the true frequency, and any item
  *    with true frequency > err is guaranteed present;
  *  - `exact = (err == 0)`: when the distinct universe fits in k
  *    (per partition and across merges), the summary IS the exact
  *    frequency table — the regime the DuckDB oracle checks; the
  *    estimator regime's guarantee is spec-verified.
  *
  * Items are reported count-desc, item-asc — deterministic under
  * exactness and under any fixed err. */
case class HeavyHitters(
    item: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"heavy_hitters: k must be an integer literal, got $other")
    }
    require(v >= 1 && v <= (1 << 20), s"heavy_hitters: k=$v out of [1, 1M]")
    v
  }

  override def children: Seq[Expression] = Seq(item, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHitters.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (item.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters requires a string item column, " +
          s"got ${item.dataType.simpleString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: MgBuffer): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else a._1 < b._1
    }
    val rows = new Array[Any](sorted.length)
    i = 0
    while (i < sorted.length) {
      rows(i) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(sorted(i)._1), sorted(i)._2))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      buf.err == 0L, buf.err, new GenericArrayData(rows)))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeLong(buf.err)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    buf.err = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.counts.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {
  val schema: StructType = StructType(Seq(
    StructField("exact", BooleanType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
      containsNull = false), nullable = false)))
}
