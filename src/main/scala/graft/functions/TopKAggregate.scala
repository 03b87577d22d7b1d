package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded max-heap buffer: keeps the k best (score desc, id asc) pairs.
  * Internally a min-heap ordered worst-first so eviction is O(log k). */
final class TopKBuffer(val k: Int) {
  // worst-first ordering: lower score first; on ties, larger id first
  // (so the kept winner on a tie is the smaller id — deterministic).
  private val ord: Ordering[(Double, Long)] = Ordering.fromLessThan {
    (a, b) => if (a._1 != b._1) a._1 > b._1 else a._2 < b._2
  }
  val heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()(ord)

  def add(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val worst = heap.head
      if (score > worst._1 || (score == worst._1 && id < worst._2)) {
        heap.dequeue(); heap.enqueue((score, id))
      }
    }
  }

  def merge(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, i) => add(s, i) }

  /** best-first: score desc, id asc. */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortWith((a, b) =>
      if (a._1 != b._1) a._1 > b._1 else a._2 < b._2)
}

/** topk_by_score(score, id, k) -> array<struct<score:double, id:bigint>>
  *
  * Scale-aware replacement for `Window.partitionBy(qid).orderBy(desc).
  * row_number <= k`: a window forces a full shuffle + per-partition sort of
  * ALL candidate rows; this aggregate keeps a bounded k-heap per group on
  * the map side, so only `numPartitions * k` rows per group cross the
  * shuffle. This is the multi-query batch-kNN kernel (the reference serves
  * only queries[0] — weaviate.py:177; we fix that limitation).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"topk k must be a literal int, got $other")
    }
    require(v >= 1, s"topk k must be >= 1, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false

  // analysis-time type check instead of blind runtime casts in update()
  // (ExpectsInputTypes is private[sql]; same effect by hand)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (score.dataType, id.dataType) match {
      case (org.apache.spark.sql.types.DoubleType,
            org.apache.spark.sql.types.LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint, int) arguments, got " +
          s"(${s.simpleString}, ${i.simpleString}); cast explicitly")
    }
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val arr = buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.heap.toArray
    out.writeInt(buf.k)
    out.writeInt(items.length)
    items.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt()
    val n = in.readInt()
    val buf = new TopKBuffer(kk)
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "topk_by_score"
}
