package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise running sum of fixed-dimension vectors. `sums` is
  * allocated lazily from the first vector seen (the aggregate works for
  * any dimension without declaring it). */
final class VecSumBuffer(var sums: Array[Double], var count: Long) {
  def add(arr: ArrayData, isFloat: Boolean): Unit = {
    val n = arr.numElements()
    if (sums == null) sums = new Array[Double](n)
    require(sums.length == n,
      s"vector_avg: dimension mismatch (${sums.length} vs $n)")
    var i = 0
    while (i < n) {
      sums(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    count += 1
  }

  def merge(other: VecSumBuffer): Unit = {
    if (other.sums != null) {
      if (sums == null) { sums = other.sums; count = other.count }
      else {
        require(sums.length == other.sums.length,
          s"vector_avg: dimension mismatch (${sums.length} vs ${other.sums.length})")
        var i = 0
        while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
        count += other.count
      }
    }
  }
}

/** vector_avg(vec array<float|double>) -> array<double>: the elementwise
  * mean — the centroid aggregation of IVF/k-means pipelines.
  *
  * Scale shape: the `posexplode → groupBy(label, pos) → avg` formulation
  * multiplies every row ×dim BEFORE the shuffle (64× the corpus through
  * the exchange at dim 64). This aggregate keeps one dim-length double
  * buffer per group on the map side (partial aggregation), so the
  * shuffle carries `partitions × groups` buffers — independent of row
  * count. Null vectors are skipped; an all-null/empty group yields null.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] {

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): VecSumBuffer =
    new VecSumBuffer(null, 0L)

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], isFloat)
    buf
  }

  override def merge(buf: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: VecSumBuffer): Any = {
    if (buf.count == 0L) return null
    val out = new Array[Any](buf.sums.length)
    var i = 0
    while (i < buf.sums.length) { out(i) = buf.sums(i) / buf.count; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    val n = if (buf.sums == null) -1 else buf.sums.length
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val count = in.readLong()
    val n = in.readInt()
    if (n < 0) new VecSumBuffer(null, count)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = in.readDouble(); i += 1 }
      new VecSumBuffer(sums, count)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "vector_avg"
}
