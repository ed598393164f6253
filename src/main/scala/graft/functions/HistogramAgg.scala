package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** TypedImperativeAggregate (the mutable-buffer sketch API, SURVEY.md §2B
  * UDAF row / guide "for aggregates: TypedImperativeAggregate"): a
  * fixed-width histogram over `[lo, hi)` with `nBuckets` buckets.
  *
  * The buffer is a bounded long array regardless of group size —
  * map-side partials merge with one vector add, so a 100 TB scan ships
  * `nBuckets` longs per partition per group, nothing more. Bucketing rule
  * (floor((v - lo) / width), clamped into range) is plain IEEE double
  * arithmetic, reproducible in ANSI SQL for the oracle.
  */
case class HistogramAgg(
    child: Expression,
    lo: Double,
    hi: Double,
    nBuckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(nBuckets > 0 && hi > lo)
  private val width = (hi - lo) / nBuckets

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_histogram"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBuckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Number].doubleValue()
      var idx = math.floor((d - lo) / width).toInt
      if (idx < 0) idx = 0
      if (idx >= nBuckets) idx = nBuckets - 1
      buf(idx) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBuckets) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nBuckets)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nBuckets)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramAgg =
    copy(child = newChildren.head)
}
