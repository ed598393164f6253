package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded key→count map buffers for UNGROUPED aggregation — the
  * device that lets a "count per key then collect the whole table"
  * model-state pass ride an `observe`/CollectMetrics node on a corpus
  * materialization job instead of being its own groupBy + collect job
  * (each extra job costs a full plan + codegen + schedule round trip,
  * which dominates these bounded collects: measured 0.29–0.40 s per
  * boundedCollect at sf0.1 for a 931-row result).
  *
  * The buffer is capped at `maxKeys` DISTINCT keys: one key past the
  * cap poisons the buffer (poison survives merge) and eval returns
  * NULL — the caller's signal to fall back to its distributed path,
  * exactly the `boundedCollect(cap + 1)`/overflow contract. Counts for
  * keys already in the map keep accumulating regardless, so a
  * non-overflowed result is always exact.
  */
private[functions] final class CountMapBuffer[K](val maxKeys: Int)
    extends Serializable {
  val m = new java.util.HashMap[K, Long]()
  var poisoned = false

  def add(k: K, n: Long): Unit = if (!poisoned) {
    val prev = m.get(k)
    if (prev == 0L && !m.containsKey(k) && m.size() >= maxKeys) {
      poisoned = true
      m.clear()
    } else m.put(k, prev + n)
  }

  def mergeFrom(o: CountMapBuffer[K]): Unit = {
    if (o.poisoned) { poisoned = true; m.clear() }
    else if (!poisoned) {
      val it = o.m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); add(e.getKey, e.getValue) }
    }
  }
}

private[functions] trait CountMapAggBase[K]
    extends TypedImperativeAggregate[CountMapBuffer[K]] {
  def child: Expression
  def maxKeys: Int
  def keyDataType: DataType
  protected def writeKey(out: DataOutputStream, k: K): Unit
  protected def readKey(in: DataInputStream): K
  protected def sqlKey(k: K): Any

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType =
    MapType(keyDataType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): CountMapBuffer[K] =
    new CountMapBuffer[K](maxKeys)

  override def merge(a: CountMapBuffer[K], b: CountMapBuffer[K]): CountMapBuffer[K] = {
    a.mergeFrom(b); a
  }

  override def eval(buf: CountMapBuffer[K]): Any =
    if (buf.poisoned) null
    else {
      val n = buf.m.size()
      val ks = new Array[Any](n)
      val vs = new Array[Any](n)
      val it = buf.m.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next()
        ks(i) = sqlKey(e.getKey)
        vs(i) = e.getValue
        i += 1
      }
      new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
    }

  override def serialize(buf: CountMapBuffer[K]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.poisoned)
    out.writeInt(buf.m.size())
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      writeKey(out, e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMapBuffer[K] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new CountMapBuffer[K](maxKeys)
    buf.poisoned = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val k = readKey(in)
      buf.m.put(k, in.readLong())
      i += 1
    }
    buf
  }
}

/** `graft_elem_counts(arr)` -> map<string,bigint> | null: occurrence
  * counts of every array ELEMENT across all rows (null elements
  * skipped), capped at `maxKeys` distinct elements (overflow → null).
  * The observe-riding form of `explode(arr) → groupBy → count` for the
  * bigram-LM type table.
  */
case class ElemCountMapAgg(
    child: Expression,
    maxKeys: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends CountMapAggBase[String] {
  require(maxKeys > 0, s"ElemCountMapAgg needs maxKeys > 0, got $maxKeys")

  override def keyDataType: DataType = StringType
  override def prettyName: String = "graft_elem_counts"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string>, got ${other.catalogString}")
    }

  override def update(buf: CountMapBuffer[String], input: InternalRow)
      : CountMapBuffer[String] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) buf.add(arr.getUTF8String(i).toString, 1L)
        i += 1
      }
    }
    buf
  }

  // Length-prefixed UTF-8, not writeUTF: writeUTF throws
  // UTFDataFormatException past 65535 encoded bytes, so one pathological
  // key (an unbroken base64 blob token) under the cap would crash the
  // checkpoint job instead of staying exact.
  override protected def writeKey(out: DataOutputStream, k: String): Unit = {
    val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(b.length)
    out.write(b)
  }
  override protected def readKey(in: DataInputStream): String = {
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }
  override protected def sqlKey(k: String): Any = UTF8String.fromString(k)

  override def withNewMutableAggBufferOffset(newOffset: Int): ElemCountMapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ElemCountMapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ElemCountMapAgg =
    copy(child = newChildren.head)
}

/** `graft_key_counts(k)` -> map<bigint,bigint> | null: row counts per
  * BIGINT key (null keys skipped), capped at `maxKeys` distinct keys
  * (overflow → null). The observe-riding form of `groupBy(k).count()`
  * for the decile bucket histogram.
  */
case class LongCountMapAgg(
    child: Expression,
    maxKeys: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends CountMapAggBase[java.lang.Long] {
  require(maxKeys > 0, s"LongCountMapAgg needs maxKeys > 0, got $maxKeys")

  override def keyDataType: DataType = LongType
  override def prettyName: String = "graft_key_counts"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects BIGINT, got ${other.catalogString}")
    }

  override def update(buf: CountMapBuffer[java.lang.Long], input: InternalRow)
      : CountMapBuffer[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) buf.add(java.lang.Long.valueOf(v.asInstanceOf[Long]), 1L)
    buf
  }

  override protected def writeKey(out: DataOutputStream, k: java.lang.Long): Unit =
    out.writeLong(k.longValue())
  override protected def readKey(in: DataInputStream): java.lang.Long =
    java.lang.Long.valueOf(in.readLong())
  override protected def sqlKey(k: java.lang.Long): Any = k.longValue()

  override def withNewMutableAggBufferOffset(newOffset: Int): LongCountMapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongCountMapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongCountMapAgg =
    copy(child = newChildren.head)
}
