package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass multi-column mode aggregate — the
  * TypedImperativeAggregate successor of [[ArrayModeAggregator]] (same
  * semantics, same tie-break). The typed `Aggregator`/udaf path costs
  * ~2 µs/row in encoder round-trips and immutable-map churn; this
  * version mutates java.util.HashMap buffers in place and serializes
  * them only at shuffle boundaries with a flat length-prefixed layout.
  * At the 100 TB design point the mode aggregation is the whole shuffle
  * of a Lloyd iteration, so this is the hot aggregate of the engine.
  *
  * Tie-break (count DESC, value ASC) compares values as UTF8String
  * (binary/code-point order) — identical to DuckDB's UTF-8 string
  * ordering used by the oracle.
  */
case class ModeArrayAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[java.util.HashMap[UTF8String, Long]]] {

  type Buf = Array[java.util.HashMap[UTF8String, Long]]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_mode_array"

  override def createAggregationBuffer(): Buf = Array.empty

  private def ensure(buf: Buf, n: Int): Buf =
    if (buf.length >= n) buf
    else Array.tabulate(n)(i =>
      if (i < buf.length) buf(i) else new java.util.HashMap[UTF8String, Long]())

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = ensure(buffer, n)
    var i = 0
    while (i < n) {
      // clone: the UTF8String may point into a reused UnsafeRow buffer
      val key =
        if (arr.isNullAt(i)) ArrayModeAggregator.NullSentinelUtf8
        else arr.getUTF8String(i).clone()
      b(i).put(key, b(i).getOrDefault(key, 0L) + 1L)
      i += 1
    }
    b
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val b = ensure(b1, b2.length)
    var i = 0
    while (i < b2.length) {
      val it = b2(i).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        b(i).put(e.getKey, b(i).getOrDefault(e.getKey, 0L) + e.getValue)
      }
      i += 1
    }
    b
  }

  override def eval(buffer: Buf): Any = {
    if (buffer.isEmpty) return null
    val out = new Array[Any](buffer.length)
    var i = 0
    while (i < buffer.length) {
      var bestV: UTF8String = null
      var bestC = -1L
      val it = buffer(i).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > bestC || (c == bestC && e.getKey.compareTo(bestV) < 0)) {
          bestC = c; bestV = e.getKey
        }
      }
      out(i) = bestV
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach { m =>
      out.writeInt(m.size())
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val bytes = e.getKey.getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
        out.writeLong(e.getValue)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    Array.fill(n) {
      val m = new java.util.HashMap[UTF8String, Long]()
      var entries = in.readInt()
      while (entries > 0) {
        val len = in.readInt()
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        m.put(UTF8String.fromBytes(bytes), in.readLong())
        entries -= 1
      }
      m
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ModeArrayAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ModeArrayAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ModeArrayAgg =
    copy(child = newChildren.head)
}

object ModeArrayAgg {
  /** Column form usable in `groupBy(...).agg`. */
  def modeArray(features: Column): Column =
    Bridge.column(ModeArrayAgg(Bridge.expression(features)).toAggregateExpression())
}
