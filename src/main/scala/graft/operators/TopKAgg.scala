package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native bounded TOP-K aggregate (SURVEY §3.2 "sorts/limits/top-k"
  * row, taken beyond the built-ins): per group, the k largest
  * (value, id) pairs, value DESC with id ASC tie-break — the
  * "top-N per group" every analytics surface needs, WITHOUT the
  * `row_number() OVER (PARTITION BY ...)` plan. WindowExec sorts every
  * group's FULL row set (a shuffle of the whole table followed by a
  * per-partition sort) just to throw away all but k rows; this
  * aggregate keeps a k-slot insertion buffer per group, combines
  * map-side (partial heaps merge before the exchange), and ships only
  * k pairs per group across the wire. At 100 TB: shuffle bytes drop
  * from O(rows) to O(groups × k) — the aggregation tree does the
  * discarding where the data lives.
  *
  * k is a plan-time literal capped at 1024: the buffer is O(k) per
  * group ON THE MAP SIDE (every group in flight holds one), so a
  * "top million" misuse must fail loudly at plan time, not OOM an
  * executor. Output: array<struct<val double, id bigint>> sorted
  * best-first.
  */
case class TopKAgg(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k > 0 && k <= 1024, s"k must be in [1, 1024], got $k")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  // typed construction ([[TopKAgg.topK]]) casts to (double, bigint) at
  // plan time; checkInputDataTypes rejects a raw-Expression caller's
  // mismatch at analysis instead of a mid-job executor ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (valueExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"value must be double (cast first), got ${valueExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"id must be bigint (cast first), got ${idExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("val", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      buf.insert(v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKAgg.Buf, b2: TopKAgg.Buf): TopKAgg.Buf = {
    var i = 0
    while (i < b2.n) { b1.insert(b2.vs(i), b2.ids(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = new GenericInternalRow(Array[Any](buf.vs(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      out.writeDouble(buf.vs(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKAgg.Buf(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {

  /** k-slot insertion buffer, kept sorted best-first. "Better" =
    * larger value, then smaller id — the deterministic tie-break the
    * oracle's `ORDER BY val DESC, id ASC` window replays. Insertion
    * sort beats a heap here: k is small, rows that don't beat the
    * current k-th (the common case on sorted-ish data) cost ONE
    * comparison, and the buffer doubles as the sorted output.
    */
  final class Buf(val k: Int) {
    val vs = new Array[Double](k)
    val ids = new Array[Long](k)
    var n = 0

    // TOTAL order via Double.compare — NaN sorts largest (matching
    // both Spark's and DuckDB's DESC ordering, so the window-replay
    // oracle agrees) instead of poisoning the buffer (IEEE > is false
    // in both directions for NaN, which would wedge a NaN in the last
    // slot and reject every later value, order-dependently)
    private def better(v1: Double, id1: Long, v2: Double, id2: Long): Boolean = {
      val c = java.lang.Double.compare(v1, v2)
      c > 0 || (c == 0 && id1 < id2)
    }

    def insert(v0: Double, id: Long): Unit = {
      // normalize -0.0 → +0.0: Double.compare splits the two, but SQL
      // ordering (both engines) treats them equal and falls to the id
      val v = if (v0 == 0.0) 0.0 else v0
      if (n == k) {
        if (!better(v, id, vs(n - 1), ids(n - 1))) return
        vs(n - 1) = v; ids(n - 1) = id
      } else {
        vs(n) = v; ids(n) = id; n += 1
      }
      var i = n - 1
      while (i > 0 && better(vs(i), ids(i), vs(i - 1), ids(i - 1))) {
        val tv = vs(i); vs(i) = vs(i - 1); vs(i - 1) = tv
        val ti = ids(i); ids(i) = ids(i - 1); ids(i - 1) = ti
        i -= 1
      }
    }
  }

  /** Column form usable in `groupBy(...).agg`. Int/decimal value and
    * int id columns are cast at plan time (Catalyst folds away the
    * no-op double→double / long→long casts).
    */
  def topK(value: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(
      Bridge.expression(value.cast("double")),
      Bridge.expression(id.cast("long")), k).toAggregateExpression())
}
