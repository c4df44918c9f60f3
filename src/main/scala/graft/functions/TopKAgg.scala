package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.Comparator
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group top-k as a BOUNDED-STATE native aggregate: the state is
  * the k best (ord, tie) pairs under (ord DESC, tie ASC) — O(k) memory
  * with map-side partial aggregation, vs the window formulation
  * (row_number + filter) that shuffles and SORTS every row of every
  * group. At 100 TB the window plan's per-group sort is the cost; this
  * aggregate's exchange carries at most k rows per (partition, group).
  *
  * `tie` must be unique within the group (the same contract a
  * deterministic row_number needs — a total order wants a unique key);
  * duplicate (ord, tie) pairs collapse. Returns the pairs as a sorted
  * array<struct<ord,tie>> for the caller to posexplode into ranks.
  */
case class TopKAgg(
    ord: Expression,
    tie: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, "top_k needs k > 0")

  override def left: Expression = ord
  override def right: Expression = tie

  // ord DESC, tie ASC — explicit compares (no negation: Long.MinValue)
  private object cmp extends Comparator[(Long, Long)] with Serializable {
    override def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](cmp)

  private def insert(buf: java.util.TreeSet[(Long, Long)], p: (Long, Long)): Unit =
    if (buf.size < k) buf.add(p)
    else if (cmp.compare(p, buf.last()) < 0) { buf.add(p); buf.pollLast() }

  override def update(buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val o = ord.eval(input)
    val t = tie.eval(input)
    if (o != null && t != null)
      insert(buf, (o.asInstanceOf[Long], t.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { val p = it.next(); out(i) = InternalRow(p._1, p._2); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); out.writeLong(p._1); out.writeLong(p._2) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("tie", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(ord = newLeft, tie = newRight)
}

object TopKAgg {
  /** Column face: `topK(ordCol, tieCol, k)` → sorted
    * array<struct<ord,tie>> (ord DESC, tie ASC), usable in `agg(...)`. */
  def topK(ord: Column, tie: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      TopKAgg(org.apache.spark.sql.GraftSqlShim.expression(ord),
        org.apache.spark.sql.GraftSqlShim.expression(tie), k)
        .toAggregateExpression())
}
