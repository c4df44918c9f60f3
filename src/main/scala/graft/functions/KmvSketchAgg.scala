package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch as a BOUNDED-STATE native
  * aggregate: per group the state is the k smallest distinct hash
  * values — O(k) memory and a partial-aggregate (map-side combine)
  * plan, vs the window formulation that shuffles and SORTS every
  * distinct (group, value) pair. Returns
  * struct(kth_min_hash: bigint, n_in_sketch: int); the caller derives
  * the estimate (k-1)·2^60/kth (the input hash is 60-bit, cf.
  * [[graft.text.TextFunctions.hash60]]) or uses the exact count when
  * n_in_sketch < k.
  *
  * Replaces the reference-scale "count distinct subjects" probes
  * (/root/reference/src/sparql/QueryWriter.cpp:137-166) with a
  * mergeable sketch a 100 TB layer can afford.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "kmv_sketch needs k > 0")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k || v < buf.last()) {
      buf.add(v) // no-op on duplicates (set semantics = distinct)
      if (buf.size > k) buf.pollLast()
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.isEmpty) InternalRow(null, 0)
    else InternalRow(buf.last().longValue(), buf.size)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("kth_min_hash", LongType),
    StructField("n_in_sketch", IntegerType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** Same bounded k-minima state as [[KmvSketchAgg]], but eval returns
  * the full SORTED minima array — the mergeable face the KMV SET
  * OPERATIONS need (union = k smallest of the concatenated minima,
  * intersection via the standard ρ·est(U) inclusion estimator). Kept
  * a sibling so q66's struct face stays codegen-stable. */
case class KmvMinsAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "kmv_mins needs k > 0")
  private val inner = KmvSketchAgg(child, k)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    inner.createAggregationBuffer()
  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] =
    inner.update(buf, input)
  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    inner.merge(buf, other)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    inner.deserialize(bytes)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_mins"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinsAgg =
    copy(child = newChild)
}

object KmvSketchAgg {
  /** Column face: `kmvSketch(hashCol, k)` → struct(kth_min_hash,
    * n_in_sketch), usable directly in `agg(...)`. */
  def kmvSketch(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      KmvSketchAgg(org.apache.spark.sql.GraftSqlShim.expression(c), k)
        .toAggregateExpression())

  /** Column face: `kmvMins(hashCol, k)` → sorted array of the k
    * smallest distinct hashes. */
  def kmvMins(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      KmvMinsAgg(org.apache.spark.sql.GraftSqlShim.expression(c), k)
        .toAggregateExpression())
}
