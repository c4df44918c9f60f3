package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter runtime prefilter, from scratch: a bounded-size bitset
  * built by a native partial aggregate over the small join side, then
  * applied to the big probe side as a codegen'd predicate BEFORE its
  * shuffle. The filter is a fixed few hundred KB whatever the side
  * sizes — the knob that turns a corpus-wide shuffle into a
  * matches-sized one when the build side is too large to broadcast but
  * far more selective than the probe. False positives only ever let
  * extra rows THROUGH to the exact join, so results stay exact.
  * Same public pattern as Spark's own runtime row-level filtering
  * (spark.sql.optimizer.runtime.bloomFilter.*), re-implemented here as
  * an explicit, oracle-checkable operator.
  */
object BloomFilter {

  /** splitmix64 finalizer — the bit mixer (public constant set). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Double hashing: bit index of probe i for key v over m bits. */
  private def bitPos(v: Long, i: Int, m: Int): Int = {
    val h1 = mix64(v)
    val h2 = mix64(v ^ 0x5851F42D4C957F2DL) | 1L
    (((h1 + i * h2) % m + m) % m).toInt
  }

  def set(bits: Array[Long], v: Long, numHashes: Int): Unit = {
    val m = bits.length * 64
    var i = 0
    while (i < numHashes) {
      val p = bitPos(v, i, m)
      bits(p >> 6) |= 1L << (p & 63)
      i += 1
    }
  }

  /** Called from generated code — keep signature JVM-primitive. */
  def mightContain(bits: Array[Long], numHashes: Int, v: Long): Boolean = {
    val m = bits.length * 64
    var i = 0
    while (i < numHashes) {
      val p = bitPos(v, i, m)
      if ((bits(p >> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }
}

/** Builds the bitset over a LongType key column. Partial-aggregable
  * (map-side build, OR-merge), O(numBits) state. */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")
  require(numHashes > 0)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a bigint key, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilter.set(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomFilter.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomFilter.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomFilter.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** Membership probe against a DRIVER-RESOLVED filter (the one-row
  * aggregate result — a few hundred KB). The deserialized bitset rides
  * the expression as a codegen reference object; the hot path is one
  * static call per row inside whole-stage codegen — same technique as
  * Spark's BloomFilterMightContain. */
case class BloomMightContain(filter: Array[Byte], numHashes: Int,
    child: Expression) extends UnaryExpression {

  @transient private lazy val bits: Array[Long] = BloomFilter.fromBytes(filter)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a bigint key, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    BloomFilter.mightContain(bits, numHashes, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BloomFilter.mightContain($ref, $numHashes, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
