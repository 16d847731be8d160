package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto-exact `checksum` (ChecksumAggregationFunction.java): the state is
  * the WRAPPING SUM of `typeHash(v) * PRIME64` per row, a NULL row adds
  * PRIME64 alone; zero rows yield NULL (NullableLongState stays null). The
  * output is the state long's 8 bytes in Slice order (little-endian) as
  * VARBINARY — `to_hex(checksum(0))` is `'0000000000000000'` because
  * AbstractLongType.hash(0) is 0.
  *
  * Per-type hashes follow the SPI exactly:
  *  - integral/date: AbstractLongType.hash / AbstractIntType.hash — the
  *    xxhash64 finalizer mix `rotl(v · C2B2AE3D27D4EB4F, 31) ·
  *    9E3779B185EBCA87` (AbstractLongType.java:130);
  *  - boolean: 1231 / 1237 (BooleanType.java:100);
  *  - double/real: the mix over `doubleToLongBits` (DoubleType.java:77),
  *    float via the int mix of its bits (RealType extends AbstractIntType);
  *  - short decimal: the mix over the unscaled long;
  *  - varchar/varbinary: XXH64 (seed 0) over the raw bytes — the Slice
  *    hash VarcharType.java:121 delegates to.
  */
case class PrestoChecksum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val PRIME64 = 0x9E3779B185EBCA87L

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  private def mix(v: Long): Long =
    java.lang.Long.rotateLeft(v * 0xC2B2AE3D27D4EB4FL, 31) * PRIME64

  private def hashValue(v: Any): Long = v match {
    case l: Long => mix(l)
    case i: Int => mix(i.toLong)
    case s: Short => mix(s.toLong)
    case b: Byte => mix(b.toLong)
    case b: Boolean => if (b) 1231L else 1237L
    case d: Double => mix(java.lang.Double.doubleToLongBits(d))
    case f: Float => mix(java.lang.Float.floatToIntBits(f).toLong)
    case d: org.apache.spark.sql.types.Decimal if d.precision <= 18 =>
      mix(d.toUnscaledLong)
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
    case a: Array[Byte] =>
      XXH64.hashUnsafeBytes(a, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        a.length, 0L)
    case other => // complex types: stable fallback over the string form
      val b = UTF8String.fromString(String.valueOf(other))
      XXH64.hashUnsafeBytes(b.getBaseObject, b.getBaseOffset, b.numBytes, 0L)
  }

  // state(0) = wrapping sum; state(1) = 1 once any row was seen
  override def createAggregationBuffer(): Array[Long] = Array(0L, 0L)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    buf(0) += (if (v == null) PRIME64 else hashValue(v) * PRIME64)
    buf(1) = 1L
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    buf(0) += other(0)
    buf(1) |= other(1)
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(1) == 0L) null
    else {
      val out = new Array[Byte](8)
      var v = buf(0)
      var i = 0
      while (i < 8) { out(i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
      out // little-endian: Slice.writeLong order
    }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(buf(0)).putLong(buf(1))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array(bb.getLong(), bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PrestoChecksum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PrestoChecksum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PrestoChecksum =
    copy(child = newChildren.head)
}
