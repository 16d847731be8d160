package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Dense HyperLogLog sketch (p=12 → 4096 registers, ~1.6% standard error).
  *
  * The reference's HLL type + approx_set/merge/cardinality surface:
  * SPI/type/HyperLogLogType.java, operator/aggregation/ApproximateSet
  * Aggregation.java, MergeHyperLogLogAggregation.java, operator/scalar/
  * HyperLogLogFunctions.java (airlift stats). We match RESULTS (estimates
  * within HLL error bounds), not airlift's wire format (SURVEY §7 risk
  * register: binary compatibility declared out of scope).
  *
  * Serialized form: 1 byte version tag + 4096 register bytes.
  */
final class HllSketch(val registers: Array[Byte]) extends Serializable {
  import HllSketch._

  def add(hash: Long): Unit = {
    val idx = (hash >>> (64 - P)).toInt
    val w = hash << P
    val rank = (if (w == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > registers(idx)) registers(idx) = rank.toByte
  }

  def merge(other: HllSketch): Unit = {
    var i = 0
    while (i < M) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
  }

  def cardinality(): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += 1.0 / (1L << registers(i))
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var e = alpha * M * M / sum
    if (e <= 2.5 * M && zeros > 0) {
      e = M * math.log(M.toDouble / zeros) // linear counting for small n
    }
    math.round(e)
  }

  def serialize(): Array[Byte] = {
    val out = new Array[Byte](1 + M)
    out(0) = 1 // version
    System.arraycopy(registers, 0, out, 1, M)
    out
  }
}

object HllSketch {
  val P = 12
  val M: Int = 1 << P

  def empty(): HllSketch = new HllSketch(new Array[Byte](M))

  def emptySerialized(): Array[Byte] = empty().serialize()

  def deserialize(bytes: Array[Byte]): HllSketch = {
    require(bytes.length == 1 + M && bytes(0) == 1, "bad HLL sketch encoding")
    val regs = new Array[Byte](M)
    System.arraycopy(bytes, 1, regs, 0, M)
    new HllSketch(regs)
  }
}

/** approx_set(x) → HLL sketch (binary). Buffer lives as a mutable sketch;
  * partial aggregation merges register-wise — the same partial/final split
  * Presto runs (AggregationNode.Step), so the shuffle carries one 4 KiB
  * sketch per group, not raw values. */
case class ApproxSetAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllSketch] {

  private lazy val hasher = XxHash64(Seq(child), 42L)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): HllSketch = HllSketch.empty()

  override def update(buf: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(hasher.eval(input).asInstanceOf[Long])
    buf
  }

  override def merge(buf: HllSketch, other: HllSketch): HllSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: HllSketch): Any = buf.serialize()

  override def serialize(buf: HllSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): HllSketch =
    HllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): ApproxSetAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ApproxSetAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "approx_set"
}

/** merge(hll_sketch_column) → combined sketch (MergeHyperLogLog
  * Aggregation.java). */
case class MergeHllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): HllSketch = HllSketch.empty()

  override def update(buf: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(HllSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: HllSketch, other: HllSketch): HllSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: HllSketch): Any = buf.serialize()

  override def serialize(buf: HllSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): HllSketch =
    HllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): MergeHllAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MergeHllAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "merge"
}
