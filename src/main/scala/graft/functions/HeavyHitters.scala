package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary with `capacity` counters.
  *
  * The frequent-items sketch of the Presto family (approx_most_frequent
  * (buckets, value, capacity) — post-0.206 reference surface; the sketch
  * itself is the classic MG84). Guarantees: every true count is
  * underestimated by at most N/(capacity+1); any value with frequency
  * above that bound is retained. When the number of distinct values never
  * exceeds `capacity` the summary is EXACT — the property the oracle query
  * pins. Merge = counter sum, then decrement by the (capacity+1)-largest
  * count (standard mergeable-summary construction), so partial/final
  * aggregation ships `capacity` counters per group regardless of input
  * size.
  *
  * Keys are Catalyst internal values of the child type (UTF8String copied
  * on store — eval hands back reused buffers); serialization supports
  * string and integral keys.
  */
final class MgSummary(val capacity: Int) extends Serializable {
  val counts = new java.util.HashMap[Any, Long]()

  def add(key: Any, n: Long): Unit = {
    val cur = counts.get(key)
    if (cur != 0L || counts.containsKey(key)) counts.put(key, cur + n)
    else if (counts.size < capacity) counts.put(key, n)
    else decrementAll(n)
  }

  /** Misra–Gries eviction: subtract n from every counter, dropping ≤0. */
  private def decrementAll(n: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= n) it.remove() else e.setValue(e.getValue - n)
    }
  }

  def merge(other: MgSummary): Unit = {
    other.counts.forEach { (k, v) =>
      val cur = counts.get(k)
      if (cur != 0L || counts.containsKey(k)) counts.put(k, cur + v)
      else counts.put(k, v)
    }
    if (counts.size > capacity) {
      // keep the top `capacity` by decrementing with the (capacity+1)-th count
      val vals = new Array[Long](counts.size)
      var i = 0
      val it = counts.values().iterator()
      while (it.hasNext) { vals(i) = it.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1)
      decrementAll(cut)
    }
  }

  /** Top `buckets` entries, (count desc, key asc) — deterministic. */
  def top(buckets: Int): Seq[(Any, Long)] = {
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq
      .sortBy { case (k, v) => (-v, String.valueOf(k)) }
      .take(buckets)
  }
}

/** approx_most_frequent(buckets, value, capacity) → map<value, bigint>. */
case class ApproxMostFrequentAgg(
    child: Expression,
    buckets: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] {

  require(buckets > 0 && capacity >= buckets,
    "approx_most_frequent requires 0 < buckets <= capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case s: UTF8String => s.copy() // eval reuses backing buffers
        case other => other
      }
      buf.add(key, 1L)
    }
    buf
  }

  override def merge(buf: MgSummary, other: MgSummary): MgSummary = {
    buf.merge(other); buf
  }

  override def eval(buf: MgSummary): Any = {
    val entries = buf.top(buckets)
    new ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        entries.map(_._1).toArray),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        entries.map(_._2).toArray))
  }

  override def serialize(buf: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counts.size)
    buf.counts.forEach { (k, v) =>
      k match {
        case s: UTF8String =>
          val b = s.getBytes
          out.writeByte(0); out.writeInt(b.length); out.write(b)
        case l: Long => out.writeByte(1); out.writeLong(l)
        case i: Int => out.writeByte(2); out.writeInt(i)
        case other => throw new UnsupportedOperationException(
          s"approx_most_frequent key type: ${other.getClass}")
      }
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MgSummary(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key: Any = in.readByte() match {
        case 0 =>
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          UTF8String.fromBytes(b)
        case 1 => in.readLong()
        case 2 => in.readInt()
      }
      buf.counts.put(key, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): ApproxMostFrequentAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ApproxMostFrequentAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "approx_most_frequent"
}
