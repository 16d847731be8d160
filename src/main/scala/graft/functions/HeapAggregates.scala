package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** max_by(x, y, n) / min_by(x, y, n) — Presto's N-variant
  * (minmaxby/AbstractMinMaxBy.java + MaxNAggregationFunction.java with
  * TypedHeap.java): the n values of x associated with the n largest
  * (smallest) y. Spark has only the 1-variants, so this is a bounded-heap
  * TypedImperativeAggregate: buffer is O(n) per group regardless of input
  * size, and partial/final merge keeps the shuffle payload at n entries.
  *
  * Supports long/double/string x and y (the fixture surface); extending to
  * any orderable type is a matter of widening `ord`.
  */
case class MaxByN(
    x: Expression,
    y: Expression,
    n: Int,
    asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Any, Any)]] {

  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(x.dataType)

  private def rank(v: Any): Double = v match {
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: Double => d
    case f: Float => f.toDouble
    case s: UTF8String => s.hashCode.toDouble // strings: see ord below
    case _ => 0.0
  }

  // heap root = the entry to EVICT: smallest y for max_by, largest for min_by
  private object ord extends Ordering[(Any, Any)] {
    def compare(a: (Any, Any), b: (Any, Any)): Int = {
      val c = (a._2, b._2) match {
        case (x1: UTF8String, x2: UTF8String) => x1.compareTo(x2)
        case (v1, v2) => java.lang.Double.compare(rank(v1), rank(v2))
      }
      if (asc) c else -c
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Any, Any)] =
    mutable.PriorityQueue.empty[(Any, Any)](ord)

  override def update(buf: mutable.PriorityQueue[(Any, Any)],
      input: InternalRow): mutable.PriorityQueue[(Any, Any)] = {
    val yv = y.eval(input)
    if (yv != null) {
      val xv = x.eval(input)
      buf.enqueue((copyOf(xv), copyOf(yv)))
      if (buf.size > n) buf.dequeue()
    }
    buf
  }

  private def copyOf(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case other => other
  }

  override def merge(buf: mutable.PriorityQueue[(Any, Any)],
      other: mutable.PriorityQueue[(Any, Any)]): mutable.PriorityQueue[(Any, Any)] = {
    other.foreach { e => buf.enqueue(e); if (buf.size > n) buf.dequeue() }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Any, Any)]): Any = {
    // emit in rank order (best first = smallest under `ord`, whose maximum
    // is the eviction candidate)
    val sorted = buf.toSeq.sorted(ord).map(_._1)
    new GenericArrayData(sorted.toArray)
  }

  override def serialize(buf: mutable.PriorityQueue[(Any, Any)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (xv, yv) =>
      out.writeObject(toJava(xv)); out.writeObject(toJava(yv))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Any, Any)] = {
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    val size = in.readInt()
    val buf = createAggregationBuffer()
    (0 until size).foreach { _ =>
      val xv = fromJava(in.readObject()); val yv = fromJava(in.readObject())
      buf.enqueue((xv, yv))
    }
    buf
  }

  private def toJava(v: Any): AnyRef = v match {
    case s: UTF8String => s.toString
    case other => other.asInstanceOf[AnyRef]
  }
  private def fromJava(v: AnyRef): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }

  override def withNewMutableAggBufferOffset(offset: Int): MaxByN =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MaxByN =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(x = c(0), y = c(1))
  override def prettyName: String = if (asc) "min_by_n" else "max_by_n"
}

/** histogram(x) → map<x, bigint> (Presto histogram/Histogram.java:47) and
  * numeric_histogram(buckets, x) → map<double, double> approximate
  * (NumericHistogram.java). Exact value-count map with a HashMap buffer;
  * partial aggregation merges count maps, so the shuffle carries one map
  * per group per partition.
  */
case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = MapType(child.dataType, LongType)

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  override def update(buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v match { case s: UTF8String => s.clone(); case o => o }
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    // no non-null input → NULL, not {} (the reference's framework never
    // creates the state: Histogram.java input is a non-nullable channel)
    if (buf.isEmpty) return null
    val entries = buf.toSeq
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1).toArray),
      new GenericArrayData(entries.map(e => java.lang.Long.valueOf(e._2)).toArray))
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      out.writeObject(k match { case s: UTF8String => s.toString; case o => o })
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    val size = in.readInt()
    val buf = createAggregationBuffer()
    (0 until size).foreach { _ =>
      val k = in.readObject() match {
        case s: String => UTF8String.fromString(s)
        case o => o
      }
      buf.update(k, in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HistogramAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "histogram"
}

/** Shared buffer for the map-building aggregates: insertion-ordered
  * first-wins map plus a flag recording whether ANY input reached the
  * state — the reference returns NULL when the accumulator was never
  * created (no qualifying row), which is distinct from a non-null empty
  * result (e.g. map_union over empty maps). */
final class MapBuf {
  var seen: Boolean = false
  val map: mutable.LinkedHashMap[Any, Any] = mutable.LinkedHashMap.empty
}

/** map_union(map_col) — Presto MapUnionAggregation.java: union of all input
  * maps; first-seen value wins on duplicate keys (KeyValuePairs.add only
  * inserts unseen keys). String/primitive keys and values (fixture
  * surface). */
case class MapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MapBuf] with MapBufCodec {

  private val mapType = child.dataType.asInstanceOf[MapType]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = mapType

  override def createAggregationBuffer(): MapBuf = new MapBuf

  override def update(buf: MapBuf, input: InternalRow): MapBuf = {
    val v = child.eval(input)
    if (v != null) {
      buf.seen = true
      val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val keys = m.keyArray()
      val vals = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        val k = cp(keys.get(i, mapType.keyType))
        if (!buf.map.contains(k))
          buf.map.update(k, cp(vals.get(i, mapType.valueType)))
        i += 1
      }
    }
    buf
  }

  override def prettyName: String = "map_union"
  override def withNewMutableAggBufferOffset(offset: Int): MapUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MapUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

/** map_agg(key, value) — Presto MapAggregationFunction.java: NULL keys are
  * skipped (the key is a non-nullable input channel), the first value seen
  * for a key wins (KeyValuePairs.add), values may be NULL, and a group
  * with no non-null key yields NULL (the state is never created). */
case class MapAggAgg(
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MapBuf] with MapBufCodec {

  override def children: Seq[Expression] = Seq(key, value)
  override def nullable: Boolean = true
  override def dataType: DataType =
    MapType(key.dataType, value.dataType, valueContainsNull = true)

  override def createAggregationBuffer(): MapBuf = new MapBuf

  override def update(buf: MapBuf, input: InternalRow): MapBuf = {
    val k0 = key.eval(input)
    if (k0 != null) {
      buf.seen = true
      val k = cp(k0)
      if (!buf.map.contains(k)) buf.map.update(k, cp(value.eval(input)))
    }
    buf
  }

  override def prettyName: String = "map_agg"
  override def withNewMutableAggBufferOffset(offset: Int): MapAggAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MapAggAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(key = c(0), value = c(1))
}

/** merge/eval/serde shared by the MapBuf aggregates. */
trait MapBufCodec { self: TypedImperativeAggregate[MapBuf] =>

  protected def cp(v: Any): Any = v match {
    case s: UTF8String => s.clone(); case o => o
  }

  override def merge(buf: MapBuf, other: MapBuf): MapBuf = {
    if (other.seen) buf.seen = true
    other.map.foreach { case (k, v) =>
      if (!buf.map.contains(k)) buf.map.update(k, v)
    }
    buf
  }

  override def eval(buf: MapBuf): Any = {
    if (!buf.seen) return null
    val entries = buf.map.toSeq
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1).toArray),
      new GenericArrayData(entries.map(_._2).toArray))
  }

  override def serialize(buf: MapBuf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    out.writeBoolean(buf.seen)
    out.writeInt(buf.map.size)
    buf.map.foreach { case (k, v) =>
      out.writeObject(toJava(k)); out.writeObject(toJava(v))
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MapBuf = {
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MapBuf
    buf.seen = in.readBoolean()
    val size = in.readInt()
    (0 until size).foreach { _ =>
      val k = fromJava(in.readObject()); val v = fromJava(in.readObject())
      if (!buf.map.contains(k)) buf.map.update(k, v)
    }
    buf
  }

  private def toJava(v: Any): AnyRef = v match {
    case s: UTF8String => s.toString; case o => o.asInstanceOf[AnyRef]
  }
  private def fromJava(v: AnyRef): Any = v match {
    case s: String => UTF8String.fromString(s); case o => o
  }
}

/** numeric_histogram(buckets, value[, weight]) → map<double,double>
  * (NumericHistogram.java — streaming histogram that greedily merges the
  * closest adjacent pair of centroids, after Ben-Haim & Tom-Tov). The buffer
  * is O(buckets) per group: inputs accumulate into a bounded scratch list and
  * compress in batches, so partial/final merge ships at most 4×buckets
  * centroids per group regardless of input size. */
case class NumericHistogramAgg(
    buckets: Int,
    value: Expression,
    weightExpr: Option[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Double)]] {

  require(buckets >= 2, "numeric_histogram bucket count must be at least 2")

  override def children: Seq[Expression] = Seq(value) ++ weightExpr
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(DoubleType, DoubleType)

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Double)] =
    mutable.ArrayBuffer.empty

  private def num(v: Any): Double = v.asInstanceOf[Number].doubleValue()

  private def compress(
      buf: mutable.ArrayBuffer[(Double, Double)], target: Int): Unit = {
    if (buf.length <= target) return
    val sorted = buf.sortBy(_._1)
    buf.clear(); buf ++= sorted
    while (buf.length > target) {
      var minGap = Double.MaxValue; var at = 0
      var i = 0
      while (i < buf.length - 1) {
        val gap = buf(i + 1)._1 - buf(i)._1
        if (gap < minGap) { minGap = gap; at = i }
        i += 1
      }
      val (x1, w1) = buf(at); val (x2, w2) = buf(at + 1)
      buf(at) = ((x1 * w1 + x2 * w2) / (w1 + w2), w1 + w2)
      buf.remove(at + 1)
    }
  }

  override def update(
      buf: mutable.ArrayBuffer[(Double, Double)],
      input: InternalRow): mutable.ArrayBuffer[(Double, Double)] = {
    val v = value.eval(input)
    if (v != null) {
      val w = weightExpr.map(e => num(e.eval(input))).getOrElse(1.0)
      buf += ((num(v), w))
      if (buf.length > buckets * 4) compress(buf, buckets)
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[(Double, Double)],
      other: mutable.ArrayBuffer[(Double, Double)]): mutable.ArrayBuffer[(Double, Double)] = {
    buf ++= other
    if (buf.length > buckets * 4) compress(buf, buckets)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Double)]): Any = {
    compress(buf, buckets)
    val entries = buf.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1).toArray),
      new GenericArrayData(entries.map(_._2).toArray))
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (x, w) => bb.putDouble(x); bb.putDouble(w) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Double)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf += ((bb.getDouble, bb.getDouble)))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): NumericHistogramAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): NumericHistogramAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(value = c.head, weightExpr = c.lift(1))
  override def prettyName: String = "numeric_histogram"
}
