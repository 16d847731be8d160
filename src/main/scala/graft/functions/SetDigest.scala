package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._

/** The reference's SetDigest sketch + function surface
  * (MAIN/type/setdigest/SetDigest.java:54-217, SetDigestFunctions.java,
  * SetDigestOperators.java; registered in FunctionRegistry):
  * make_set_digest / merge_set_digest aggregates, cardinality,
  * intersection_cardinality, jaccard_index, hash_counts scalars.
  *
  * A SetDigest is an HLL (cardinality) plus a BOTTOM-K minhash with
  * per-hash multiplicities (k = 8192): while fewer than k distinct
  * hashes have been seen the sketch is EXACT — exact cardinality and
  * exact intersections — and past k it degrades to the bottom-k Jaccard
  * estimator (SetDigest.java:142-184). We match RESULTS (exact-mode
  * values exactly, estimates within sketch error); the airlift wire
  * format is out of scope like the HLL family (SURVEY §7).
  *
  * Serialized form is version-tagged (version 2) so `cardinality`
  * dispatches between HLL (version 1) and SetDigest values.
  */
final class SetDigestSketch(
    val maxHashes: Int,
    val hll: HllSketch,
    // signed-long ordering, same as the reference's Long2ShortRBTreeMap
    val minhash: java.util.TreeMap[java.lang.Long, java.lang.Short])
  extends Serializable {

  def addHash(hash: Long): Unit = {
    val cur = minhash.get(hash)
    val c: Int = if (cur == null) 0 else cur.intValue()
    if (c < Short.MaxValue)
      minhash.put(hash, (c + 1).toShort)
    while (minhash.size() > maxHashes) minhash.remove(minhash.lastKey())
    hll.add(hash)
  }

  /** Strict inequality: size == maxHashes is ambiguous (SetDigest.java:142). */
  def isExact: Boolean = minhash.size() < maxHashes

  def cardinality(): Long =
    if (isExact) minhash.size().toLong else hll.cardinality()

  def merge(o: SetDigestSketch): Unit = {
    hll.merge(o.hll)
    val it = o.minhash.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = minhash.get(e.getKey)
      val sum = (if (cur == null) 0 else cur.intValue()) + e.getValue.intValue()
      minhash.put(e.getKey, math.min(sum, Short.MaxValue).toShort)
    }
    while (minhash.size() > maxHashes) minhash.remove(minhash.lastKey())
  }

  def serialize(): Array[Byte] = {
    val hllBytes = hll.serialize()
    val bb = java.nio.ByteBuffer.allocate(
      1 + 4 + 4 + minhash.size() * 10 + 4 + hllBytes.length)
    bb.put(2.toByte).putInt(maxHashes).putInt(minhash.size())
    val it = minhash.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey).putShort(e.getValue)
    }
    bb.putInt(hllBytes.length).put(hllBytes)
    bb.array()
  }
}

object SetDigestSketch {
  val DefaultMaxHashes = 8192 // SetDigest.java:54

  def empty(maxHashes: Int = DefaultMaxHashes): SetDigestSketch =
    new SetDigestSketch(maxHashes, HllSketch.empty(),
      new java.util.TreeMap[java.lang.Long, java.lang.Short]())

  def deserialize(bytes: Array[Byte]): SetDigestSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.get() == 2, "bad SetDigest encoding")
    val maxHashes = bb.getInt()
    val n = bb.getInt()
    val m = new java.util.TreeMap[java.lang.Long, java.lang.Short]()
    (0 until n).foreach { _ => m.put(bb.getLong(), bb.getShort()) }
    val hllBytes = new Array[Byte](bb.getInt())
    bb.get(hllBytes)
    new SetDigestSketch(maxHashes, HllSketch.deserialize(hllBytes), m)
  }

  /** Bottom-k Jaccard estimator (SetDigest.java:166-184): intersection
    * fraction among the smallest min(|A|,|B|) hashes of the union. */
  def jaccardIndex(a: SetDigestSketch, b: SetDigestSketch): Double = {
    val k = math.min(a.minhash.size(), b.minhash.size())
    if (k == 0) return Double.NaN // the reference's 0/0 on empty digests
    val union = new java.util.TreeSet[java.lang.Long](a.minhash.keySet())
    union.addAll(b.minhash.keySet())
    var inter = 0
    var i = 0
    val it = union.iterator()
    while (it.hasNext && i < k) {
      val h = it.next()
      if (a.minhash.containsKey(h) && b.minhash.containsKey(h)) inter += 1
      i += 1
    }
    inter / k.toDouble
  }

  /** intersection_cardinality (SetDigestFunctions.java:56-86): exact set
    * intersection in exact mode; jaccard × union estimate (clamped by the
    * smaller side) otherwise. */
  def intersectionCardinality(a: SetDigestSketch, b: SetDigestSketch): Long = {
    if (a.isExact && b.isExact) {
      var n = 0L
      val it = a.minhash.keySet().iterator()
      while (it.hasNext) if (b.minhash.containsKey(it.next())) n += 1
      n
    } else {
      val ca = a.cardinality(); val cb = b.cardinality()
      val j = jaccardIndex(a, b)
      val merged = SetDigestSketch.empty(a.maxHashes)
      merged.merge(a); merged.merge(b)
      math.min(math.round(j * merged.cardinality()), math.min(ca, cb))
    }
  }
}

/** Version-tag dispatch for `cardinality(varbinary sketch)`: the HLL
  * family serializes with version 1, SetDigest with version 2 — Presto
  * distinguishes by TYPE (HyperLogLog vs SetDigest); both map to Spark
  * BinaryType here, so the tag byte carries the type. */
object Sketches {
  def cardinality(bytes: Array[Byte]): Long =
    if (bytes.nonEmpty && bytes(0) == 2)
      SetDigestSketch.deserialize(bytes).cardinality()
    else HllSketch.deserialize(bytes).cardinality()
}

/** make_set_digest(x) aggregate (SetDigestAggregationFunction). */
case class MakeSetDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SetDigestSketch] {

  private lazy val hasher = XxHash64(Seq(child), 42L)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): SetDigestSketch = SetDigestSketch.empty()

  override def update(buf: SetDigestSketch, input: InternalRow): SetDigestSketch = {
    if (child.eval(input) != null)
      buf.addHash(hasher.eval(input).asInstanceOf[Long])
    buf
  }

  override def merge(buf: SetDigestSketch, other: SetDigestSketch): SetDigestSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: SetDigestSketch): Any = buf.serialize()
  override def serialize(buf: SetDigestSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): SetDigestSketch =
    SetDigestSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): MakeSetDigestAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MakeSetDigestAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "make_set_digest"
}

/** merge_set_digest(digest) aggregate. */
case class MergeSetDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SetDigestSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): SetDigestSketch = SetDigestSketch.empty()

  override def update(buf: SetDigestSketch, input: InternalRow): SetDigestSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(SetDigestSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: SetDigestSketch, other: SetDigestSketch): SetDigestSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: SetDigestSketch): Any = buf.serialize()
  override def serialize(buf: SetDigestSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): SetDigestSketch =
    SetDigestSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): MergeSetDigestAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MergeSetDigestAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "merge_set_digest"
}

/** Binary scalars over two digests: jaccard_index (double) and
  * intersection_cardinality (bigint). */
case class SetDigestBinary(left: Expression, right: Expression, op: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType =
    if (op == "jaccard_index") DoubleType else LongType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = SetDigestSketch.deserialize(l.asInstanceOf[Array[Byte]])
    val b = SetDigestSketch.deserialize(r.asInstanceOf[Array[Byte]])
    if (op == "jaccard_index") SetDigestSketch.jaccardIndex(a, b)
    else SetDigestSketch.intersectionCardinality(a, b)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = op
}

/** hash_counts(digest) → map<bigint,smallint> (SetDigestFunctions.java:
  * hashCounts): the retained hash → multiplicity map. */
case class HashCounts(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = MapType(LongType, ShortType, valueContainsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val d = SetDigestSketch.deserialize(v.asInstanceOf[Array[Byte]])
    val keys = new Array[Any](d.minhash.size())
    val vals = new Array[Any](d.minhash.size())
    var i = 0
    val it = d.minhash.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey.longValue(); vals(i) = e.getValue.shortValue()
      i += 1
    }
    ArrayBasedMapData(keys, vals)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "hash_counts"
}
