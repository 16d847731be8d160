package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Primitive open-addressing hash set over longs — the probe table behind
  * [[InLongSet]]. Spark's own `InSet` above the codegen switch threshold
  * compiles to `scala.collection.immutable.Set.contains(Object)`, which
  * BOXES the probed value on every row (bytecode-verified on Spark 4.1.2
  * `InSet.genCodeWithSet`): h02's 72 k-key prune at sf100 boxes 600 M
  * longs in the scan's hot loop. This set probes unboxed: fmix64 hash,
  * power-of-two table, linear probing, load factor ≤ 0.5; 0 is kept out
  * of the table (empty-slot marker) behind a flag. Immutable after
  * construction, safe to share across threads and tasks; Serializable for
  * the codegen reference array. */
final class LongSet private (table: Array[Long], mask: Int,
    hasZero: Boolean) extends Serializable {

  def contains(v: Long): Boolean = {
    if (v == 0L) return hasZero
    var i = LongSet.mix(v).toInt & mask
    while (true) {
      val t = table(i)
      if (t == v) return true
      if (t == 0L) return false
      i = (i + 1) & mask
    }
    false // unreachable: load factor ≤ 0.5 guarantees an empty slot
  }
}

object LongSet {
  /** Murmur3 fmix64 finalizer — full avalanche so linear probing sees a
    * uniform distribution even on consecutive keys. */
  private def mix(v: Long): Long = {
    var h = v
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def apply(keys: Iterable[Long]): LongSet = {
    val distinct = keys.toArray
    var cap = 16
    while (cap < distinct.length * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var hasZero = false
    distinct.foreach { v =>
      if (v == 0L) hasZero = true
      else {
        var i = mix(v).toInt & mask
        while (table(i) != 0L && table(i) != v) i = (i + 1) & mask
        table(i) = v
      }
    }
    new LongSet(table, mask, hasZero)
  }
}

/** `child IN (<large long key set>)` with an UNBOXED probe — emitted by
  * [[DynamicSemiJoinPrune]] in place of `InSet` for long/int key domains
  * past the pushdown cap (where the predicate runs as a plain codegen
  * filter over the full scan). Semantics match `InSet` over a null-free
  * key set: null input → null out (nullSafeEval), non-null → set
  * membership. Guide §4 (codegen-friendly expressions in the hot path). */
case class InLongSet(child: Expression, keys: Array[Long])
    extends UnaryExpression with Predicate {

  @transient private lazy val set: LongSet = LongSet(keys)

  override protected def nullSafeEval(value: Any): Any = value match {
    case l: Long => set.contains(l)
    case i: Int => set.contains(i.toLong)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftLongSet", set, classOf[LongSet].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.contains((long) $c);")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"InLongSet requires an integral child, got $other")
    }

  override def toString: String = s"$child INLONGSET(${keys.length} keys)"
  override def sql: String = s"(${child.sql} INLONGSET(${keys.length} keys))"
  override protected def withNewChildInternal(newChild: Expression): InLongSet =
    copy(child = newChild)

  // value-based equality: the Array field's reference equality would make
  // every structurally-identical copy a distinct expression to Catalyst
  // (canonicalization, reuse); reference fast-path first — plan copies
  // share the array instance
  override def equals(other: Any): Boolean = other match {
    case o: InLongSet => (this eq o) || (child == o.child &&
      ((keys eq o.keys) || java.util.Arrays.equals(keys, o.keys)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(keys)
}
