package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Steps-bounded regular-expression evaluation — the defense the reference
  * offers as `RegexLibrary.RE2J` (MAIN/sql/analyzer/FeaturesConfig.java):
  * on a 100 TB text corpus one pathological document against a
  * catastrophic-backtracking pattern (`(a+)+$` et al.) can wedge an
  * executor core for hours. RE2J (linear-time) is not on the classpath,
  * so the guard bounds the backtracking engine instead: every character
  * READ by the matcher counts as a step, and a match exceeding
  * `maxSteps` fails loudly instead of spinning — a backtracking engine
  * cannot loop without re-reading input, so bounding reads bounds the
  * runaway.
  *
  * Opt-in via `spark.graft.regex.maxSteps` (session conf, read when the
  * function is RESOLVED): 0 (default) keeps Spark's codegen'd builtins —
  * zero hot-path cost; > 0 routes the Presto-registry regexp_* family
  * through these bounded evaluators. Enable it on untrusted corpora;
  * normal patterns cost O(n·m) steps and never approach a sane bound
  * (e.g. 10M), while catastrophic ones hit it in milliseconds.
  */
object SafeRegex {
  val CONF = "spark.graft.regex.maxSteps"

  /** Conf value at function-build time (driver, during resolution). */
  def confSteps: Long =
    try org.apache.spark.sql.internal.SQLConf.get.getConfString(CONF, "0").toLong
    catch { case _: Exception => 0L }

  /** Step-counting view of the subject string. */
  private final class Bounded(s: String, max: Long) extends CharSequence {
    private[this] var steps = 0L
    override def length(): Int = s.length
    override def charAt(i: Int): Char = {
      steps += 1
      if (steps > max) throw new IllegalStateException(
        s"regular expression evaluation exceeded $max steps " +
          s"(pattern too complex for input; see $CONF)")
      s.charAt(i)
    }
    override def subSequence(a: Int, b: Int): CharSequence = s.subSequence(a, b)
    override def toString: String = s
  }

  /** Compiled-pattern cache, two levels.
    *
    * L1 — per-thread LRU, no lock. `matcher()` runs once per ROW
    * (nullSafeEval), so any shared structure on this path serializes every
    * executor thread: an access-ordered LinkedHashMap mutates its link
    * chain even on `get`, so a single shared map needs a lock on the pure
    * hit path, and at 32 cores that lock IS the regex stage. Patterns are
    * immutable and Pattern instances thread-safe, so each thread keeps its
    * own small LRU; the common case (literal pattern, or a handful of hot
    * per-row patterns) never touches shared state.
    *
    * L2 — shared bounded LRU under a lock, consulted only on an L1 miss.
    * It bounds total compilation work across threads (a pattern is
    * compiled once per JVM, not once per thread) and keeps the previous
    * round's eviction semantics: hot entries stay resident, cold per-row
    * patterns age out, the map can never grow without bound or freeze out
    * a late-arriving hot pattern.
    */
  private val MaxCachedPatterns = 1024
  private val MaxThreadPatterns = 64
  private val cache =
    new java.util.LinkedHashMap[String, java.util.regex.Pattern](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.util.regex.Pattern]): Boolean =
        size() > MaxCachedPatterns
    }
  private val local =
    new ThreadLocal[java.util.LinkedHashMap[String, java.util.regex.Pattern]] {
      override def initialValue() =
        new java.util.LinkedHashMap[String, java.util.regex.Pattern](16, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, java.util.regex.Pattern]): Boolean =
            size() > MaxThreadPatterns
        }
    }

  def matcher(pattern: String, input: String, maxSteps: Long): java.util.regex.Matcher = {
    val l1 = local.get()
    var p = l1.get(pattern)
    if (p == null) {
      val hit = cache.synchronized(cache.get(pattern))
      p = if (hit != null) hit else {
        // compile OUTSIDE the lock (compilation of a pathological pattern is
        // itself slow; holding the lock would stall every other thread)
        val compiled = java.util.regex.Pattern.compile(pattern)
        cache.synchronized {
          val race = cache.get(pattern)
          if (race != null) race else { cache.put(pattern, compiled); compiled }
        }
      }
      l1.put(pattern, p)
    }
    p.matcher(if (maxSteps > 0) new Bounded(input, maxSteps) else input)
  }
}

/** Bounded regexp_like: pattern found anywhere (Spark RLike semantics). */
case class BoundedRegexpLike(left: Expression, right: Expression, maxSteps: Long)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(s: Any, p: Any): Any =
    SafeRegex.matcher(p.toString, s.toString, maxSteps).find()
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Bounded regexp_extract: group `idx` of the first match, NULL when
  * nothing matches (the Presto 2-arg contract the registry builds). */
case class BoundedRegexpExtract(subject: Expression, pattern: Expression,
    idx: Expression, maxSteps: Long)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = subject
  override def second: Expression = pattern
  override def third: Expression = idx
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(s: Any, p: Any, g: Any): Any = {
    val m = SafeRegex.matcher(p.toString, s.toString, maxSteps)
    if (!m.find()) null
    else {
      val v = m.group(g.asInstanceOf[Int])
      if (v == null) null else UTF8String.fromString(v)
    }
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(subject = a, pattern = b, idx = c)
}

/** Bounded regexp_extract_all: every match's group `idx`, in order. */
case class BoundedRegexpExtractAll(subject: Expression, pattern: Expression,
    idx: Expression, maxSteps: Long)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = subject
  override def second: Expression = pattern
  override def third: Expression = idx
  override def dataType: DataType = ArrayType(StringType)
  override protected def nullSafeEval(s: Any, p: Any, g: Any): Any = {
    val m = SafeRegex.matcher(p.toString, s.toString, maxSteps)
    val out = Seq.newBuilder[UTF8String]
    while (m.find()) {
      val v = m.group(g.asInstanceOf[Int])
      out += (if (v == null) null else UTF8String.fromString(v))
    }
    new GenericArrayData(out.result())
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(subject = a, pattern = b, idx = c)
}

/** Bounded regexp_replace: Java appendReplacement semantics ($g refs),
  * identical to Spark's RegExpReplace. */
case class BoundedRegexpReplace(subject: Expression, pattern: Expression,
    repl: Expression, maxSteps: Long)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = subject
  override def second: Expression = pattern
  override def third: Expression = repl
  override def dataType: DataType = StringType
  override protected def nullSafeEval(s: Any, p: Any, r: Any): Any = {
    val m = SafeRegex.matcher(p.toString, s.toString, maxSteps)
    val sb = new StringBuffer
    while (m.find()) m.appendReplacement(sb, r.toString)
    m.appendTail(sb)
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(subject = a, pattern = b, repl = c)
}

/** Bounded regexp_split (java Pattern.split with Spark's limit contract:
  * -1 keeps trailing empties). */
case class BoundedRegexpSplit(subject: Expression, pattern: Expression,
    limit: Expression, maxSteps: Long)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = subject
  override def second: Expression = pattern
  override def third: Expression = limit
  override def dataType: DataType = ArrayType(StringType)
  override protected def nullSafeEval(s: Any, p: Any, l: Any): Any = {
    // UTF8String.split runs the UNBOUNDED java.util.regex matcher, so the
    // guard scan must run FIRST — a catastrophic pattern throws here,
    // before the unbounded split call can wedge the executor.
    if (maxSteps > 0) {
      val m = SafeRegex.matcher(p.toString, s.toString, maxSteps)
      while (m.find()) {}
    }
    val parts = UTF8String.fromString(s.toString)
      .split(UTF8String.fromString(p.toString), l.asInstanceOf[Int])
    new GenericArrayData(parts.toSeq)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression) = copy(subject = a, pattern = b, limit = c)
}
