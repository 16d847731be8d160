package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native expressions for the text-dedup hot path.
  *
  * The dedup/text pipeline canonicalizes every document as
  * `trim(regexp_replace(lower(text), '\s+', ' '))` and re-splits the
  * result — at corpus scale the java.util.regex pass plus the
  * split/HOF-shingle chain dominates the whole MinHash stage (measured:
  * 60% of d04 at sf0.1 is building the shingle table). These expressions
  * keep BYTE-IDENTICAL semantics (the DuckDB oracles pin them) but do the
  * work in one scan over the UTF-8 bytes: whitespace = Java regex `\s`
  * = [ \t\n\x0B\f\r] — all ASCII, so byte-level run-collapse is UTF-8
  * safe; lowercase delegates to UTF8String (full Unicode, same as
  * Spark's `lower`).
  */
object TextNorm {
  @inline private[functions] def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Lowercased, whitespace-split tokens of a raw text. Matches
    * `split(trim(regexp_replace(lower(t), '\s+', ' ')), ' ')` exactly —
    * including the empty/all-whitespace input, where Spark's split
    * returns a single empty token. */
  def tokenize(text: UTF8String): Array[UTF8String] = {
    val b = text.toLowerCase.getBytes
    val n = b.length
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      if (i < n) {
        val s = i
        while (i < n && !isWs(b(i))) i += 1
        out += UTF8String.fromBytes(b, s, i - s)
      }
    }
    if (out.isEmpty) Array(UTF8String.EMPTY_UTF8) else out.toArray
  }

  // static entry points for whole-stage codegen (scalac emits forwarders
  // on the paired TextNorm class)
  def normalizeWs(text: UTF8String): UTF8String =
    UTF8String.concatWs(UTF8String.fromString(" "), tokenize(text): _*)

  def tokensArray(text: UTF8String): ArrayData =
    new GenericArrayData(tokenize(text).asInstanceOf[Array[Any]])

  def shingles(arr: ArrayData, k: Int): ArrayData = shingles(arr, k, 1)

  /** Strided variant: windows start at 0, stride, 2·stride, … (stride=1
    * is the classic shingle set; stride=k gives non-overlapping chunks —
    * the passage-dedup layout). */
  def shingles(arr: ArrayData, k: Int, stride: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) new GenericArrayData(Array.empty[Any])
    else {
      val sep = UTF8String.fromString(" ")
      val out = new Array[Any]((n - k) / stride + 1)
      var i = 0
      var o = 0
      while (i <= n - k) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(o) = UTF8String.concatWs(sep, parts: _*)
        o += 1
        i += stride
      }
      new GenericArrayData(out)
    }
  }
}

/** `trim(regexp_replace(lower(text), '\s+', ' '))` in one byte pass.
  * Codegen delegates to the static TextNorm entry point, so the
  * expression stays inside whole-stage codegen. */
case class NormalizeWs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    TextNorm.normalizeWs(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNorm.normalizeWs($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "normalize_ws"
}

/** `split(normalize_ws(text), ' ')` without materializing the joined
  * string or a second scan. */
case class NormalizedTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextNorm.tokensArray(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNorm.tokensArray($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "normalized_tokens"
}

/** Word k-shingles of a token array: one pass of UTF8String.concatWs per
  * window — replaces the interpreted transform(slice → array_join) HOF
  * chain. Empty result when the input has fewer than k tokens (the
  * filter(isNotNull) semantics of the HOF form). */
case class WordShingles(child: Expression, k: Int, stride: Int = 1)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be positive")
  require(stride >= 1, "stride must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextNorm.shingles(v.asInstanceOf[ArrayData], k, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNorm.shingles($c, $k, $stride);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}
