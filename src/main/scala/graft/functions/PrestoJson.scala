package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto `CAST(x AS JSON)` (JsonOperators.java + JsonFunctions.java
  * jsonFormat): renders any value as Presto's canonical JSON text —
  * notably ROWs render as JSON ARRAYS (`CAST(ROW(1,'a') AS JSON)` is
  * `[1,"a"]`, the anonymous-row convention), arrays as arrays, maps as
  * objects with stringified keys (a NULL key fails the cast, so
  * TRY(CAST(...)) recovers to NULL), scalars as JSON scalars. Eval-only
  * (CodegenFallback) — JSON casts never sit in a hot loop here. */
case class PrestoToJson(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  private def render(v: Any, t: DataType, sb: StringBuilder): Unit = (v, t) match {
    case (null, _) => sb.append("null")
    case (b: Boolean, _) => sb.append(if (b) "true" else "false")
    case (n @ (_: Byte | _: Short | _: Int | _: Long), _) => sb.append(n.toString)
    case (d: Double, _) =>
      if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15)
        sb.append(d.toLong.toString).append(".0")
      else sb.append(d.toString)
    case (f: Float, _) => render(f.toDouble, DoubleType, sb)
    case (d: Decimal, _) => sb.append(d.toJavaBigDecimal.toPlainString)
    case (s: UTF8String, _) => quote(s.toString, sb)
    case (a: ArrayData, ArrayType(et, _)) =>
      sb.append('[')
      var i = 0
      while (i < a.numElements()) {
        if (i > 0) sb.append(',')
        render(if (a.isNullAt(i)) null else a.get(i, et), et, sb)
        i += 1
      }
      sb.append(']')
    case (r: InternalRow, StructType(fields)) =>
      // Presto rows are anonymous: JSON ARRAY, not object
      sb.append('[')
      var i = 0
      while (i < fields.length) {
        if (i > 0) sb.append(',')
        render(if (r.isNullAt(i)) null else r.get(i, fields(i).dataType),
          fields(i).dataType, sb)
        i += 1
      }
      sb.append(']')
    case (m: MapData, MapType(kt, vt, _)) =>
      sb.append('{')
      val ks = m.keyArray()
      val vs = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        if (i > 0) sb.append(',')
        if (ks.isNullAt(i))
          throw new IllegalArgumentException("Cannot cast a map with a null key to JSON")
        quote(String.valueOf(ks.get(i, kt)), sb)
        sb.append(':')
        render(if (vs.isNullAt(i)) null else vs.get(i, vt), vt, sb)
        i += 1
      }
      sb.append('}')
    case (other, _) => quote(String.valueOf(other), sb)
  }

  private def quote(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  override def nullSafeEval(v: Any): Any = {
    val sb = new StringBuilder
    render(v, child.dataType, sb)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): PrestoToJson =
    copy(child = newChild)
}
