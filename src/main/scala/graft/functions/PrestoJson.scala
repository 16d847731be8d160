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
    case (n @ (_: Byte | _: Short | _: Int | _: Long), DateType) =>
      // dates render as quoted ISO text (JsonOperators castDateToJson)
      quote(java.time.LocalDate.ofEpochDay(
        n.asInstanceOf[Number].longValue()).toString, sb)
    case (micros: Long, tt) if tt == TimestampType || tt == TimestampNTZType =>
      quote(java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC).format(timestampFmt), sb)
    case (n @ (_: Byte | _: Short | _: Int | _: Long), _) => sb.append(n.toString)
    // NaN / Infinity are not JSON numbers — the reference writes them as
    // STRINGS ("NaN", "Infinity"); finite doubles/floats use the Java
    // shortest round-trip form (Jackson = Double.toString), reals at FLOAT
    // precision (TestArrayOperators:202).
    case (d: Double, _) =>
      if (d.isNaN || d.isInfinite) quote(d.toString, sb) else sb.append(d.toString)
    case (f: Float, _) =>
      if (f.isNaN || f.isInfinite) quote(f.toString, sb) else sb.append(f.toString)
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
      // object keys render unquoted-scalar-style and SORT as strings —
      // the reference writes maps through ORDER_MAP_ENTRIES_BY_KEYS
      // (TestMapOperators:160 pins {"1":2,"3":4,...})
      val ks = m.keyArray()
      val vs = m.valueArray()
      val pairs = (0 until m.numElements()).map { i =>
        if (ks.isNullAt(i))
          throw new IllegalArgumentException("Cannot cast a map with a null key to JSON")
        val vsb = new StringBuilder
        render(if (vs.isNullAt(i)) null else vs.get(i, vt), vt, vsb)
        (keyString(ks.get(i, kt), kt), vsb.toString)
      }.sortBy(_._1)
      sb.append('{')
      pairs.zipWithIndex.foreach { case ((k, rendered), i) =>
        if (i > 0) sb.append(',')
        quote(k, sb)
        sb.append(':').append(rendered)
      }
      sb.append('}')
    case (other, _) => quote(String.valueOf(other), sb)
  }

  private lazy val timestampFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")

  private def keyString(k: Any, kt: DataType): String = (k, kt) match {
    case (n @ (_: Byte | _: Short | _: Int | _: Long), DateType) =>
      java.time.LocalDate.ofEpochDay(n.asInstanceOf[Number].longValue()).toString
    case (d: Decimal, _) => d.toJavaBigDecimal.toPlainString
    case (other, _) => String.valueOf(other)
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
