package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binary codec + statistical scalar functions from the reference registry
  * that have no Spark builtin:
  *
  *  - to/from_big_endian_32/64   (VarbinaryFunctions.java)
  *  - to/from_ieee754_32/64      (VarbinaryFunctions.java)
  *  - hamming_distance           (StringFunctions.java:437)
  *  - normal_cdf / inverse_normal_cdf, wilson_interval_lower/upper
  *    (MathFunctions.java — reference delegates to its own erf/erfInv;
  *    here commons-math3, a Spark-bundled dependency, same definition)
  *  - parse_duration / to_milliseconds (DateTimeFunctions.java)
  *  - timezone_hour / timezone_minute  (DateTimeFunctions.java)
  */
case class ToBigEndian(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any): Any = {
    if (bits == 32)
      ByteBuffer.allocate(4).putInt(v match {
        case i: Int => i; case l: Long => l.toInt
      }).array()
    else
      ByteBuffer.allocate(8).putLong(v match {
        case i: Int => i.toLong; case l: Long => l
      }).array()
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class FromBigEndian(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = if (bits == 32) IntegerType else LongType
  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val expect = bits / 8
    require(b.length == expect, s"expected $expect-byte input, got ${b.length}")
    if (bits == 32) ByteBuffer.wrap(b).getInt else ByteBuffer.wrap(b).getLong
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ToIeee754(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  private def toDouble(v: Any): Double = v match {
    case d: Double => d; case f: Float => f.toDouble
    case i: Int => i.toDouble; case l: Long => l.toDouble
  }
  override protected def nullSafeEval(v: Any): Any =
    if (bits == 32)
      ByteBuffer.allocate(4).putInt(
        java.lang.Float.floatToIntBits(toDouble(v).toFloat)).array()
    else
      ByteBuffer.allocate(8).putLong(
        java.lang.Double.doubleToLongBits(toDouble(v))).array()
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class FromIeee754(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = if (bits == 32) FloatType else DoubleType
  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    require(b.length == bits / 8, s"expected ${bits / 8}-byte input")
    if (bits == 32) java.lang.Float.intBitsToFloat(ByteBuffer.wrap(b).getInt)
    else java.lang.Double.longBitsToDouble(ByteBuffer.wrap(b).getLong)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Code-point-wise difference count; inputs must be the same length
  * (StringFunctions.java hammingDistance throws otherwise). */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.toString.codePoints().toArray
    val b = r.toString.codePoints().toArray
    require(a.length == b.length,
      "the input strings to hamming_distance must have the same length")
    var i = 0; var d = 0L
    while (i < a.length) { if (a(i) != b(i)) d += 1; i += 1 }
    d
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class NormalCdf(mean: Expression, sd: Expression, value: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = mean
  override def second: Expression = sd
  override def third: Expression = value
  override def dataType: DataType = DoubleType
  private def d(v: Any) = v.asInstanceOf[Number].doubleValue()
  override protected def nullSafeEval(m: Any, s: Any, v: Any): Any = {
    require(d(s) > 0, "standardDeviation must be > 0")
    0.5 * (1 + org.apache.commons.math3.special.Erf.erf(
      (d(v) - d(m)) / (d(s) * math.sqrt(2))))
  }
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(mean = a, sd = b, value = c)
}

case class InverseNormalCdf(mean: Expression, sd: Expression, p: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = mean
  override def second: Expression = sd
  override def third: Expression = p
  override def dataType: DataType = DoubleType
  private def d(v: Any) = v.asInstanceOf[Number].doubleValue()
  override protected def nullSafeEval(m: Any, s: Any, pv: Any): Any = {
    require(d(pv) > 0 && d(pv) < 1, "p must be 0 > p > 1")
    require(d(s) > 0, "standardDeviation must be > 0")
    d(m) + d(s) * math.sqrt(2) *
      org.apache.commons.math3.special.Erf.erfInv(2 * d(pv) - 1)
  }
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(mean = a, sd = b, p = c)
}

/** Wilson score interval bound (MathFunctions.java:1282-1311). */
case class WilsonInterval(
    successes: Expression, trials: Expression, z: Expression, upper: Boolean)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = successes
  override def second: Expression = trials
  override def third: Expression = z
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(sv: Any, nv: Any, zv: Any): Any = {
    val s = sv.asInstanceOf[Number].doubleValue()
    val n = nv.asInstanceOf[Number].doubleValue()
    val zz = zv.asInstanceOf[Number].doubleValue()
    require(n > 0, "number of trials must be positive")
    require(s >= 0 && s <= n, "number of successes must be in [0, trials]")
    require(zz >= 0, "z-score must be non-negative")
    val p = s / n
    val sign = if (upper) 1 else -1
    (p + zz * zz / (2 * n) + sign * zz *
      math.sqrt(p * (1 - p) / n + zz * zz / (4 * n * n))) / (1 + zz * zz / n)
  }
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(successes = a, trials = b, z = c)
}

/** parse_duration('2.5m') → day-time interval
  * (DateTimeFunctions.java parseDuration; units ns|us|ms|s|m|h|d). */
case class ParseDuration(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DayTimeIntervalType()
  private val Pattern = """^\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]+)\s*$""".r
  override protected def nullSafeEval(v: Any): Any = v.toString match {
    case Pattern(num, unit) =>
      val micros = unit match {
        case "ns" => num.toDouble / 1000.0
        case "us" => num.toDouble
        case "ms" => num.toDouble * 1000
        case "s" => num.toDouble * 1000000
        case "m" => num.toDouble * 60000000
        case "h" => num.toDouble * 3600000000L
        case "d" => num.toDouble * 86400000000L
        case other => throw new IllegalArgumentException(s"Unknown time unit: $other")
      }
      math.round(micros)
    case other => throw new IllegalArgumentException(s"duration is not a valid data duration string: $other")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** to_milliseconds(interval day to second) → bigint. Day-time intervals are
  * microseconds internally regardless of declared fields. */
case class IntervalMillis(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = v.asInstanceOf[Long] / 1000L
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Session-zone UTC offset components at the given instant
  * (DateTimeFunctions.java timezone_hour/timezone_minute). */
case class TimeZonePart(child: Expression, minutePart: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = {
    val zone = java.time.ZoneId.of(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val instant = java.time.Instant.EPOCH.plus(
      v.asInstanceOf[Long], java.time.temporal.ChronoUnit.MICROS)
    val offsetSec = zone.getRules.getOffset(instant).getTotalSeconds
    if (minutePart) (offsetSec % 3600) / 60L else offsetSec / 3600L
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** to_iso8601: format depends on the INPUT type (DateTimeFunctions.java —
  * date → 'yyyy-MM-dd', timestamp → full instant), which a fixed
  * date_format pattern cannot express. */
case class Iso8601(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case DateType =>
      UTF8String.fromString(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
    case _ =>
      val instant = java.time.Instant.EPOCH.plus(
        v.asInstanceOf[Long], java.time.temporal.ChronoUnit.MICROS)
      UTF8String.fromString(
        java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
          .withZone(java.time.ZoneOffset.UTC).format(instant))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
