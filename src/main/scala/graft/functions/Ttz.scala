package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TIME WITH TIME ZONE (SPI/type/TimeWithTimeZoneType.java) as a struct of
  * (UTC millis, zone id) — the sibling of [[Tstz]]'s zone-preserving
  * timestamp. The reference packs millisUtc + zone key into one long
  * (SqlTimeWithTimeZone); we mirror the SEMANTICS with the same struct
  * recipe the tstz type uses:
  *
  *  - the stored long is millisUtc on the 1970-01-01 frame: the literal's
  *    wall clock in its zone, minus the zone's offset AT that frame
  *    (util/DateTimeUtils.java parseTimeWithTimeZone) — it may be negative
  *    or exceed a day, exactly like the reference's packed value;
  *  - comparisons and GROUP BY/DISTINCT/ORDER BY use millisUtc ONLY
  *    (TimeWithTimeZoneOperators: 03:04:05+07:09 = 02:04:05+06:09); the
  *    Engine tstz pass strips both zone-carrying types via Tstz.stripZones;
  *  - CAST AS VARCHAR renders 'HH:mm:ss.SSS <zone-as-stored>'
  *    (TIME_WITH_TIME_ZONE_FORMATTER);
  *  - non-legacy cast semantics: → time / → timestamp take the WALL clock
  *    in the value's zone (DateTimeTestingUtils.sqlTimeOf non-legacy arm);
  *    → timestamp with time zone keeps instant and zone;
  *  - field extractors (hour/minute/…) view the wall clock (TstzWall
  *    handles both types); timezone_hour/minute expose the value's offset.
  */
object Ttz {
  val M = "__ttz_m"
  val Z = "__ttz_z"

  val dataType: StructType = StructType(Seq(
    StructField(M, LongType, nullable = true),
    StructField(Z, StringType, nullable = true)))

  def isTtz(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.fields.length == 2 && s.fields(0).name == M && s.fields(1).name == Z
    case _ => false
  }

  def millis(e: Expression): Expression = GetStructField(e, 0, Some(M))
  def zone(e: Expression): Expression = GetStructField(e, 1, Some(Z))
  def make(m: Expression, z: Expression): Expression =
    CreateNamedStruct(Seq(Literal(M), m, Literal(Z), z))

  /** Zone offset in millis at the 1970-01-01-frame instant. */
  def offsetMillis(zoneId: String, utcMillis: Long): Long =
    java.time.ZoneId.of(zoneId, java.time.ZoneId.SHORT_IDS).getRules
      .getOffset(java.time.Instant.ofEpochMilli(utcMillis))
      .getTotalSeconds * 1000L

  /** Wall millis-of-day in the value's zone, normalized to [0, 86400000). */
  def wallMillisOfDay(utcMillis: Long, zoneId: String): Long = {
    val w = (utcMillis + offsetMillis(zoneId, utcMillis)) % 86400000L
    if (w < 0) w + 86400000L else w
  }

  /** Parse 'H:m[:s[.fff]][ zone]' (offset or region id; absent → the
    * session zone) → (utcMillis, zone). */
  def parse(s: String): Option[(Long, String)] = {
    val m = TtzParse.pattern.matcher(s.trim)
    if (!m.matches()) return None
    val zonePart = Option(m.group(6)).getOrElse(Tstz.sessionZone)
    if (!TstzParse.isZone(zonePart)) return None
    try {
      val lt = java.time.LocalTime.parse(m.group(1),
        java.time.format.DateTimeFormatter.ofPattern(
          "H:m[:s[.SSSSSS][.SSSSS][.SSSS][.SSS][.SS][.S]]"))
      val zid = java.time.ZoneId.of(zonePart, java.time.ZoneId.SHORT_IDS)
      val utc = java.time.ZonedDateTime
        .of(java.time.LocalDate.EPOCH, lt, zid).toInstant.toEpochMilli
      Some((utc, zonePart))
    } catch { case _: java.time.DateTimeException => None }
  }
}

/** String → ttz struct ('Value cannot be cast to time with time zone' on
  * failure, the reference's cast error text). */
case class TtzParse(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Ttz.dataType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Ttz.parse(v.toString) match {
      case Some((m, z)) => InternalRow(m, UTF8String.fromString(z))
      case None => throw new IllegalArgumentException(
        s"Value cannot be cast to time with time zone: $v")
    }
  override protected def withNewChildInternal(c: Expression): TtzParse =
    copy(child = c)
}

object TtzParse {
  /** time [zone]: groups 1=time, 6=zone (absent for zone-less). */
  val pattern: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    """^(\d{1,2}:\d{1,2}(:\d{1,2}(\.\d{1,6})?)?)\s*((\s|(?=[+-]))(\S+))?$""")
}

/** CAST(ttz AS VARCHAR): 'HH:mm:ss.SSS <zone-as-stored>'. */
case class TtzToString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row == null || row.isNullAt(0) || row.isNullAt(1)) return null
    val zone = row.getUTF8String(1).toString
    val w = Ttz.wallMillisOfDay(row.getLong(0), zone)
    UTF8String.fromString("%02d:%02d:%02d.%03d %s".format(
      w / 3600000L, w / 60000L % 60, w / 1000L % 60, w % 1000L, zone))
  }
  override protected def withNewChildInternal(c: Expression): TtzToString =
    copy(child = c)
}

/** CAST(TIME AS VARCHAR): fixed 'HH:mm:ss.SSS' — the reference always
  * renders TIME with exactly three fractional digits
  * (MAIN/util/DateTimeUtils.java TIME_FORMATTER / TimeOperators
  * castToSlice); Spark's native TIME→STRING cast strips trailing
  * fractional zeros ('….680' → '….68'). */
case class TimeToString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val m = v.asInstanceOf[Long] / 1000000L // nanos-of-day → millis-of-day
    UTF8String.fromString("%02d:%02d:%02d.%03d".format(
      m / 3600000L, m / 60000L % 60, m / 1000L % 60, m % 1000L))
  }
  override protected def withNewChildInternal(c: Expression): TimeToString =
    copy(child = c)
}

/** Type-dispatched builder behind graft_to_ttz / CAST(x AS TIME WITH TIME
  * ZONE): string parses; TIME coerces at the session zone (UTC Engine
  * sessions — wall == UTC millis); tstz keeps (instant's time-of-day at
  * its zone, zone); zone-less timestamp takes its time-of-day at UTC. */
case class TtzCast(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case dt if Ttz.isTtz(dt) => child
    case _: StringType => TtzParse(child)
    case _: TimeType => TimeToTtz(child)
    case dt if Tstz.isTstz(dt) => TtzFromTstz(child)
    case _: TimestampType => TimestampToTtz(child)
    case _ => TtzParse(Cast(child, StringType))
  }
  override protected def withNewChildInternal(c: Expression): TtzCast =
    copy(child = c)
}

/** Spark TIME (nanos-of-day, session-zone wall clock) → ttz at the
  * session zone: utcMillis re-derived at the 1970-01-01 frame (the
  * reference's TimeWithTimeZone storage), so under UTC wall == utc. */
case class TimeToTtz(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Ttz.dataType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val z = Tstz.sessionZone
    val lt = java.time.LocalTime.ofNanoOfDay(
      (v.asInstanceOf[Long] / 1000000L) * 1000000L) // ms precision
    val utc = java.time.ZonedDateTime
      .of(java.time.LocalDate.EPOCH, lt,
        java.time.ZoneId.of(z, java.time.ZoneId.SHORT_IDS))
      .toInstant.toEpochMilli
    InternalRow(utc, UTF8String.fromString(z))
  }
  override protected def withNewChildInternal(c: Expression): TimeToTtz =
    copy(child = c)
}

/** Zone-less timestamp (LTZ micros — an instant) → ttz: its wall
  * time-of-day AT the session zone, tagged with that zone. */
case class TimestampToTtz(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Ttz.dataType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val z = Tstz.sessionZone
    val zid = java.time.ZoneId.of(z, java.time.ZoneId.SHORT_IDS)
    val micros = v.asInstanceOf[Long]
    val lt = java.time.Instant.EPOCH
      .plus(micros, java.time.temporal.ChronoUnit.MICROS)
      .atZone(zid).toLocalTime
    val ms = java.time.LocalTime.ofNanoOfDay((lt.toNanoOfDay / 1000000L) * 1000000L)
    val utc = java.time.ZonedDateTime
      .of(java.time.LocalDate.EPOCH, ms, zid).toInstant.toEpochMilli
    InternalRow(utc, UTF8String.fromString(z))
  }
  override protected def withNewChildInternal(c: Expression): TimestampToTtz =
    copy(child = c)
}

/** tstz → ttz: the instant's time-of-day AT the value's zone, zone kept. */
case class TtzFromTstz(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Ttz.dataType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row == null || row.isNullAt(0) || row.isNullAt(1)) return null
    val zone = row.getUTF8String(1).toString
    val zid = java.time.ZoneId.of(zone, java.time.ZoneId.SHORT_IDS)
    val micros = row.getLong(0)
    val zdt = java.time.Instant.EPOCH
      .plus(micros, java.time.temporal.ChronoUnit.MICROS).atZone(zid)
    val wall = zdt.toLocalTime.toNanoOfDay / 1000000L
    val utc = java.time.ZonedDateTime
      .of(java.time.LocalDate.EPOCH, java.time.LocalTime.ofNanoOfDay(
        wall * 1000000L), zid).toInstant.toEpochMilli
    InternalRow(utc, UTF8String.fromString(zone))
  }
  override protected def withNewChildInternal(c: Expression): TtzFromTstz =
    copy(child = c)
}

/** ttz → Spark TIME (non-legacy cast: the WALL clock in the value's zone —
  * DateTimeTestingUtils.sqlTimeOf non-legacy arm). */
case class TtzToTime(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = TimeType()
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row == null || row.isNullAt(0) || row.isNullAt(1)) return null
    Ttz.wallMillisOfDay(row.getLong(0),
      row.getUTF8String(1).toString) * 1000000L
  }
  override protected def withNewChildInternal(c: Expression): TtzToTime =
    copy(child = c)
}

/** ttz → zone-less timestamp 1970-01-01T<wall> (non-legacy cast). */
case class TtzToTimestamp(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row == null || row.isNullAt(0) || row.isNullAt(1)) return null
    Ttz.wallMillisOfDay(row.getLong(0),
      row.getUTF8String(1).toString) * 1000L
  }
  override protected def withNewChildInternal(c: Expression): TtzToTimestamp =
    copy(child = c)
}

/** ttz → tstz: 1970-01-01 wall clock in the value's zone, zone kept
  * (SqlTimestampWithTimeZone of the same millisUtc in the reference). */
case class TtzToTstz(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = Tstz.dataType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row == null || row.isNullAt(0) || row.isNullAt(1)) return null
    InternalRow(row.getLong(0) * 1000L, row.getUTF8String(1).copy())
  }
  override protected def withNewChildInternal(c: Expression): TtzToTstz =
    copy(child = c)
}

/** timezone_hour / timezone_minute over ttz: the value's zone offset at
  * the 1970-01-01 frame. */
case class TtzZonePart(child: Expression, minutePart: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row == null || row.isNullAt(0) || row.isNullAt(1)) return null
    val off = Ttz.offsetMillis(row.getUTF8String(1).toString,
      row.getLong(0)) / 1000L
    if (minutePart) (off % 3600) / 60L else off / 3600L
  }
  override protected def withNewChildInternal(c: Expression): TtzZonePart =
    copy(child = c)
}

/** ttz − ttz → interval day-time on millisUtc (the reference's
  * TimeWithTimeZoneOperators.subtract). */
case class TtzSubtract(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DayTimeIntervalType()
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val lm = l.asInstanceOf[InternalRow]
    val rm = r.asInstanceOf[InternalRow]
    if (lm.isNullAt(0) || rm.isNullAt(0)) null
    else (lm.getLong(0) - rm.getLong(0)) * 1000L
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : TtzSubtract = copy(left = l, right = r)
}
