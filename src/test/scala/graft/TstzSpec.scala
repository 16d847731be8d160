package graft

import org.scalatest.funsuite.AnyFunSuite

/** Zone-preserving TIMESTAMP WITH TIME ZONE (functions/Tstz.scala).
  *
  * Assertions mirror the reference's own zone tests where representable:
  * MAIN/test/operator/scalar/TestDateTimeFunctionsBase.java — the
  * WEIRD_TIMESTAMP_LITERAL suite (`TIMESTAMP '2001-08-22 03:04:05.321
  * +07:09'`, lines 280-296: field extractors read the WALL time in the
  * value's zone; timezone_hour/minute expose the packed zone), plus the
  * TestCharOperators-style operator semantics from DateTimeOperators
  * (instant-only comparison) and DateTimeUtils' rendering format. */
class TstzSpec extends AnyFunSuite {
  import TestSession._

  private lazy val e = Engine(spark)
  private def one(sql: String): Any = e.sql(s"SELECT $sql").collect()(0).get(0)

  val W = "TIMESTAMP '2001-08-22 03:04:05.321 +07:09'"

  test("WEIRD_TIMESTAMP field extractors (TestDateTimeFunctionsBase L280-296)") {
    assert(one(s"second($W)") == 5)
    assert(one(s"minute($W)") == 4)
    assert(one(s"hour($W)") == 3)
    assert(one(s"day_of_week($W)") == 3) // 2001-08-22 is a Wednesday
    assert(one(s"dow($W)") == 3)
    assert(one(s"day($W)") == 22)
    assert(one(s"day_of_month($W)") == 22)
    assert(one(s"day_of_year($W)") == 234)
    assert(one(s"doy($W)") == 234)
    assert(one(s"week($W)") == 34)
    assert(one(s"week_of_year($W)") == 34)
    assert(one(s"month($W)") == 8)
    assert(one(s"quarter($W)") == 3)
    assert(one(s"year($W)") == 2001)
    assert(one(s"timezone_minute($W)") == 9L)
    assert(one(s"timezone_hour($W)") == 7L)
  }

  test("region zones carry DST-correct offsets (DateTimeZoneIndex)") {
    // Kathmandu is +05:45 year-round
    val k = "TIMESTAMP '2017-03-01 10:00:00 Asia/Kathmandu'"
    assert(one(s"timezone_hour($k)") == 5L)
    assert(one(s"timezone_minute($k)") == 45L)
    // Berlin: +01:00 in winter, +02:00 in summer (same zone id!)
    assert(one("timezone_hour(TIMESTAMP '2017-01-15 10:00:00 Europe/Berlin')") == 1L)
    assert(one("timezone_hour(TIMESTAMP '2017-07-15 10:00:00 Europe/Berlin')") == 2L)
  }

  test("rendering matches DateTimeUtils TIMESTAMP_WITH_TIME_ZONE_FORMATTER") {
    assert(one(s"CAST($W AS VARCHAR)") == "2001-08-22 03:04:05.321 +07:09")
    assert(one("CAST(TIMESTAMP '2017-03-01 10:00 Asia/Kathmandu' AS VARCHAR)")
      == "2017-03-01 10:00:00.000 Asia/Kathmandu")
  }

  test("comparison is instant-only (DateTimeOperators)") {
    assert(one("TIMESTAMP '2017-03-01 10:00:00 UTC' = " +
      "TIMESTAMP '2017-03-01 05:00:00 -05:00'") == true)
    assert(one("TIMESTAMP '2017-03-01 10:00:00 +05:45' < " +
      "TIMESTAMP '2017-03-01 10:00:00 UTC'") == true)
    // tstz vs zone-less timestamp (coerces at the session zone, UTC)
    assert(one("TIMESTAMP '2017-03-01 10:00:00 +01:00' = " +
      "TIMESTAMP '2017-03-01 09:00:00'") == true)
  }

  test("AT TIME ZONE keeps the instant, moves the zone (DesugarAtTimeZone)") {
    assert(one("CAST(TIMESTAMP '2017-03-01 10:00:00 UTC' AT TIME ZONE " +
      "'America/Los_Angeles' AS VARCHAR)")
      == "2017-03-01 02:00:00.000 America/Los_Angeles")
    // reference spelling with an interval offset (TestDateTimeFunctions)
    assert(one("CAST(TIMESTAMP '2017-03-01 10:00:00 UTC' AT TIME ZONE " +
      "INTERVAL '07:09' HOUR TO MINUTE AS VARCHAR)")
      == "2017-03-01 17:09:00.000 +07:09")
    // at_timezone() function form over a zone-less timestamp
    assert(one("CAST(at_timezone(TIMESTAMP '2024-01-01 12:00:00', " +
      "'America/New_York') AS VARCHAR)")
      == "2024-01-01 07:00:00.000 America/New_York")
  }

  test("with_timezone interprets the wall time in the zone") {
    assert(one("CAST(with_timezone(TIMESTAMP '2017-03-01 10:00:00', " +
      "'Asia/Kathmandu') AS VARCHAR)")
      == "2017-03-01 10:00:00.000 Asia/Kathmandu")
    // round-trips to the right instant — and HISTORICALLY correct offsets:
    // Nepal was +05:30 until 1986, so epoch-era wall 05:45 is 00:15 UTC
    assert(one("to_unixtime(with_timezone(TIMESTAMP '1970-01-01 05:45:00', " +
      "'Asia/Kathmandu'))") == 900.0)
    assert(one("to_unixtime(with_timezone(TIMESTAMP '2001-08-22 05:45:00', " +
      "'Asia/Kathmandu'))") ==
      one("to_unixtime(TIMESTAMP '2001-08-22 00:00:00')"))
  }

  test("casts to/from the zone-less types") {
    assert(one(s"CAST(CAST($W AS TIMESTAMP) AS VARCHAR)")
      == "2001-08-21 19:55:05.321") // the UTC instant
    assert(one(s"CAST($W AS DATE)").toString == "2001-08-22") // wall date
    assert(one("CAST(CAST('2017-03-01 10:00:00 Asia/Kathmandu' " +
      "AS TIMESTAMP WITH TIME ZONE) AS VARCHAR)")
      == "2017-03-01 10:00:00.000 Asia/Kathmandu")
    // zone-less string parses at the session zone (UTC)
    assert(one("CAST(CAST('2017-03-01 10:00:00' " +
      "AS TIMESTAMP WITH TIME ZONE) AS VARCHAR)")
      == "2017-03-01 10:00:00.000 UTC")
  }

  test("to_iso8601 renders the value-zone offset") {
    assert(one("to_iso8601(TIMESTAMP '2017-03-01 10:00:00 Asia/Kathmandu')")
      == "2017-03-01T10:00:00.000+05:45")
    assert(one(s"to_iso8601($W)") == "2001-08-22T03:04:05.321+07:09")
  }

  test("format functions view the wall time") {
    assert(one(s"format_datetime($W, 'yyyy/MM/dd HH:mm:ss')")
      == "2001/08/22 03:04:05")
    assert(one(s"date_format($W, '%Y-%m-%d %H:%i:%s')")
      == "2001-08-22 03:04:05")
  }

  test("date_trunc preserves the type and the zone (truncate in value zone)") {
    // truncateTimestampWithTimeZone: truncate the WALL time in the value's
    // zone, return timestamp with time zone in the SAME zone
    assert(one(s"CAST(date_trunc('hour', $W) AS VARCHAR)")
      == "2001-08-22 03:00:00.000 +07:09")
    assert(one("CAST(date_trunc('day', " +
      "TIMESTAMP '2017-03-01 10:20:30 Asia/Kathmandu') AS VARCHAR)")
      == "2017-03-01 00:00:00.000 Asia/Kathmandu")
  }

  test("GROUP BY / DISTINCT dedup by INSTANT, not (instant, zone)") {
    // TimestampWithTimeZoneType equality/hash read only the packed millis:
    // the same instant tagged with different zones is ONE group
    assert(one("count(*) FROM (SELECT DISTINCT ts FROM (VALUES " +
      "TIMESTAMP '2017-03-01 10:00:00 UTC', " +
      "TIMESTAMP '2017-03-01 05:00:00 -05:00', " +
      "TIMESTAMP '2017-03-01 11:00:00 UTC') t(ts))") == 2L)
    val grouped = e.sql("SELECT ts, count(*) AS n FROM (VALUES " +
      "TIMESTAMP '2017-03-01 10:00:00 UTC', " +
      "TIMESTAMP '2017-03-01 05:00:00 -05:00', " +
      "TIMESTAMP '2017-03-01 11:00:00 UTC') t(ts) GROUP BY ts ORDER BY 2 DESC")
      .collect()
    assert(grouped.length == 2)
    assert(grouped(0).getLong(1) == 2L && grouped(1).getLong(1) == 1L)
  }

  test("window PARTITION BY over tstz keys on the INSTANT") {
    // same instant, different zone renderings → ONE window partition;
    // the function argument keeps the full value (zone intact)
    val rows = e.sql("SELECT CAST(ts AS VARCHAR) AS r, " +
      "count(*) OVER (PARTITION BY ts) AS n FROM (VALUES " +
      "TIMESTAMP '2017-03-01 10:00:00 UTC', " +
      "TIMESTAMP '2017-03-01 05:00:00 -05:00', " +
      "TIMESTAMP '2017-03-01 11:00:00 UTC') t(ts)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows("2017-03-01 10:00:00.000 UTC") == 2L)
    assert(rows("2017-03-01 05:00:00.000 -05:00") == 2L)
    assert(rows("2017-03-01 11:00:00.000 UTC") == 1L)
    // window ORDER BY sorts by instant too: lag crosses zone renderings
    val lagged = e.sql("SELECT CAST(lag(ts) OVER (ORDER BY ts) AS VARCHAR) AS p " +
      "FROM (VALUES " +
      "TIMESTAMP '2017-03-01 10:00:00 +05:45', " + // 04:15 UTC (first)
      "TIMESTAMP '2017-03-01 09:00:00 UTC') t(ts) ORDER BY ts")
      .collect().map(_.getString(0)).toSeq
    assert(lagged == Seq(null, "2017-03-01 10:00:00.000 +05:45"))
  }

  test("date_add/date_diff preserve the zone; calendar units are wall/DST-aware") {
    // time unit: instant shift, zone kept
    assert(one("to_iso8601(date_add('hour', 2, " +
      "TIMESTAMP '2001-08-22 03:04:05.321 +07:09'))")
      == "2001-08-22T05:04:05.321+07:09")
    // calendar unit across the US spring-forward: wall time preserved,
    // offset moves -08:00 → -07:00 (the reference adds via the zone's
    // chronology — addFieldValueTimestampWithTimeZone)
    assert(one("to_iso8601(date_add('day', 1, " +
      "TIMESTAMP '2017-03-11 20:00:00 America/Los_Angeles'))")
      == "2017-03-12T20:00:00.000-07:00")
    // diff on time units uses instants across zones
    assert(one("date_diff('hour', TIMESTAMP '2001-08-22 03:04:05 +07:09', " +
      "TIMESTAMP '2001-08-23 03:04:05 +00:00')") == 31L)
    // diff on calendar units counts wall days in the tstz operand's zone
    assert(one("date_diff('day', TIMESTAMP '2017-03-01 23:00:00 -05:00', " +
      "TIMESTAMP '2017-03-02 23:30:00 -05:00')") == 1L)
  }

  test("format_datetime renders wall time AND zone tokens in the value's zone") {
    // zone id token (Joda ZZZ) prints the stored zone, not the session's
    assert(one("format_datetime(TIMESTAMP '2017-06-01 10:00:00 " +
      "America/Los_Angeles', 'yyyy-MM-dd HH:mm ZZZ')")
      == "2017-06-01 10:00 America/Los_Angeles")
    // offset tokens at the value's zone/instant (PDT = -0700 / -07:00)
    assert(one("format_datetime(TIMESTAMP '2017-06-01 10:00:00 " +
      "America/Los_Angeles', 'HH:mm Z')") == "10:00 -0700")
    assert(one("format_datetime(TIMESTAMP '2017-06-01 10:00:00 " +
      "America/Los_Angeles', 'HH:mm ZZ')") == "10:00 -07:00")
    // short zone NAME at the instant (DST-aware)
    assert(one("format_datetime(TIMESTAMP '2017-01-01 10:00:00 " +
      "America/Los_Angeles', 'HH:mm z')") == "10:00 PST")
    // non-tstz input keeps Spark's session-zone semantics
    assert(one("format_datetime(TIMESTAMP '2017-06-01 10:00:00', " +
      "'yyyy-MM-dd HH:mm')") == "2017-06-01 10:00")
  }

  test("ORDER BY over tstz sorts by instant") {
    val rows = e.sql("SELECT CAST(ts AS VARCHAR) AS rendered FROM (VALUES " +
      "TIMESTAMP '2017-03-01 10:00:00 +05:45', " + // 04:15 UTC
      "TIMESTAMP '2017-03-01 05:00:00 -05:00', " + // 10:00 UTC
      "TIMESTAMP '2017-03-01 09:00:00 UTC') t(ts) ORDER BY ts")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq(
      "2017-03-01 10:00:00.000 +05:45",
      "2017-03-01 09:00:00.000 UTC",
      "2017-03-01 05:00:00.000 -05:00"))
  }
}
