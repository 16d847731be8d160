package graft

import org.scalatest.funsuite.AnyFunSuite

/** Non-UTC session timezone (round-13: the documented ScalarFnCorpusSpec
  * exclusion class shrinks). The reference runs its date/time suite at a
  * session zone of Asia/Kabul — a half-hour-offset zone (+04:30), the
  * hardest case for offset arithmetic
  * (MAIN/operator/scalar/TestDateTimeFunctionsBase.java:83
  * `TIME_ZONE_KEY = getTimeZoneKey("Asia/Kabul")`). Engine sessions now
  * accept `SET TIME ZONE '<id>'` / `SET SESSION timezone='<id>'`
  * (mapped onto spark.sql.session.timeZone, which Spark's own
  * parse/extract/render AND the tstz/ttz machinery read); assertions
  * below transcribe the session-zone-dependent reference expectations. */
class SessionZoneSpec extends AnyFunSuite {
  import TestSession._

  private def one(e: Engine, sql: String): Any =
    e.sql(s"SELECT $sql").collect()(0).get(0)

  private def atKabul[T](f: Engine => T): T = {
    val e = Engine(spark)
    e.sql("SET TIME ZONE 'Asia/Kabul'")
    try f(e)
    finally e.sql("SET TIME ZONE LOCAL")
  }

  test("SET TIME ZONE round trip: current_timezone() follows the session") {
    val e = Engine(spark)
    assert(one(e, "current_timezone()") == "UTC")
    e.sql("SET TIME ZONE 'Asia/Kabul'")
    try assert(one(e, "current_timezone()") == "Asia/Kabul")
    finally e.sql("SET TIME ZONE LOCAL")
    assert(one(e, "current_timezone()") == "UTC")
    // the property spelling too
    e.sql("SET SESSION timezone='Pacific/Kiritimati'")
    try assert(one(e, "current_timezone()") == "Pacific/Kiritimati")
    finally e.sql("RESET SESSION timezone")
    assert(one(e, "current_timezone()") == "UTC")
  }

  test("SET TIME ZONE rejects an invalid zone id") {
    val e = Engine(spark)
    assertThrows[Exception](e.sql("SET TIME ZONE 'Not/AZone'"))
    assert(one(e, "current_timezone()") == "UTC")
  }

  test("timezone_hour/minute of a zone-less timestamp = session offset " +
      "(reference: timezone_hour(TIMESTAMP_LITERAL) = 4, Kabul +04:30)") {
    atKabul { e =>
      assert(one(e, "timezone_hour(TIMESTAMP '2001-08-22 03:04:05.321')") == 4L)
      assert(one(e, "timezone_minute(TIMESTAMP '2001-08-22 03:04:05.321')") == 30L)
      // EXTRACT spellings route to the same functions
      assert(one(e, "EXTRACT(TIMEZONE_HOUR FROM TIMESTAMP '2001-08-22 03:04:05.321')") == 4L)
      assert(one(e, "EXTRACT(TIMEZONE_MINUTE FROM TIMESTAMP '2001-08-22 03:04:05.321')") == 30L)
    }
  }

  test("a zone-carrying literal keeps ITS zone regardless of session " +
      "(reference WEIRD_TIMESTAMP at +07:09)") {
    atKabul { e =>
      assert(one(e, "hour(TIMESTAMP '2001-08-22 03:04:05.321 +07:09')") == 3L)
      assert(one(e, "minute(TIMESTAMP '2001-08-22 03:04:05.321 +07:09')") == 4L)
      assert(one(e, "timezone_hour(TIMESTAMP '2001-08-22 03:04:05.321 +07:09')") == 7L)
      assert(one(e, "timezone_minute(TIMESTAMP '2001-08-22 03:04:05.321 +07:09')") == 9L)
    }
  }

  test("zone-less wall extraction is session-consistent (parse and extract " +
      "agree on the wall clock)") {
    atKabul { e =>
      assert(one(e, "hour(TIMESTAMP '2001-08-22 03:04:05.321')") == 3L)
      assert(one(e, "day(TIMESTAMP '2001-08-22 03:04:05.321')") == 22L)
      assert(one(e, "year(TIMESTAMP '2001-08-22 03:04:05.321')") == 2001L)
    }
  }

  test("CAST to timestamp with time zone tags the session zone " +
      "(reference parseTimestampWithTimeZone: zone defaults to session)") {
    atKabul { e =>
      assert(one(e,
        "CAST(CAST('2001-08-22 03:04:05.321' AS TIMESTAMP WITH TIME ZONE) AS VARCHAR)")
        == "2001-08-22 03:04:05.321 Asia/Kabul")
      // wall time preserved through the tag
      assert(one(e,
        "hour(CAST('2001-08-22 03:04:05.321' AS TIMESTAMP WITH TIME ZONE))") == 3L)
      // and the instant is the Kabul interpretation: back at UTC it shifts
      assert(one(e,
        "CAST(at_timezone(CAST('2001-08-22 03:04:05.321' AS TIMESTAMP WITH TIME ZONE), 'UTC') AS VARCHAR)")
        == "2001-08-21 22:34:05.321 UTC")
    }
  }

  test("CAST to time with time zone tags the session zone") {
    atKabul { e =>
      assert(one(e,
        "CAST(CAST('03:04:05.321' AS TIME WITH TIME ZONE) AS VARCHAR)")
        == "03:04:05.321 Asia/Kabul")
      assert(one(e, "timezone_hour(CAST('03:04:05.321' AS TIME WITH TIME ZONE))") == 4L)
      assert(one(e, "timezone_minute(CAST('03:04:05.321' AS TIME WITH TIME ZONE))") == 30L)
    }
  }

  test("current_time / current_timestamp carry the session zone; " +
      "current_date is the date at the session zone") {
    atKabul { e =>
      assert(one(e, "timezone_hour(current_time)") == 4L)
      assert(one(e, "timezone_minute(current_time)") == 30L)
      val d = one(e, "CAST(current_date AS VARCHAR)").toString
      val expected = java.time.LocalDate.now(
        java.time.ZoneId.of("Asia/Kabul")).toString
      // tolerate a midnight rollover between the two clock reads
      val alt = java.time.LocalDate.now(
        java.time.ZoneId.of("Asia/Kabul")).toString
      assert(d == expected || d == alt, s"current_date=$d expected=$expected")
    }
  }

  test("from_unixtime renders the session-zone wall " +
      "(reference testFromUnixTime at DATE_TIME_ZONE)") {
    atKabul { e =>
      // DateTime(2001, 1, 22, 3, 4, 5, 0, Asia/Kabul).getMillis / 1000
      val epoch = java.time.ZonedDateTime.of(2001, 1, 22, 3, 4, 5, 0,
        java.time.ZoneId.of("Asia/Kabul")).toInstant.getEpochSecond
      val s = one(e, s"CAST(from_unixtime($epoch) AS VARCHAR)").toString
      assert(s.startsWith("2001-01-22 03:04:05"), s)
    }
  }

  test("value-zone wall in a session-zone DST gap stays exact (the wall " +
      "view is encoded through UTC, never the session's wall clock)") {
    // Session America/New_York: 2026-03-08 02:00–03:00 EST wall times do
    // not exist (spring forward). A Tokyo tstz whose WALL lands at 02:30
    // must still extract hour()=2, truncate to 02:00, and add days on the
    // 02:30 wall — the old session-wall round-trip shifted all of these
    // by the gap.
    val e = Engine(spark)
    e.sql("SET TIME ZONE 'America/New_York'")
    try {
      val t = "TIMESTAMP '2026-03-08 02:30:45.123 Asia/Tokyo'"
      assert(one(e, s"hour($t)") == 2L)
      assert(one(e, s"minute($t)") == 30L)
      assert(one(e, s"day($t)") == 8L)
      assert(one(e, s"millisecond($t)") == 123)
      assert(one(e, s"CAST(date_trunc('hour', $t) AS VARCHAR)") ==
        "2026-03-08 02:00:00.000 Asia/Tokyo")
      assert(one(e, s"CAST(date_add('day', 1, $t) AS VARCHAR)") ==
        "2026-03-09 02:30:45.123 Asia/Tokyo")
      assert(one(e, s"date_format($t, '%H:%i:%s')") == "02:30:45")
      assert(one(e, s"CAST($t AS DATE)").toString == "2026-03-08")
      // and the session zone's OWN gap math is untouched: epoch of the
      // instant is zone-independent
      assert(one(e, s"to_unixtime($t)") ==
        java.time.ZonedDateTime.of(2026, 3, 8, 2, 30, 45, 0,
          java.time.ZoneId.of("Asia/Tokyo")).toEpochSecond.toDouble)
    } finally e.sql("SET TIME ZONE LOCAL")
  }

  test("the UTC default is unchanged: all of the above collapse to the " +
      "fixed-UTC behavior without SET TIME ZONE") {
    val e = Engine(spark)
    assert(one(e, "timezone_hour(TIMESTAMP '2001-08-22 03:04:05.321')") == 0L)
    assert(one(e,
      "CAST(CAST('2001-08-22 03:04:05.321' AS TIMESTAMP WITH TIME ZONE) AS VARCHAR)")
      == "2001-08-22 03:04:05.321 UTC")
  }
}
