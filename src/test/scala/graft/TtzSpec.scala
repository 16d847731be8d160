package graft

import org.scalatest.funsuite.AnyFunSuite

/** TIME WITH TIME ZONE (functions/Ttz.scala).
  *
  * Assertions mirror the reference's own suite —
  * MAIN/test/type/TestTimeWithTimeZoneBase.java (non-legacy arm,
  * TestTimeWithTimeZone.java): literal forms, millisUtc-only comparison
  * (03:04:05.321 +07:09 = 02:04:05.321 +06:09), subtraction to an
  * interval, and the non-legacy casts (→ time / → timestamp take the WALL
  * clock; → varchar renders 'HH:mm:ss.SSS <zone>'; → timestamp with time
  * zone keeps instant + zone). The reference session uses zone +06:09;
  * comparisons against zone-less TIME pin that coercion with explicit
  * ttz literals instead (the Engine session zone is UTC). */
class TtzSpec extends AnyFunSuite {
  import TestSession._

  private lazy val e = Engine(spark)
  private def one(sql: String): Any = e.sql(s"SELECT $sql").collect()(0).get(0)

  val W = "TIME '03:04:05.321 +07:09'"

  test("literal forms parse and render as the reference formats them") {
    assert(one(s"cast($W as varchar)") == "03:04:05.321 +07:09")
    assert(one("cast(TIME '03:04:05 +07:09' as varchar)") == "03:04:05.000 +07:09")
    assert(one("cast(TIME '03:04 +07:09' as varchar)") == "03:04:00.000 +07:09")
    assert(one("cast(TIME '3:4:5.321+07:09' as varchar)") == "03:04:05.321 +07:09")
    assert(one("cast(TIME '3:4+07:09' as varchar)") == "03:04:00.000 +07:09")
    // named zone survives as stored
    assert(one("cast(TIME '03:04:05.321 Asia/Kathmandu' as varchar)")
      == "03:04:05.321 Asia/Kathmandu")
  }

  test("comparison uses millisUtc only (equal instants across zones are equal)") {
    assert(one(s"$W = TIME '02:04:05.321 +06:09'") == true)
    assert(one(s"$W = TIME '03:04:05.333 +07:09'") == false)
    assert(one(s"$W <> TIME '02:04:05.333 +06:09'") == true)
    assert(one(s"$W < TIME '02:04:05.333 +06:09'") == true)
    assert(one(s"$W < TIME '02:04:05.321 +06:09'") == false)
    assert(one(s"$W <= TIME '02:04:05.321 +06:09'") == true)
    assert(one(s"$W > TIME '02:04:05.111 +06:09'") == true)
    assert(one(s"$W >= TIME '02:04:05.321 +06:09'") == true)
    assert(one(s"$W between TIME '02:04:05.111 +06:09' and TIME '02:04:05.333 +06:09'")
      == true)
    assert(one(s"$W between TIME '03:04:05.322 +07:09' and TIME '03:04:05.333 +07:09'")
      == false)
  }

  test("comparison against zone-less TIME coerces at the session zone (UTC)") {
    // 03:04:05.321 +07:09 has UTC wall 19:55:05.321 the previous day —
    // millisUtc is negative; TIME '19:55:05.321' at UTC is +71705321 ms,
    // so equality needs a literal whose UTC matches: 03:04:05.321 UTC
    assert(one("TIME '03:04:05.321 +00:00' = TIME '03:04:05.321'") == true)
    assert(one("TIME '04:04:05.321 +01:00' = TIME '03:04:05.321'") == true)
    assert(one("TIME '04:04:05.321 +01:00' < TIME '03:04:05.400'") == true)
  }

  test("subtraction yields an interval on millisUtc") {
    assert(one("cast(TIME '14:15:16.432 +07:09' - TIME '03:04:05.321 +08:09' as varchar)")
      .toString.contains("12:11:11.111"))
    assert(one("TIME '03:04:05.321 +08:09' < TIME '14:15:16.432 +07:09'") == true)
  }

  test("non-legacy casts: wall clock to time/timestamp; instant+zone to tstz") {
    assert(one(s"cast(cast($W as time) as varchar)").toString.startsWith("03:04:05.321"))
    assert(one(s"cast(cast($W as timestamp) as varchar)").toString
      .startsWith("1970-01-01 03:04:05.321"))
    assert(one(s"cast(cast($W as timestamp with time zone) as varchar)")
      == "1970-01-01 03:04:05.321 +07:09")
    // round-trips: time → ttz at the session zone; ttz → ttz identity
    assert(one("cast(cast(TIME '03:04:05.321' as time with time zone) as varchar)")
      == "03:04:05.321 UTC")
    assert(one(s"cast(cast($W as time with time zone) as varchar)")
      == "03:04:05.321 +07:09")
  }

  test("extractors view the wall clock; timezone_hour/minute expose the offset") {
    assert(one(s"hour($W)") == 3L || one(s"hour($W)") == 3)
    assert(one(s"minute($W)") == 4L || one(s"minute($W)") == 4)
    assert(one(s"second($W)") == 5L || one(s"second($W)") == 5)
    assert(one(s"timezone_hour($W)") == 7L)
    assert(one(s"timezone_minute($W)") == 9L)
  }

  test("GROUP BY / ORDER BY / DISTINCT key on millisUtc") {
    val grouped = e.sql(
      "SELECT count(*) AS n FROM (VALUES TIME '03:04:05.321 +07:09', " +
        "TIME '02:04:05.321 +06:09', TIME '03:04:05.333 +07:09') t(x) GROUP BY x")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(grouped == Seq(1L, 2L))
    val distinct = e.sql(
      "SELECT count(DISTINCT x) AS n FROM (VALUES TIME '03:04:05.321 +07:09', " +
        "TIME '02:04:05.321 +06:09', TIME '03:04:05.333 +07:09') t(x)")
      .collect()(0).getLong(0)
    assert(distinct == 2L)
    val ordered = e.sql(
      "SELECT cast(x AS varchar) AS r FROM (VALUES TIME '03:04:05.321 +07:09', " +
        "TIME '01:04:05.321 +06:09') t(x) ORDER BY x")
      .collect().map(_.getString(0)).toSeq
    // 01:04+06:09 has the earlier instant
    assert(ordered == Seq("01:04:05.321 +06:09", "03:04:05.321 +07:09"))
  }

  test("current_time is TIME WITH TIME ZONE at the session zone; localtime stays TIME") {
    // bare keyword AND callable forms; ms precision (Presto TIME is ms),
    // rendered with EXACTLY 3 fractional digits (TimeOperators.castToSlice
    // via DateTimeUtils.TIME_FORMATTER) — TimeToString pads.
    val ct = one("cast(current_time as varchar)").toString
    assert(ct.matches("\\d{2}:\\d{2}:\\d{2}\\.\\d{3} UTC"), ct)
    val lt = one("cast(localtime as varchar)").toString
    assert(lt.matches("\\d{2}:\\d{2}:\\d{2}\\.\\d{3}"), lt)
    // ttz-typed: timezone_hour works on it (would fail on plain TIME)
    assert(one("timezone_hour(current_time)") == 0L)
  }
}
