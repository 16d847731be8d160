package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Per-function assertions through Engine.sql — the analogue of the
  * reference's FunctionAssertions.assertFunction (MAINT/operator/scalar/
  * FunctionAssertions.java:147): evaluate a Presto-dialect expression, check
  * the exact value. */
class FunctionsSpec extends AnyFunSuite {
  import TestSession._

  private lazy val engine = Engine(spark).loadCatalog(sf)

  private def one(exprSql: String): Any =
    engine.sql(s"SELECT $exprSql AS v").head.get(0)

  def assertFn(exprSql: String, expected: Any): Unit =
    assert(one(exprSql) == expected, s"for $exprSql")

  test("presto split treats the delimiter literally") {
    assert(one("split('a.b.c', '.')") == Seq("a", "b", "c"))
    assert(one("split('a|b|c', '|')") == Seq("a", "b", "c"))
    assert(one("split('x1y2z', 'DIGIT')") == Seq("x1y2z"))
  }

  test("split_part: literal delimiter, empty fields, null out-of-range") {
    assertFn("split_part('a.b.c', '.', 2)", "b")
    assertFn("split_part('a,,b', ',', 2)", "") // real empty field stays ''
    assertFn("split_part('a,b', ',', 5)", null) // out of range → NULL
  }

  test("presto arg-order + zero-start divergences") {
    assertFn("log(8, 2)", 3.0) // Presto log(number, base)
    assertFn("ltrim('xxhix', 'x')", "hix") // Presto (src, chars)
    assertFn("rtrim('hixx', 'x')", "hi")
    assertFn("trim('xhix', 'x')", "hi")
    assertFn("substr('abc', 0)", "") // Presto zero start → ''
    assertFn("substr('abcde', 2)", "bcde")
    assertFn("substr('abcde', -2)", "de")
    assertFn("substr('abcde', 2, 2)", "bc")
    assertFn("substr('abc', 0, 2)", "")
    // RETURN_NULL_ON_NULL: any null argument nulls the result
    assertFn("greatest(1, 2, 3)", 3)
    assertFn("greatest(1, CAST(NULL AS INT), 3)", null)
    assertFn("least(5, 2)", 2)
    assertFn("least(CAST(NULL AS INT), 2)", null)
  }

  test("presto string functions") {
    assertFn("strpos('hello world', 'world')", 7)
    assertFn("strpos('hello', 'zzz')", 0)
    assertFn("codepoint('A')", 65)
    assertFn("levenshtein_distance('kitten', 'sitting')", 3)
    assertFn("word_stem('running')", "run")
    assertFn("word_stem('tables')", "tabl") // snowball porter2, like the reference
    assertFn("normalize('café')", "café")
    assertFn("split_to_map('a=1,b=2', ',', '=')['b']", "2")
  }

  test("repeat builds arrays; truncate with scale") {
    assert(one("repeat(7, 3)") == Seq(7, 7, 7))
    assert(one("repeat('x', 2)") == Seq("x", "x"))
    assertFn("truncate(3.14159, 2)", 3.14)
    assertFn("truncate(-3.14159, 3)", -3.141)
    assertFn("truncate(17.18)", 17.0)
    assertFn("truncate(-17.18)", -17.0)
  }

  test("presto math functions") {
    assertFn("to_base(255, 16)", "ff")
    assertFn("from_base('ff', 16)", 255L)
    assertFn("truncate(3.7)", 3.0)
    assertFn("truncate(-3.7)", -3.0)
    assertFn("is_nan(nan())", true)
    assertFn("is_finite(1.0)", true)
    assertFn("is_infinite(infinity())", true)
    assertFn("bitwise_and(12, 10)", 8)
    assertFn("bitwise_xor(12, 10)", 6)
  }

  test("presto datetime functions") {
    assertFn("date_format(TIMESTAMP '2001-02-03 04:05:06', '%Y-%m-%d')", "2001-02-03")
    assertFn("date_format(TIMESTAMP '2001-02-03 04:05:06', '%d/%m/%Y %H:%i:%s')",
      "03/02/2001 04:05:06")
    assertFn("CAST(date_parse('2001-02-03', '%Y-%m-%d') AS STRING)", "2001-02-03 00:00:00")
    assertFn("day_of_week(DATE '2024-01-07')", 7) // Sunday = 7 (ISO)
    assertFn("day_of_week(DATE '2024-01-08')", 1) // Monday = 1
    assertFn("to_unixtime(TIMESTAMP '1970-01-01 00:01:00')", 60.0)
    // ISO week-year: 2016-01-01 (Friday) belongs to ISO week 53 of 2015.
    assertFn("year_of_week(DATE '2016-01-01')", 2015)
    assertFn("yow(DATE '2024-06-15')", 2024)
    assertFn("millisecond(TIMESTAMP '2001-02-03 04:05:06.789')", 789)
    assertFn("millisecond(TIMESTAMP '2001-02-03 04:05:06')", 0)
    // to_iso8601 format follows the input TYPE (date vs timestamp)
    assertFn("to_iso8601(DATE '2024-03-05')", "2024-03-05")
    assertFn("to_iso8601(TIMESTAMP '2024-03-05 06:07:08.009')",
      "2024-03-05T06:07:08.009Z")
  }

  test("TIME type: literals, casts, extracts, arithmetic, localtime") {
    // Presto has a first-class TIME type (SPI/type/TimeType.java) — Engine
    // sessions enable Spark 4.1's TimeType so the surface works natively.
    assertFn("TIME '12:34:56.123'", java.time.LocalTime.of(12, 34, 56, 123000000))
    assertFn("CAST('23:59:59' AS TIME)", java.time.LocalTime.of(23, 59, 59))
    assertFn("hour(TIME '12:34:56')", 12)
    assertFn("minute(TIME '12:34:56')", 34)
    assertFn("second(TIME '12:34:56')", 56)
    // interval→varchar renders Presto's format (IntervalDayTime
    // .formatMillis), not Spark's INTERVAL literal syntax
    assertFn("CAST(TIME '12:00:01' - TIME '11:00:00' AS STRING)",
      "0 01:00:01.000")
    // niladic keyword form isn't in Spark's grammar: callable as localtime()
    assert(one("localtime()").isInstanceOf[java.time.LocalTime])
    // ms precision — Presto's TIME is millisecond-resolution (TimeType.java)
    assert(one("typeof(localtime())") == "time(3)")
  }

  test("binary codec functions: big-endian, ieee754, base64url") {
    assertFn("from_big_endian_32(to_big_endian_32(123456))", 123456)
    assertFn("from_big_endian_32(to_big_endian_32(-7))", -7)
    assertFn("from_big_endian_64(to_big_endian_64(CAST(9876543210 AS BIGINT)))",
      9876543210L)
    assertFn("to_hex(to_big_endian_32(1))", "00000001")
    assertFn("from_ieee754_64(to_ieee754_64(3.1415))", 3.1415)
    assertFn("to_hex(to_ieee754_32(CAST(1.0 AS FLOAT)))", "3F800000")
    assertFn("from_utf8(from_base64url(to_base64url(to_utf8('a+b/c~d'))))",
      "a+b/c~d")
  }

  test("statistical scalars: normal_cdf, inverse, wilson, hamming") {
    assert(math.abs(one("normal_cdf(0, 1, 0)").asInstanceOf[Double] - 0.5) < 1e-12)
    assert(math.abs(one("normal_cdf(0, 1, 1.96)").asInstanceOf[Double] - 0.975)
      < 1e-3)
    assert(math.abs(one("inverse_normal_cdf(0, 1, 0.975)").asInstanceOf[Double]
      - 1.9599639845) < 1e-6)
    // round-trip
    assert(math.abs(one("inverse_normal_cdf(2, 3, normal_cdf(2, 3, 4.5))")
      .asInstanceOf[Double] - 4.5) < 1e-9)
    val lo = one("wilson_interval_lower(100, 200, 1.96)").asInstanceOf[Double]
    val hi = one("wilson_interval_upper(100, 200, 1.96)").asInstanceOf[Double]
    assert(lo > 0.43 && lo < 0.5 && hi > 0.5 && hi < 0.57 && lo < hi)
    assertFn("hamming_distance('karolin', 'kathrin')", 3L)
    assertFn("hamming_distance('', '')", 0L)
    intercept[Exception](one("hamming_distance('ab', 'abc')"))
  }

  test("approx_most_frequent: exact under capacity, MG bound over it") {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    import graft.{functions => F}
    // distincts (3) fit the capacity → exact counts, top-2 buckets
    val m = one("(SELECT approx_most_frequent(2, v, 8) FROM VALUES " +
      "('a'),('a'),('b'),('c'),('a'),('b') AS t(v))")
      .asInstanceOf[scala.collection.Map[String, Long]]
    assert(m == Map("a" -> 3L, "b" -> 2L))
    // over capacity: 'hot' (60 of 90 rows) must survive 2 counters against
    // 30 distinct cold keys, with count within the N/(capacity+1) MG bound
    val df = spark.range(0, 90).select(
      when(col("id") % 3 =!= lit(2), lit("hot"))
        .otherwise(concat(lit("c"), col("id"))).as("v"))
    val hh = df.agg(F.approx_most_frequent(1, col("v"), 2))
      .head.getMap[String, Long](0)
    assert(hh.keySet == Set("hot"), hh)
    assert(hh("hot") >= 60L - 90L / 3 && hh("hot") <= 60L, hh)
  }

  test("interval aggregates and approx_percentile array form") {
    // IntervalDayToSecondSum/AverageAggregation (FunctionRegistry.java):
    // Spark sums/averages ANSI intervals natively
    // casts render Presto's interval format (formatMillis/formatMonths)
    assertFn("CAST((SELECT sum(v) FROM VALUES (INTERVAL 1 DAY), " +
      "(INTERVAL 2 DAY) AS t(v)) AS STRING)", "3 00:00:00.000")
    assertFn("CAST((SELECT avg(v) FROM VALUES (INTERVAL 10 SECOND), " +
      "(INTERVAL 20 SECOND) AS t(v)) AS STRING)", "0 00:00:15.000")
    assertFn("CAST((SELECT sum(v) FROM VALUES (INTERVAL 1 YEAR), " +
      "(INTERVAL 2 MONTH) AS t(v)) AS STRING)", "1-2")
    // ApproximateLongPercentileArrayAggregations: array of percentiles
    val ps = one("(SELECT approx_percentile(v, array(0.0, 0.5, 1.0)) " +
      "FROM (SELECT explode(sequence(1, 100)) AS v))")
      .asInstanceOf[scala.collection.Seq[Int]]
    assert(ps.length == 3 && ps.head == 1 && ps.last == 100)
    // weighted forms (x, w, p[, accuracy]) — 0.206's 3rd arg is the WEIGHT
    // (ApproximateLongPercentileAggregations.java:57,78), not accuracy
    assertFn("(SELECT approx_percentile(v, w, 0.5) " +
      "FROM VALUES (1, 1), (2, 1), (3, 10) AS t(v, w))", 3.0)
    assertFn("(SELECT approx_percentile(v, w, 0.5, 0.01) " +
      "FROM VALUES (10, 5), (20, 1) AS t(v, w))", 10.0)
  }

  test("duration + timezone functions") {
    assertFn("to_milliseconds(parse_duration('1.5m'))", 90000L)
    assertFn("to_milliseconds(parse_duration('42ms'))", 42L)
    assertFn("to_milliseconds(parse_duration('2h'))", 7200000L)
    assertFn("to_milliseconds(INTERVAL '90' SECOND)", 90000L)
    // session zone is UTC in tests
    assertFn("timezone_hour(TIMESTAMP '2024-06-01 12:00:00')", 0L)
    assertFn("timezone_minute(TIMESTAMP '2024-06-01 12:00:00')", 0L)
    // zone-PRESERVING since the Tstz work: Presto's rendering, not the
    // old instant-only compromise (TstzSpec covers the full surface)
    assertFn("CAST(at_timezone(TIMESTAMP '2024-01-01 12:00:00', " +
      "'America/New_York') AS STRING)", "2024-01-01 07:00:00.000 America/New_York")
  }

  test("regexp_replace lambda form and zip") {
    // Presto doc example: capitalize each word via its capture groups
    // Presto string literals are raw (escapedStringLiterals): '\w' IS \w
    assertFn("regexp_replace('new york', '(\\w)(\\w*)', " +
      "x -> upper(element_at(x, 1)) || lower(element_at(x, 2)))", "New York")
    assertFn("regexp_replace('abc 123 def', '[0-9]+', x -> 'N')", "abc N def")
    // 2-arg form strips matches
    assertFn("regexp_replace('a1b2c3', '[0-9]')", "abc")
    assertFn("element_at(zip(array(1, 2), array('a', 'b')), 2).`1`", "b")
  }

  test("multimap + url port") {
    assert(one("multimap_from_entries(array(struct('a', 1), struct('b', 2), struct('a', 3)))['a']")
      == Seq(1, 3))
    assert(one("split_to_multimap('k1=v1,k2=v2,k1=v3', ',', '=')['k1']")
      == Seq("v1", "v3"))
    assertFn("url_extract_port('http://example.com:8042/over/there?name=x')", 8042L)
    assertFn("url_extract_port('http://example.com/over/there')", null)
  }

  test("array_agg keeps nulls") {
    val r = engine.sql(
      """SELECT array_agg(v) AS a FROM
        |VALUES (1), (CAST(NULL AS INT)), (3) AS t(v)""".stripMargin)
      .head.getSeq[Any](0)
    assert(r.count(_ == null) == 1 && r.filter(_ != null).toSet == Set(1, 3))
  }

  test("multimap_agg groups values per key; bitwise aggs") {
    val m = engine.sql(
      """SELECT multimap_agg(k, v) AS m FROM
        |VALUES ('a', 1), ('b', 2), ('a', 3) AS t(k, v)""".stripMargin)
      .head.getMap[String, scala.collection.Seq[Int]](0)
    assert(m("a").toSeq == Seq(1, 3) && m("b").toSeq == Seq(2))
    assertFn("(SELECT bitwise_and_agg(v) FROM VALUES (7), (3), (11) AS t(v))", 3L)
    assertFn("(SELECT bitwise_or_agg(v) FROM VALUES (1), (2), (4) AS t(v))", 7L)
  }

  test("numeric_histogram buckets weights onto centroids") {
    val rows = engine.sql(
      """SELECT numeric_histogram(4, v) AS h FROM
        |(SELECT CAST(x AS DOUBLE) AS v FROM
        |  (SELECT explode(sequence(1, 100)) AS x))""".stripMargin)
      .head.getMap[Double, Double](0)
    assert(rows.size == 4)
    assert(math.abs(rows.values.sum - 100.0) < 1e-9) // total weight preserved
    val centroids = rows.keys.toSeq.sorted
    assert(centroids.head >= 1.0 && centroids.last <= 100.0)
  }

  test("random(n) returns an integer in [0, n) of n's type") {
    val e = engine
    (1 to 20).foreach { _ =>
      val v = one("random(10)")
      assert(v.isInstanceOf[Int] && v.asInstanceOf[Int] >= 0 &&
        v.asInstanceOf[Int] < 10, s"got $v")
    }
    val vl = one("random(CAST(5 AS BIGINT))")
    assert(vl.isInstanceOf[Long] && vl.asInstanceOf[Long] < 5L)
    assert(one("random()").isInstanceOf[Double])
  }

  test("mysql pattern translation") {
    import functions.PrestoFunctions.mysqlToJavaPattern
    assert(mysqlToJavaPattern("%Y-%m-%d") == "yyyy-MM-dd")
    assert(mysqlToJavaPattern("%H:%i:%s") == "HH:mm:ss")
    assert(mysqlToJavaPattern("%Y year") == "yyyy' year'")
    assert(mysqlToJavaPattern("100%%") == "100%")
  }

  test("json_size counts arrays, object keys, and scalars as 0") {
    assertFn("""json_size('[1,2,3]', '$')""", 3)
    assertFn("""json_size('{"x": {"a":1,"b":2}}', '$.x')""", 2)
    assertFn("""json_size('{"a":1}', '$.a')""", 0)
    assertFn("""json_size('{"a":1}', '$.missing')""", null)
  }

  test("presto json functions") {
    assertFn("json_extract_scalar('{\"a\": {\"b\": 5}}', '$.a.b')", "5")
    assertFn("json_array_get('[10, 20, 30]', 1)", "20")
    assertFn("json_size('[1,2,3]', '$')", 3)
    assertFn("is_json_scalar('5')", true)
    assertFn("is_json_scalar('[1,2]')", false)
  }

  test("presto array/lambda functions") {
    assertFn("cardinality(ARRAY(1, 2, 3))", 3)
    assertFn("contains(ARRAY(1, 2), 2)", true)
    assertFn("reduce(ARRAY(1, 2, 3), 0, (a, x) -> a + x, a -> a * 10)", 60)
    assertFn("any_match(ARRAY(1, 2), x -> x > 1)", true)
    assertFn("all_match(ARRAY(1, 2), x -> x > 1)", false)
    assertFn("none_match(ARRAY(1, 2), x -> x > 5)", true)
  }

  test("bit_count with explicit bit width") {
    assertFn("bit_count(9, 64)", 2L)
    assertFn("bit_count(-7, 64)", 62L)
    assertFn("bit_count(9, 8)", 2L)
    assertFn("bit_count(0, 32)", 0L)
  }

  test("registry long-tail: every remaining registered name evaluates") {
    assertFn("chr(65)", "A")
    assertFn("bitwise_not(0)", -1L)
    assertFn("day_of_month(DATE '2024-02-29')", 29)
    assertFn("week_of_year(DATE '2024-01-04')", 1)
    assertFn("CAST(from_iso8601_date('2024-03-05') AS STRING)", "2024-03-05")
    assertFn("CAST(from_iso8601_timestamp('2024-03-05T06:07:08') AS STRING)",
      "2024-03-05 06:07:08")
    assertFn("CAST(date_add_unit('day', 3, DATE '2024-01-01') AS STRING)",
      "2024-01-04 00:00:00")
    assertFn("date_diff_unit('hour', TIMESTAMP '2024-01-01 00:00:00', " +
      "TIMESTAMP '2024-01-01 07:30:00')", 7L)
    // the parser-native spelling: same arg order as Presto, unquoted unit
    assertFn("CAST(date_add(MONTH, 2, DATE '2024-01-31') AS STRING)",
      "2024-03-31 00:00:00")
    assertFn("date_diff(DAY, DATE '2024-01-01', DATE '2024-02-01')", 31L)
    assertFn("date_diff_unit('millisecond', TIMESTAMP '2024-01-01 00:00:00', " +
      "TIMESTAMP '2024-01-01 00:00:01.5')", 1500L)
    assertFn("format_datetime(TIMESTAMP '2024-03-05 06:07:08', 'yyyy/MM/dd')",
      "2024/03/05")
    assertFn("CAST(parse_datetime('2024/03/05', 'yyyy/MM/dd') AS STRING)",
      "2024-03-05 00:00:00")
    assertFn("json_array_contains('[1,2,3]', 2)", true)
    assertFn("json_format(json_parse('{\"a\":1}'))", "{\"a\":1}")
    assertFn("regexp_like('abc123', '[0-9]+')", true)
    assert(one("regexp_split('a1b2c', '[0-9]')") == Seq("a", "b", "c"))
    assert(one("repeat_value('z', 2)") == Seq("z", "z"))
    assertFn("typeof(1)", "integer")
    assertFn("to_hex(sha1(to_utf8('abc')))",
      "A9993E364706816ABA3E25717850C26C9CD0D89D")
    assert(one("length(sha512(to_utf8('abc')))") == 64)
    assert(one("length(hmac_md5(to_utf8('abc'), 'key'))") == 16)
    assert(one("length(hmac_sha1(to_utf8('abc'), 'key'))") == 20)
    assert(one("length(hmac_sha512(to_utf8('abc'), 'key'))") == 64)
    val ad = one("(SELECT approx_distinct(v) FROM (SELECT explode(sequence(1, 1000)) AS v))")
      .asInstanceOf[Long]
    assert(math.abs(ad - 1000) < 100)
    assertFn("to_hex(to_ieee754_32(from_ieee754_32(to_ieee754_32(2.0))))",
      "40000000")
    assertFn("st_as_text(st_point(1.0, 2.0))", "POINT (1 2)")
    assertFn("st_xmax(st_geometry_from_text('LINESTRING (1 2, 5 7)'))", 5.0)
    assertFn("st_ymin(st_geometry_from_text('LINESTRING (1 2, 5 7)'))", 2.0)
  }

  test("presto binary functions") {
    assertFn("to_hex(from_hex('1a2b'))", "1A2B")
    assertFn("hex(hmac_sha256(CAST('x' AS BINARY), CAST('k' AS BINARY))) != ''", true)
  }

  test("cosine_similarity native expression") {
    assertFn("round(cosine_similarity(ARRAY(1.0D, 0.0D), ARRAY(1.0D, 0.0D)), 9)", 1.0)
    assertFn("round(cosine_similarity(ARRAY(1.0D, 0.0D), ARRAY(0.0D, 1.0D)), 9)", 0.0)
    assertFn("cosine_similarity(ARRAY(0.0D, 0.0D), ARRAY(1.0D, 0.0D))", null)
  }

  test("checksum is order-independent") {
    // checksum is VARBINARY (8 Presto-exact state bytes) — compare contents
    val a = engine.sql(
      "SELECT checksum(l_orderkey) FROM (SELECT * FROM lineitem ORDER BY l_orderkey)")
      .head.getAs[Array[Byte]](0)
    val b = engine.sql(
      "SELECT checksum(l_orderkey) FROM (SELECT * FROM lineitem ORDER BY l_extendedprice)")
      .head.getAs[Array[Byte]](0)
    assert(a != null && a.toSeq == b.toSeq)
  }

  test("checksum matches the reference's bytes (testChecksum)") {
    // AbstractTestQueries.java:3028 — AbstractLongType.hash(0) is 0, so
    // the single-row checksum of the constant 0 is all zero bytes.
    assert(engine.sql("SELECT to_hex(checksum(0))").head.getString(0)
      == "0000000000000000")
    // NULL rows contribute PRIME64 alone; empty input is NULL
    assert(engine.sql("SELECT checksum(x) FROM (VALUES 1) t(x) WHERE false")
      .head.isNullAt(0))
  }

  test("hll approx_set/merge/cardinality within error bounds") {
    val Row(approx: Long, exact: Long) = engine.sql("""
      WITH per AS (SELECT l_returnflag, approx_set(l_orderkey) s,
                   count(DISTINCT l_orderkey) n FROM lineitem GROUP BY 1)
      SELECT CAST(cardinality(merge(s)) AS BIGINT), CAST(sum(n) AS BIGINT) FROM per
    """).head
    // merged sketch counts distinct orderkeys overall (same keys shared
    // across groups, so merged estimate ≈ global distinct)
    val globalExact = engine.sql(
      "SELECT count(DISTINCT l_orderkey) FROM lineitem").head.getLong(0)
    assert(math.abs(approx - globalExact).toDouble / globalExact < 0.05,
      s"approx=$approx exact=$globalExact")
  }

  test("hll sketch algebra: merge of disjoint sets adds") {
    val Row(card: Long) = engine.sql("""
      WITH a AS (SELECT approx_set(id) s FROM range(0, 1000) t(id)),
           b AS (SELECT approx_set(id + 1000) s FROM range(0, 1000) t(id))
      SELECT CAST(cardinality(merge(s)) AS BIGINT)
      FROM (SELECT s FROM a UNION ALL SELECT s FROM b)
    """).head
    assert(math.abs(card - 2000) < 100, s"card=$card")
  }

  test("empty_approx_set cardinality is 0") {
    assertFn("cardinality(empty_approx_set())", 0L)
  }

  test("max_by/min_by N-variants return top-n in rank order") {
    val got = engine.sql("""
      SELECT max_by(x, y, 3) AS top3, min_by(x, y, 2) AS bot2
      FROM (VALUES ('a', 1), ('b', 5), ('c', 3), ('d', 4), ('e', 2)) t(x, y)
    """).head
    assert(got.getSeq[String](0) == Seq("b", "d", "c"))
    assert(got.getSeq[String](1) == Seq("a", "e"))
  }

  test("max(x, n) / min(x, n) return the n extreme values") {
    assert(one("(SELECT max(v, 2) FROM VALUES (3), (1), (4), (1), (5) AS t(v))")
      == Seq(5, 4))
    assert(one("(SELECT min(v, 3) FROM VALUES (3), (1), (4), (1), (5) AS t(v))")
      == Seq(1, 1, 3))
    assertFn("(SELECT max(v) FROM VALUES (3), (9), (4) AS t(v))", 9)
  }

  test("max_by 2-arg still works under the shadowing registration") {
    val r = engine.sql(
      "SELECT max_by(x, y), min_by(x, y) FROM (VALUES ('a', 1), ('b', 9)) t(x, y)").head
    assert(r.getString(0) == "b" && r.getString(1) == "a")
  }

  test("histogram returns exact value counts") {
    val m = engine.sql("""
      SELECT histogram(x) AS h
      FROM (VALUES ('a'), ('b'), ('a'), ('a')) t(x)
    """).head.getMap[String, Long](0)
    assert(m == Map("a" -> 3L, "b" -> 1L))
  }

  test("ngrams returns sliding n-element sub-arrays") {
    assert(one("ngrams(ARRAY(1, 2, 3, 4), 2)") ==
      Seq(Seq(1, 2), Seq(2, 3), Seq(3, 4)))
    assert(one("ngrams(ARRAY('a', 'b'), 3)") == Seq(Seq("a", "b")))
  }

  test("map_union merges maps, first value wins") {
    val m = engine.sql("""
      SELECT map_union(m) FROM (
        SELECT map('a', 1, 'b', 2) AS m
        UNION ALL SELECT map('b', 99, 'c', 3))
    """).head.getMap[String, Int](0)
    assert(m("a") == 1 && m("c") == 3 && Set(2, 99).contains(m("b")))
  }

  test("max_by_n survives partial aggregation across groups") {
    val rows = engine.sql("""
      SELECT l_returnflag, max_by(l_orderkey, l_extendedprice, 5) AS top5
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val flag = r.getString(0)
      val top5 = r.getSeq[Long](1)
      assert(top5.length == 5)
      // cross-check against a window-function top-5
      val expect = engine.sql(s"""
        SELECT l_orderkey FROM (
          SELECT l_orderkey, row_number() OVER (ORDER BY l_extendedprice DESC) rn
          FROM lineitem WHERE l_returnflag = '$flag')
        WHERE rn <= 5""").collect().map(_.getLong(0)).toSet
      assert(top5.toSet == expect, s"flag=$flag")
    }
  }

  test("teradata functions: to_char/to_date/to_timestamp, index, char2hexint") {
    assertFn("to_char(TIMESTAMP '2001-08-22 03:04:05', 'YYYY/MM/DD HH24:MI:SS')",
      "2001/08/22 03:04:05")
    assertFn("to_char(TIMESTAMP '2001-08-22 15:04:05', 'HH')", "03") // half-day
    assertFn("CAST(to_date('1988/04/08', 'YYYY/MM/DD') AS STRING)", "1988-04-08")
    assertFn("CAST(to_timestamp('1988/04/08 14:03:02', 'YYYY/MM/DD HH24:MI:SS') AS STRING)",
      "1988-04-08 14:03:02")
    // unrecognized letters throw, like the reference's lexer
    intercept[Exception](one("to_char(TIMESTAMP '2001-08-22 03:04:05', 'QQ')"))
    assertFn("index('high', 'ig')", 2)
    assertFn("index('high', 'zz')", 0)
    // hex of the UTF-16BE encoding, uppercase
    assertFn("char2hexint('abc')", "006100620063")
    assertFn("char2hexint('z')", "007A")
  }

  test("teradata pattern round trip: to_char(to_timestamp(s)) == s") {
    // any timestamp rendered with a token pattern must re-parse to itself
    for (fmt <- Seq("YYYY-MM-DD HH24:MI:SS", "DD/MM/YYYY HH24:MI",
      "YYYYMMDD", "SS.MI.HH24 DD?MM?YYYY")) {
      val s = one(s"to_char(TIMESTAMP '1997-06-08 21:38:52', '$fmt')")
      val back = one(
        s"to_char(to_timestamp('$s', '$fmt'), 'YYYY-MM-DD HH24:MI:SS')")
      val expect = fmt match {
        case "YYYYMMDD" => "1997-06-08 00:00:00" // date-only pattern
        case "DD/MM/YYYY HH24:MI" => "1997-06-08 21:38:00"
        case _ => "1997-06-08 21:38:52"
      }
      assert(back == expect, s"fmt=$fmt rendered=$s back=$back")
    }
  }

  test("set digest: exact mode, jaccard, intersection, hash_counts") {
    // exact mode (< 8192 distinct): cardinality and intersection are exact
    assertFn("(SELECT cardinality(make_set_digest(c_custkey)) FROM customer)",
      one("(SELECT count(DISTINCT c_custkey) FROM customer)"))
    assertFn("""(WITH a AS (SELECT make_set_digest(c_custkey) d FROM customer WHERE c_custkey < 100),
             b AS (SELECT make_set_digest(c_custkey) d FROM customer WHERE c_custkey BETWEEN 50 AND 149)
        SELECT intersection_cardinality(a.d, b.d) FROM a, b)""", 50L)
    // identical sets → jaccard 1.0; disjoint → 0.0
    assertFn("""(WITH a AS (SELECT make_set_digest(c_custkey) d FROM customer)
        SELECT jaccard_index(a.d, a.d) FROM a)""", 1.0)
    assertFn("""(WITH a AS (SELECT make_set_digest(c_custkey) d FROM customer WHERE c_custkey < 75),
             b AS (SELECT make_set_digest(c_custkey) d FROM customer WHERE c_custkey >= 75)
        SELECT jaccard_index(a.d, b.d) FROM a, b)""", 0.0)
    // partial overlap lands strictly between
    val j = one("""(WITH a AS (SELECT make_set_digest(c_custkey) d FROM customer WHERE c_custkey < 100),
             b AS (SELECT make_set_digest(c_custkey) d FROM customer WHERE c_custkey BETWEEN 50 AND 149)
        SELECT jaccard_index(a.d, b.d) FROM a, b)""").asInstanceOf[Double]
    assert(j > 0.15 && j < 0.55, s"jaccard=$j")
    // hash_counts carries multiplicities (each key added twice → count 2)
    val hc = one("""(SELECT hash_counts(make_set_digest(v)) FROM
        (SELECT explode(array(1, 2, 3, 1, 2, 3)) AS v))""")
      .asInstanceOf[scala.collection.Map[Long, Short]]
    assert(hc.size == 3 && hc.values.forall(_ == 2), hc)
    // merge_set_digest unions partial digests
    assertFn("""(WITH parts AS (
          SELECT c_nationkey, make_set_digest(c_custkey) d FROM customer GROUP BY c_nationkey)
        SELECT cardinality(merge_set_digest(d)) FROM parts)""",
      one("(SELECT count(DISTINCT c_custkey) FROM customer)"))
  }

  test("set digest: approximate mode stays within sketch error") {
    // 40k distinct values exceeds maxHashes → HLL estimate path
    // (view must live in the ENGINE's isolated session)
    engine.spark.range(0, 40000).toDF("v").createOrReplaceTempView("sd_big")
    val est = one("(SELECT cardinality(make_set_digest(v)) FROM sd_big)")
      .asInstanceOf[Long]
    assert(math.abs(est - 40000L).toDouble / 40000 < 0.05, s"est=$est")
    // identical large sets still give jaccard 1.0 (bottom-k sets equal)
    assertFn("""(WITH a AS (SELECT make_set_digest(v) d FROM sd_big)
        SELECT jaccard_index(a.d, a.d) FROM a)""", 1.0)
  }

  test("color functions: encoding (ColorFunctions.java:88-116)") {
    assertFn("color('red')", -2L) // system color index 1 → -(1+1)
    assertFn("color('GREEN')", -3L) // case-insensitive
    assertFn("color('#f00')", 0xFF0000L) // css nibble replication
    assertFn("color('#0f0')", 0x00FF00L)
    assertFn("color('#123')", 0x112233L)
    assertFn("rgb(255, 0, 0)", 0xFF0000L)
    assertFn("rgb(1, 2, 3)", 0x010203L)
    intercept[Exception](one("color('no_such_color')"))
    intercept[Exception](one("rgb(256, 0, 0)"))
  }

  test("color interpolation clamps and lerps in HSB space") {
    // endpoints are exact
    assertFn("color(0.0, color('#f00'), color('#0f0'))", 0xFF0000L)
    assertFn("color(1.0, color('#f00'), color('#0f0'))", 0x00FF00L)
    assertFn("color(-5.0, color('#f00'), color('#0f0'))", 0xFF0000L) // clamp
    assertFn("color(9.0, color('#f00'), color('#0f0'))", 0x00FF00L) // clamp
    // 5-arg form rescales value into [low, high]
    assertFn("color(50.0, 0.0, 100.0, color('#f00'), color('#0f0'))",
      graft.functions.ColorFns.interpolate(0.5, 0xFF0000L, 0x00FF00L))
    // grayscale midpoint: hue/sat 0, value lerps 0→1 (HSB, not RGB, space)
    assertFn("color(0.5, color('#000'), color('#fff'))",
      graft.functions.ColorFns.interpolate(0.5, 0L, 0xFFFFFFL))
  }

  test("render emits ANSI 256-color escapes (ColorFunctions.java:161-192)") {
    assertFn("render('x', color('red'))", "\u001b[38;5;1mx\u001b[0m")
    // rgb(255,0,0) → cube index 16 + 5*36 = 196
    assertFn("render('hi', rgb(255, 0, 0))", "\u001b[38;5;196mhi\u001b[0m")
    assertFn("render(42, color('blue'))", "\u001b[38;5;4m42\u001b[0m")
    assertFn("render(true)", "\u001b[38;5;2m✓\u001b[0m")
    assertFn("render(false)", "\u001b[38;5;1m✗\u001b[0m")
  }

  test("bar renders a fixed-width gradient bar (ColorFunctions.java:196-232)") {
    // single-color gradient: every block gets the same escape
    assertFn("bar(0.5, 4, rgb(0,255,0), rgb(0,255,0))",
      "\u001b[38;5;46m█\u001b[38;5;46m█\u001b[0m  ")
    assertFn("bar(0.0, 3, rgb(0,255,0), rgb(0,255,0))", "\u001b[0m   ")
    assertFn("bar(2.0, 2, rgb(0,255,0), rgb(0,255,0))", // clamped to width
      "\u001b[38;5;46m█\u001b[38;5;46m█\u001b[0m")
    // default red→green: first block is pure red (fraction 0)
    val s = one("bar(1.0, 10)").asInstanceOf[String]
    assert(s.startsWith("\u001b[38;5;196m█"))
    assert(s.endsWith("\u001b[0m"))
    assert(s.count(_ == '█') == 10)
  }
}
