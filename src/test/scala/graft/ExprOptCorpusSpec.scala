package graft

/** Verbatim optimizer-equivalence corpus auto-harvested from the
  * reference's presto-main sql/TestExpressionInterpreter.java
  * assertOptimizedEquals(a, b) calls: optimizer equivalence is value
  * equivalence under EVERY total symbol binding, so each pair is checked
  * by evaluating both sides under the reference's own bound_* values
  * (TestExpressionInterpreter.java:1384-1407) plus a fixed arbitrary
  * binding for the unbound_* symbols (NULL for *_null_string keeps the
  * three-valued-logic pairs honest). Chunks group pairs sharing a
  * binding clause. Regenerate with the harvest pipeline (PLANS.md).
  */
class ExprOptCorpusSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSession._

  private lazy val engine = graft.queries.RefCorpus.engine(spark, sf)

  private def rows(sql: String): Seq[String] =
    engine.sql(sql).collect().toSeq
      .map(r => r.toSeq.map(graft.tools.RefPairs.canon).mkString("(", ", ", ")"))

  private def chunk(name: String, actual: String, expected: String): Unit =
    test(name) {
      assert(rows(actual) == rows(expected), s"\nactual:   $actual")
    }

  private def bothThrow(name: String, actual: String, expected: String): Unit =
    test(name) {
      intercept[Exception](rows(actual))
      intercept[Exception](rows(expected))
    }

  chunk("ExpressionInterpreter L120-L144",
    "SELECT true and false, false and true, false and false, true and null, false and null, null and true, null and false, null and null, true or true, true or false, false or true, false or false",
    "SELECT false, false, false, null, false, null, false, null, true, true, true, false")
  chunk("ExpressionInterpreter L146-L183",
    "SELECT true or null, null or true, null or null, false or null, null or false, null = null, 'a' = 'b', 'a' = 'a', 'a' = null, null = 'a', 10151082135029368 = 10151082135029369, 1.1 = 1.1",
    "SELECT true, true, null, null, null, null, false, true, null, null, false, true")
  chunk("ExpressionInterpreter L184-L212",
    "SELECT 9876543210.9874561203 = 9876543210.9874561203, null is distinct from null, 3 is distinct from 4, 3 is distinct from BIGINT '4', 3 is distinct from 4000000000, 3 is distinct from 3, 3 is distinct from null, null is distinct from 3, 10151082135029368 is distinct from 10151082135029369, 1.1 is distinct from 1.1, 9876543210.9874561203 is distinct from NULL, null is null",
    "SELECT true, false, true, true, true, false, true, true, true, false, true, true")
  chunk("ExpressionInterpreter L213-L233",
    "SELECT 1 is null, 10000000000 is null, BIGINT '1' is null, 1.0 is null, 'a' is null, true is null, null+1 is null, 1.1 is null, 9876543210.9874561203 is null, null is not null, 1 is not null, 10000000000 is not null",
    "SELECT false, false, false, false, false, false, true, false, false, false, true, true")
  chunk("ExpressionInterpreter L234-L255",
    "SELECT BIGINT '1' is not null, 1.0 is not null, 'a' is not null, true is not null, null+1 is not null, 1.1 is not null, 9876543210.9874561203 is not null, nullif(true, true), nullif(true, false), nullif(null, false), nullif(true, null), nullif('a', 'a')",
    "SELECT true, true, true, true, false, true, true, null, true, null, true, null")
  chunk("ExpressionInterpreter L256-L268",
    "SELECT nullif('a', 'b'), nullif(null, 'b'), nullif('a', null), nullif(1, 1), nullif(1, 2), nullif(1, BIGINT '2'), nullif(1, 20000000000), nullif(1.0E0, 1), nullif(10000000000.0E0, 10000000000), nullif(1.1E0, 1), nullif(1.1E0, 1.1E0), nullif(1, 2-1)",
    "SELECT 'a', null, 'a', null, 1, 1, 1, null, null, 1.1E0, null, null")
  chunk("ExpressionInterpreter L269-L300",
    "SELECT nullif(null, null), nullif(1, null), nullif(1.1, 1.2), nullif(9876543210.9874561203, 9876543210.9874561203), -(1), -(BIGINT '1'), -(1+1), -(1+ BIGINT '1'), -(CAST(NULL AS BIGINT)), -(1.1+1.2), -(9876543210.9874561203-9876543210.9874561203), not true",
    "SELECT null, 1, 1.1, null, -1, BIGINT '-1', -2, BIGINT '-2', null, -2.3, CAST(0 AS DECIMAL(20,10)), false")
  chunk("ExpressionInterpreter L301-L343",
    "SELECT not false, not null, not 1=1, not 1=BIGINT '1', not 1!=1, abs(-5), abs(-10-5), 3 between 2 and 4, 2 between 3 and 4, null between 2 and 4, 3 between null and 4, 3 between 2 and null",
    "SELECT true, null, false, false, true, 5, 15, true, false, null, null, null")
  chunk("ExpressionInterpreter L345-L416",
    "SELECT 'cc' between 'b' and 'd', 'b' between 'cc' and 'd', null between 'b' and 'd', 'cc' between null and 'd', 'cc' between 'b' and null, 1.15 between 1.1 and 1.2, 9876543210.98745612035 between 9876543210.9874561203 and 9876543210.9874561204, 3 in (2, 4, 3, 5), 3 in (2, 4, 9, 5), 3 in (2, null, 3, 5), 'foo' in ('bar', 'baz', 'foo', 'blah'), 'foo' in ('bar', 'baz', 'buz', 'blah')",
    "SELECT true, false, null, null, null, true, true, true, false, true, true, false")
  chunk("ExpressionInterpreter L417-L482",
    "SELECT 'foo' in ('bar', null, 'foo', 'blah'), null in (2, null, 3, 5), 3 in (2, null), 1.15 in (1.1, 1.2, 1.3, 1.15), 9876543210.98745612035 in (9876543210.9874561203, 9876543210.9874561204, 9876543210.98745612035), cast(123 as VARCHAR(20)), cast(-123 as VARCHAR(20)), cast(BIGINT '123' as VARCHAR), cast(12300000000 as VARCHAR), cast(-12300000000 as VARCHAR), cast(123.0E0 as VARCHAR), cast(-123.0E0 as VARCHAR)",
    "SELECT true, null, null, true, true, '123', '-123', '123', '12300000000', '-12300000000', '123.0', '-123.0'")
  chunk("ExpressionInterpreter L483-L510",
    "SELECT cast(123.456E0 as VARCHAR), cast(-123.456E0 as VARCHAR), cast(true as VARCHAR), cast(false as VARCHAR), cast('xyz' as VARCHAR), cast(null as VARCHAR), cast(1.1 as VARCHAR), cast(12345678901234567890.123 as VARCHAR), cast(123 as BOOLEAN), cast(-123 as BOOLEAN), cast(0 as BOOLEAN), cast(12300000000 as BOOLEAN)",
    "SELECT '123.456', '-123.456', 'true', 'false', 'xyz', null, '1.1', '12345678901234567890.123', true, true, false, true")
  chunk("ExpressionInterpreter L511-L530",
    "SELECT cast(-12300000000 as BOOLEAN), cast(BIGINT '0' as BOOLEAN), cast(true as BOOLEAN), cast(false as BOOLEAN), cast('true' as BOOLEAN), cast('false' as BOOLEAN), cast('t' as BOOLEAN), cast('f' as BOOLEAN), cast('1' as BOOLEAN), cast('0' as BOOLEAN), cast(null as BOOLEAN), cast(123.45E0 as BOOLEAN)",
    "SELECT true, false, true, false, true, false, true, false, true, false, null, true")
  chunk("ExpressionInterpreter L531-L552",
    "SELECT cast(-123.45E0 as BOOLEAN), cast(0.0E0 as BOOLEAN), cast(0.00 as BOOLEAN), cast(7.8 as BOOLEAN), cast(12345678901234567890.123 as BOOLEAN), cast(00000000000000000000.000 as BOOLEAN), cast(0 as BIGINT), cast(123 as BIGINT), cast(-123 as BIGINT), cast(BIGINT '0' as BIGINT), cast(BIGINT '123' as BIGINT), cast(BIGINT '-123' as BIGINT)",
    "SELECT true, false, false, true, true, false, 0, 123, -123, 0, 123, -123")
  chunk("ExpressionInterpreter L555-L574",
    "SELECT cast(123.0E0 as BIGINT), cast(-123.0E0 as BIGINT), cast(123.456E0 as BIGINT), cast(-123.456E0 as BIGINT), cast(true as BIGINT), cast(false as BIGINT), cast('123' as BIGINT), cast('-123' as BIGINT), cast(null as BIGINT), cast(DECIMAL '1.01' as BIGINT), cast(DECIMAL '7.8' as BIGINT), cast(DECIMAL '1234567890.123' as BIGINT)",
    "SELECT 123, -123, 123, -123, 1, 0, 123, -123, null, 1, 8, 1234567890")
  chunk("ExpressionInterpreter L575-L598",
    "SELECT cast(DECIMAL '00000000000000000000.000' as BIGINT), cast(0 as INTEGER), cast(123 as INTEGER), cast(-123 as INTEGER), cast(BIGINT '0' as INTEGER), cast(BIGINT '123' as INTEGER), cast(BIGINT '-123' as INTEGER), cast(123.0E0 as INTEGER), cast(-123.0E0 as INTEGER), cast(123.456E0 as INTEGER), cast(-123.456E0 as INTEGER), cast(true as INTEGER)",
    "SELECT 0, 0, 123, -123, 0, 123, -123, 123, -123, 123, -123, 1")
  chunk("ExpressionInterpreter L599-L624",
    "SELECT cast(false as INTEGER), cast('123' as INTEGER), cast('-123' as INTEGER), cast(null as INTEGER), cast(0 as DOUBLE), cast(123 as DOUBLE), cast(-123 as DOUBLE), cast(BIGINT '0' as DOUBLE), cast(12300000000 as DOUBLE), cast(-12300000000 as DOUBLE), cast(123.0E0 as DOUBLE), cast(-123.0E0 as DOUBLE)",
    "SELECT 0, 123, -123, null, 0.0E0, 123.0E0, -123.0E0, 0.0E0, 12300000000.0E0, -12300000000.0E0, 123.0E0, -123.0E0")
  chunk("ExpressionInterpreter L625-L642",
    "SELECT cast(123.456E0 as DOUBLE), cast(-123.456E0 as DOUBLE), cast('0' as DOUBLE), cast('123' as DOUBLE), cast('-123' as DOUBLE), cast('123.0E0' as DOUBLE), cast('-123.0E0' as DOUBLE), cast('123.456E0' as DOUBLE), cast('-123.456E0' as DOUBLE), cast(null as DOUBLE), cast(true as DOUBLE), cast(false as DOUBLE)",
    "SELECT 123.456E0, -123.456E0, 0.0E0, 123.0E0, -123.0E0, 123.0E0, -123.0E0, 123.456E0, -123.456E0, null, 1.0E0, 0.0E0")
  chunk("ExpressionInterpreter L645-L664",
    "SELECT cast(1.01 as DOUBLE), cast(7.8 as DOUBLE), cast(1234567890.123 as DOUBLE), cast(00000000000000000000.000 as DOUBLE), cast(0 as DECIMAL(1,0)), cast(123 as DECIMAL(3,0)), cast(-123 as DECIMAL(3,0)), cast(-123 as DECIMAL(20,10)), cast(0E0 as DECIMAL(1,0)), cast(123.2E0 as DECIMAL(4,1)), cast(-123.0E0 as DECIMAL(3,0)), cast(-123.55E0 as DECIMAL(20,10))",
    "SELECT DOUBLE '1.01', DOUBLE '7.8', DOUBLE '1234567890.123', DOUBLE '0.0', DECIMAL '0', DECIMAL '123', DECIMAL '-123', cast(-123 as DECIMAL(20,10)), DECIMAL '0', DECIMAL '123.2', DECIMAL '-123', cast(-123.55 as DECIMAL(20,10))")
  chunk("ExpressionInterpreter L667-L684",
    "SELECT cast('0' as DECIMAL(1,0)), cast('123.2' as DECIMAL(4,1)), cast('-123.0' as DECIMAL(3,0)), cast('-123.55' as DECIMAL(20,10)), cast(null as DECIMAL(1,0)), cast(null as DECIMAL(20,10)), cast(true as DECIMAL(1,0)), cast(false as DECIMAL(4,1)), cast(true as DECIMAL(3,0)), cast(false as DECIMAL(20,10)), cast(0.0 as DECIMAL(1,0)), cast(123.2 as DECIMAL(4,1))",
    "SELECT DECIMAL '0', DECIMAL '123.2', DECIMAL '-123', cast(-123.55 as DECIMAL(20,10)), null, null, DECIMAL '1', DECIMAL '000.0', DECIMAL '001', cast(0 as DECIMAL(20,10)), DECIMAL '0', DECIMAL '123.2'")
  // L710 pairs the bare symbol "time" with itself; Presto double quotes are
  // IDENTIFIERS (now lowered to backticks, round 6), so the unbound symbol
  // cannot appear in a standalone SELECT — the slot holds a literal instead.
  chunk("ExpressionInterpreter L685-L728",
    "SELECT cast(-123.0 as DECIMAL(3,0)), cast(-123.55 as DECIMAL(20,10)), try_cast(null as BIGINT), try_cast(123 as BIGINT), try_cast(null as INTEGER), try_cast(123 as INTEGER), try_cast('foo' as VARCHAR), try_cast('foo' as BIGINT), try_cast('foo' as DECIMAL(2,1)), 'time', case when true then 33 end, case when false then 1 else 33 end",
    "SELECT DECIMAL '-123', cast(-123.55 as DECIMAL(20,10)), null, 123, null, 123, 'foo', null, null, 'time', 33, 33")
  chunk("ExpressionInterpreter L734-L873",
    "SELECT case when false then 10000000000 else 33 end, case when false then 2.2 when true then 2.2 end, case when false then 1234567890.0987654321 when true then 3.3 end, case when false then 1 when true then 2.2 end, case 1 when 1 then 32 + 1 when 1 then 34 end, case null when true then 33 end, case null when true then 33 else 33 end, case 33 when null then 1 else 33 end, case null when true then 3300000000 end, case null when true then 3300000000 else 3300000000 end, case 33 when null then 3300000000 else 33 end, case true when true then 33 end",
    "SELECT 33, 2.2, CAST(3.3 AS DECIMAL(20,10)), 2.2, 33, null, 33, 33, null, 3300000000, 33, 33")
  chunk("ExpressionInterpreter L877-L1092",
    "SELECT case true when false then 1 else 33 end, case true when false then 2.2 when true then 2.2 end, case true when false then 1 when true then 2.2 end, IF(2 = 2, 3, 4), IF(1 = 2, 3, 4), IF(1 = 2, BIGINT '3', 4), IF(1 = 2, 3000000000, 4), IF(true, 3, 4), IF(false, 3, 4), IF(null, 3, 4), IF(true, 3, null), IF(false, 3, null)",
    "SELECT 33, 2.2, 2.2, 3, 4, 4, 4, 3, 4, 4, 3, null")
  chunk("ExpressionInterpreter L1093-L1107",
    "SELECT IF(true, null, 4), IF(false, null, 4), IF(true, null, null), IF(false, null, null), IF(true, 3.5E0, 4.2E0), IF(false, 3.5E0, 4.2E0), IF(true, 'foo', 'bar'), IF(false, 'foo', 'bar'), IF(true, 1.01, 1.02), IF(false, 1.01, 1.02), IF(true, 1234567890.123, 1.02), IF(false, 1.01, 1234567890.123)",
    "SELECT null, 4, null, null, 3.5E0, 4.2E0, 'foo', 'bar', 1.01, 1.02, 1234567890.123, 1234567890.123")
  chunk("ExpressionInterpreter L1117-L1131",
    "SELECT 'a' LIKE 'a', '' LIKE 'a', 'abc' LIKE 'a', 'a' LIKE '_', '' LIKE '_', 'abc' LIKE '_', 'a' LIKE '%', '' LIKE '%', 'abc' LIKE '%', 'abc' LIKE '___', 'ab' LIKE '___', 'abcd' LIKE '___'",
    "SELECT true, false, false, true, false, false, true, true, true, true, false, false")
  chunk("ExpressionInterpreter L1133-L1147",
    "SELECT 'abc' LIKE 'abc', 'xyz' LIKE 'abc', 'abc0' LIKE 'abc', '0abc' LIKE 'abc', 'abc' LIKE 'abc%', 'abc0' LIKE 'abc%', '0abc' LIKE 'abc%', 'abc' LIKE '%abc', '0abc' LIKE '%abc', 'abc0' LIKE '%abc', 'abc' LIKE '%abc%', '0abc' LIKE '%abc%'",
    "SELECT true, false, false, false, true, true, false, true, true, false, true, true")
  chunk("ExpressionInterpreter L1148-L1161",
    "SELECT 'abc0' LIKE '%abc%', '0abc0' LIKE '%abc%', 'xyzw' LIKE '%abc%', 'abc' LIKE '%ab%c%', '0abc' LIKE '%ab%c%', 'abc0' LIKE '%ab%c%', '0abc0' LIKE '%ab%c%', 'ab01c' LIKE '%ab%c%', '0ab01c' LIKE '%ab%c%', 'ab01c0' LIKE '%ab%c%', '0ab01c0' LIKE '%ab%c%', 'xyzw' LIKE '%ab%c%'",
    "SELECT true, true, false, true, true, true, true, true, true, true, true, false")
  chunk("ExpressionInterpreter L1164-L1175",
    "SELECT '' LIKE '', '.*' LIKE '.*', '[' LIKE '[', ']' LIKE ']', '{' LIKE '{', '}' LIKE '}', '?' LIKE '?', '+' LIKE '+', '(' LIKE '(', ')' LIKE ')', '|' LIKE '|', '^' LIKE '^'",
    "SELECT true, true, true, true, true, true, true, true, true, true, true, true")
  chunk("ExpressionInterpreter L1176-L1182",
    "SELECT '$' LIKE '$', null LIKE '%', 'a' LIKE null, 'a' LIKE '%' ESCAPE null, '%' LIKE 'z%' ESCAPE 'z'",
    "SELECT true, null, null, null, true")
  chunk("ExpressionInterpreter L130-L1192",
    "SELECT unbound_string='z' and true, unbound_string='z' and false, true and unbound_string='z', false and unbound_string='z', unbound_string is null, unbound_string is not null, cast(unbound_string as VARCHAR), try_cast(unbound_string as BIGINT), unbound_string LIKE 'abc', unbound_string LIKE '' ESCAPE '#', unbound_string LIKE 'abc' ESCAPE '#', unbound_string LIKE 'a#_b' ESCAPE '#' FROM (SELECT CAST('xyzzy' AS VARCHAR) AS unbound_string) t",
    "SELECT unbound_string='z', false, unbound_string='z', false, unbound_string is null, unbound_string is not null, cast(unbound_string as VARCHAR), try_cast(unbound_string as BIGINT), unbound_string = CAST('abc' AS VARCHAR), unbound_string LIKE '' ESCAPE '#', unbound_string = CAST('abc' AS VARCHAR), unbound_string = CAST('a_b' AS VARCHAR) FROM (SELECT CAST('xyzzy' AS VARCHAR) AS unbound_string) t")
  chunk("ExpressionInterpreter L1193-L1196",
    "SELECT unbound_string LIKE 'a#%b' ESCAPE '#', unbound_string LIKE 'a#_##b' ESCAPE '#', unbound_string LIKE 'a#__b' ESCAPE '#', unbound_string LIKE 'a##%b' ESCAPE '#' FROM (SELECT CAST('xyzzy' AS VARCHAR) AS unbound_string) t",
    "SELECT unbound_string = CAST('a%b' AS VARCHAR), unbound_string = CAST('a_#b' AS VARCHAR), unbound_string LIKE 'a#__b' ESCAPE '#', unbound_string LIKE 'a##%b' ESCAPE '#' FROM (SELECT CAST('xyzzy' AS VARCHAR) AS unbound_string) t")
  chunk("ExpressionInterpreter L135-L158",
    "SELECT bound_string='z' and bound_long=1+1, bound_string='z' or bound_long=1+1 FROM (SELECT CAST(1234 AS BIGINT) AS bound_long, CAST('hello' AS VARCHAR) AS bound_string) t",
    "SELECT bound_string='z' and bound_long=2, bound_string='z' or bound_long=2 FROM (SELECT CAST(1234 AS BIGINT) AS bound_long, CAST('hello' AS VARCHAR) AS bound_string) t")
  chunk("ExpressionInterpreter L153-L437",
    "SELECT bound_string='z' or true, bound_string='z' or false, true or bound_string='z', false or bound_string='z', bound_string = 'hello', bound_string between 'e' and 'i', bound_string between 'a' and 'b', bound_string in ('bar', 'hello', 'foo', 'blah'), bound_string in ('bar', 'baz', 'foo', 'blah'), 'hello' in ('bar', bound_string, 'foo', 'blah'), 'baz' in ('bar', bound_string, 'foo', 'blah') FROM (SELECT CAST('hello' AS VARCHAR) AS bound_string) t",
    "SELECT true, bound_string='z', true, bound_string='z', true, true, false, true, false, true, false FROM (SELECT CAST('hello' AS VARCHAR) AS bound_string) t")
  chunk("ExpressionInterpreter L170-L694",
    "SELECT bound_integer = 1234, bound_integer = 12340000000, abs(-bound_integer + 1), bound_integer between 1000 and 2000, bound_integer between 3 and 4, bound_integer in (2, 1234, 3, 5), bound_integer in (2, 4, 3, 5), 1234 in (2, bound_integer, 3, 5), 99 in (2, bound_integer, 3, 5), bound_integer in (2, bound_integer, 3, 5), cast(bound_integer as VARCHAR), cast(bound_integer + 1 as VARCHAR) FROM (SELECT CAST(1234 AS INTEGER) AS bound_integer) t",
    "SELECT true, false, 1233, true, false, true, false, true, false, true, '1234', '1235' FROM (SELECT CAST(1234 AS INTEGER) AS bound_integer) t")
  chunk("ExpressionInterpreter L754-L912",
    "SELECT case when bound_integer = 1234 then 33 end, case when true then bound_integer end, case when false then 1 else bound_integer end, case bound_integer when 1234 then 33 end, case 1234 when bound_integer then 33 end, case true when true then bound_integer end, case true when false then 1 else bound_integer end FROM (SELECT CAST(1234 AS INTEGER) AS bound_integer) t",
    "SELECT 33, 1234, 1234, 33, 33, 1234, 1234 FROM (SELECT CAST(1234 AS INTEGER) AS bound_integer) t")
  chunk("ExpressionInterpreter L172-L432",
    "SELECT bound_long = BIGINT '1234', bound_long = 1234, abs(-bound_long + 1), abs(-bound_long + BIGINT '1'), abs(-bound_long), bound_long between 1000 and 2000, bound_long between 3 and 4, bound_long in (2, 1234, 3, 5), bound_long in (2, 4, 3, 5), 1234 in (2, bound_long, 3, 5), 99 in (2, bound_long, 3, 5), bound_long in (2, bound_long, 3, 5) FROM (SELECT CAST(1234 AS BIGINT) AS bound_long) t",
    "SELECT true, true, 1233, 1233, 1234, true, false, true, false, true, false, true FROM (SELECT CAST(1234 AS BIGINT) AS bound_long) t")
  chunk("ExpressionInterpreter L693-L894",
    "SELECT cast(bound_long as VARCHAR), cast(bound_long + 1 as VARCHAR), case when bound_long = 1234 then 33 end, case when true then bound_long end, case when false then 1 else bound_long end, case bound_long when 1234 then 33 end, case 1234 when bound_long then 33 end, case true when true then bound_long end, case true when false then 1 else bound_long end FROM (SELECT CAST(1234 AS BIGINT) AS bound_long) t",
    "SELECT '1234', '1235', 33, 1234, 1234, 33, 33, 1234, 1234 FROM (SELECT CAST(1234 AS BIGINT) AS bound_long) t")
  chunk("ExpressionInterpreter L174-L174",
    "SELECT bound_double = 12.34 FROM (SELECT CAST(12.34 AS DOUBLE) AS bound_double) t",
    "SELECT true FROM (SELECT CAST(12.34 AS DOUBLE) AS bound_double) t")
  chunk("ExpressionInterpreter L176-L1012",
    "SELECT bound_long = unbound_long, bound_long between unbound_long and 2000 + 1, bound_long in (2, 1234, unbound_long, 5), case when bound_long = 1234 then 33 else unbound_long end, case when true then bound_long else unbound_long end, case when false then unbound_long else bound_long end, case bound_long when 1234 then 33 else unbound_long end, case true when true then bound_long else unbound_long end, case true when false then unbound_long else bound_long end, case bound_long when 123 * 10 + unbound_long then 1 = 1 else 1 = 2 end, case bound_long when unbound_long then 2 + 2 end, case bound_long when unbound_long then 2 + 2 when 1 then null when 2 then null end FROM (SELECT CAST(1234 AS BIGINT) AS bound_long, CAST(9876 AS BIGINT) AS unbound_long) t",
    "SELECT 1234 = unbound_long, 1234 between unbound_long and 2001, true, 33, 1234, 1234, 33, 1234, 1234, case bound_long when 1230 + unbound_long then true else false end, case bound_long when unbound_long then 4 end, case bound_long when unbound_long then 4 end FROM (SELECT CAST(1234 AS BIGINT) AS bound_long, CAST(9876 AS BIGINT) AS unbound_long) t")
  chunk("ExpressionInterpreter L1262-L1264",
    "SELECT ARRAY [(bound_long + 0), (unbound_long + 1), (bound_long + 2)], ARRAY [(bound_long + 0), (unbound_long + 1), NULL] FROM (SELECT CAST(1234 AS BIGINT) AS bound_long, CAST(9876 AS BIGINT) AS unbound_long) t",
    "SELECT array_constructor((bound_long + 0), (unbound_long + 1), (bound_long + 2)), array_constructor((bound_long + 0), (unbound_long + 1), NULL) FROM (SELECT CAST(1234 AS BIGINT) AS bound_long, CAST(9876 AS BIGINT) AS unbound_long) t")
  chunk("ExpressionInterpreter L185-L447",
    "SELECT bound_decimal_short = 123.45, bound_decimal_short is distinct from NULL, bound_decimal_short is null, bound_decimal_short is not null, nullif(bound_decimal_short, 123.45), -(bound_decimal_short+123.45), 123.455 between bound_decimal_short and 123.46, bound_decimal_short in (123.455, 123.46, 123.45) FROM (SELECT CAST(123.45 AS DECIMAL(5,2)) AS bound_decimal_short) t",
    "SELECT true, true, false, true, null, -246.90, true, true FROM (SELECT CAST(123.45 AS DECIMAL(5,2)) AS bound_decimal_short) t")
  chunk("ExpressionInterpreter L186-L449",
    "SELECT bound_decimal_long = 12345678901234567890.123, bound_decimal_long is distinct from 12345678901234567890.123, bound_decimal_long is null, bound_decimal_long is not null, nullif(bound_decimal_long, 12345678901234567890.123), -(bound_decimal_long-12345678901234567890.123), 12345678901234567890.1235 between bound_decimal_long and 12345678901234567890.123, bound_decimal_long in (12345678901234567890.123, 9876543210.9874561204, 9876543210.98745612035), bound_decimal_long in (9876543210.9874561204, null, 9876543210.98745612035) FROM (SELECT CAST(12345678901234567890.123 AS DECIMAL(23,3)) AS bound_decimal_long) t",
    "SELECT true, false, false, true, null, CAST(0 AS DECIMAL(20,10)), false, true, null FROM (SELECT CAST(12345678901234567890.123 AS DECIMAL(23,3)) AS bound_decimal_long) t")
  chunk("ExpressionInterpreter L221-L944",
    "SELECT unbound_long+(1+1) is null, unbound_long+(1+1) is not null, nullif(unbound_long, 1), -(unbound_long+1), -(unbound_long+(1+1)), not unbound_long=1, not unbound_long=(1+1), abs(unbound_long), abs(unbound_long + 1), case when unbound_long = 1234 then 33 else 1 end, case unbound_long when 1234 then 33 else 1 end, case 33 when 0 then 0 when 33 then unbound_long else 1 end FROM (SELECT CAST(9876 AS BIGINT) AS unbound_long) t",
    "SELECT unbound_long+2 is null, unbound_long+2 is not null, nullif(unbound_long, 1), -(unbound_long+1), -(unbound_long+2), not unbound_long=1, not unbound_long=2, abs(unbound_long), abs(unbound_long + 1), case when unbound_long = 1234 then 33 else 1 end, case unbound_long when 1234 then 33 else 1 end, unbound_long FROM (SELECT CAST(9876 AS BIGINT) AS unbound_long) t")
  chunk("ExpressionInterpreter L950-L1260",
    "SELECT case 33 when 0 then 0 when 33 then 1 when unbound_long then 2 else 1 end, case 33 when unbound_long then 0 when 1 then 1 when 33 then 2 else 0 end, case 33 when 0 then 0 when 1 then 1 else unbound_long end, coalesce(2 * 3 * unbound_long, 1 - 1, null), coalesce(2 * 3 * unbound_long, 1.0E0/2.0E0, null), coalesce(unbound_long, 2, 1.0E0/2.0E0, 12.34E0, null), ARRAY [(unbound_long + 0), (unbound_long + 1), (unbound_long + 2)] FROM (SELECT CAST(9876 AS BIGINT) AS unbound_long) t",
    "SELECT 1, case 33 when unbound_long then 0 else 2 end, unbound_long, coalesce(6 * unbound_long, 0), coalesce(6 * unbound_long, 0.5E0), coalesce(unbound_long, 2.0E0, 0.5E0, 12.34E0), array_constructor((unbound_long + 0), (unbound_long + 1), (unbound_long + 2)) FROM (SELECT CAST(9876 AS BIGINT) AS unbound_long) t")
  chunk("ExpressionInterpreter L272-L973",
    "SELECT nullif(unbound_long, unbound_long2), nullif(unbound_long, unbound_long2+(1+1)), case 33 when unbound_long then 0 when 1 then 1 when unbound_long2 then 2 else 3 end FROM (SELECT CAST(9876 AS BIGINT) AS unbound_long, CAST(5432 AS BIGINT) AS unbound_long2) t",
    "SELECT nullif(unbound_long, unbound_long2), nullif(unbound_long, unbound_long2+2), case 33 when unbound_long then 0 when unbound_long2 then 2 else 3 end FROM (SELECT CAST(9876 AS BIGINT) AS unbound_long, CAST(5432 AS BIGINT) AS unbound_long2) t")
  chunk("ExpressionInterpreter L355-L355",
    "SELECT bound_long between bound_integer and (bound_long + 1) FROM (SELECT CAST(1234 AS INTEGER) AS bound_integer, CAST(1234 AS BIGINT) AS bound_long) t",
    "SELECT true FROM (SELECT CAST(1234 AS INTEGER) AS bound_integer, CAST(1234 AS BIGINT) AS bound_long) t")
  chunk("ExpressionInterpreter L389-L402",
    "SELECT extract (YEAR from bound_timestamp), extract (QUARTER from bound_timestamp), extract (MONTH from bound_timestamp), extract (WEEK from bound_timestamp), extract (DOW from bound_timestamp), extract (DOY from bound_timestamp), extract (DAY from bound_timestamp), extract (HOUR from bound_timestamp), extract (MINUTE from bound_timestamp), extract (SECOND from bound_timestamp), extract (TIMEZONE_HOUR from bound_timestamp), extract (TIMEZONE_MINUTE from bound_timestamp) FROM (SELECT TIMESTAMP '2001-08-22 03:04:05.321' AS bound_timestamp) t",
    "SELECT 2001, 3, 8, 34, 3, 234, 22, 3, 4, 5, 0, 0 FROM (SELECT TIMESTAMP '2001-08-22 03:04:05.321' AS bound_timestamp) t")
  chunk("ExpressionInterpreter L405-L405",
    "SELECT extract (SECOND from bound_timestamp + INTERVAL '3' SECOND) FROM (SELECT TIMESTAMP '2001-08-22 03:04:05.321' AS bound_timestamp) t",
    "SELECT 8 FROM (SELECT TIMESTAMP '2001-08-22 03:04:05.321' AS bound_timestamp) t")
  chunk("ExpressionInterpreter L404-L404",
    "SELECT extract (YEAR from unbound_timestamp) FROM (SELECT TIMESTAMP '1999-01-05 06:07:08.123' AS unbound_timestamp) t",
    "SELECT extract (YEAR from unbound_timestamp) FROM (SELECT TIMESTAMP '1999-01-05 06:07:08.123' AS unbound_timestamp) t")
  chunk("ExpressionInterpreter L440-L440",
    "SELECT bound_string in ('bar', 'hello', unbound_string, 'blah') FROM (SELECT CAST('hello' AS VARCHAR) AS bound_string, CAST('xyzzy' AS VARCHAR) AS unbound_string) t",
    "SELECT true FROM (SELECT CAST('hello' AS VARCHAR) AS bound_string, CAST('xyzzy' AS VARCHAR) AS unbound_string) t")
  chunk("ExpressionInterpreter L442-L443",
    "SELECT bound_long in (2, 4, unbound_long, unbound_long2, 9), unbound_long in (2, 4, bound_long, unbound_long2, 5) FROM (SELECT CAST(1234 AS BIGINT) AS bound_long, CAST(9876 AS BIGINT) AS unbound_long, CAST(5432 AS BIGINT) AS unbound_long2) t",
    "SELECT 1234 in (unbound_long, unbound_long2), unbound_long in (2, 4, 1234, unbound_long2, 5) FROM (SELECT CAST(1234 AS BIGINT) AS bound_long, CAST(9876 AS BIGINT) AS unbound_long, CAST(5432 AS BIGINT) AS unbound_long2) t")
  chunk("ExpressionInterpreter L784-L794",
    "SELECT case when bound_integer = 1234 then 33 else unbound_integer end, case when true then bound_integer else unbound_integer end, case when false then unbound_integer else bound_integer end FROM (SELECT CAST(1234 AS INTEGER) AS bound_integer, CAST(987 AS INTEGER) AS unbound_integer) t",
    "SELECT 33, 1234, 1234 FROM (SELECT CAST(1234 AS INTEGER) AS bound_integer, CAST(987 AS INTEGER) AS unbound_integer) t")
  chunk("ExpressionInterpreter L1072-L1074",
    "SELECT coalesce(2 * 3 * unbound_integer, 1 - 1, null), coalesce(2 * 3 * unbound_integer, 1.0E0/2.0E0, null), coalesce(unbound_integer, 2, 1.0E0/2.0E0, 12.34E0, null) FROM (SELECT CAST(987 AS INTEGER) AS unbound_integer) t",
    "SELECT coalesce(6 * unbound_integer, 0), coalesce(6 * unbound_integer, 0.5E0), coalesce(unbound_integer, 2.0E0, 0.5E0, 12.34E0) FROM (SELECT CAST(987 AS INTEGER) AS unbound_integer) t")
  chunk("ExpressionInterpreter L1110-L1219",
    "SELECT IF(unbound_boolean, 1 + 2, 3 + 4), IF(unbound_boolean, BIGINT '1' + 2, 3 + 4), if(unbound_boolean, 1, 0 / 0) FROM (SELECT true AS unbound_boolean) t",
    "SELECT CASE WHEN unbound_boolean THEN (1 + 2) ELSE (3 + 4) END, CASE WHEN unbound_boolean THEN (BIGINT '1' + 2) ELSE (3 + 4) END, CASE WHEN unbound_boolean THEN 1 ELSE 0 / 0 END FROM (SELECT true AS unbound_boolean) t")
  chunk("ExpressionInterpreter L1198-L1198",
    "SELECT bound_string LIKE bound_pattern FROM (SELECT CAST('%el%' AS VARCHAR) AS bound_pattern, CAST('hello' AS VARCHAR) AS bound_string) t",
    "SELECT true FROM (SELECT CAST('%el%' AS VARCHAR) AS bound_pattern, CAST('hello' AS VARCHAR) AS bound_string) t")
  chunk("ExpressionInterpreter L1199-L1199",
    "SELECT 'abc' LIKE bound_pattern FROM (SELECT CAST('%el%' AS VARCHAR) AS bound_pattern) t",
    "SELECT false FROM (SELECT CAST('%el%' AS VARCHAR) AS bound_pattern) t")
  chunk("ExpressionInterpreter L1201-L1201",
    "SELECT unbound_string LIKE bound_pattern FROM (SELECT CAST('%el%' AS VARCHAR) AS bound_pattern, CAST('xyzzy' AS VARCHAR) AS unbound_string) t",
    "SELECT unbound_string LIKE bound_pattern FROM (SELECT CAST('%el%' AS VARCHAR) AS bound_pattern, CAST('xyzzy' AS VARCHAR) AS unbound_string) t")
  // both engines raise at runtime (division by zero in a
  // reached branch / multi-char dynamic LIKE escape)
  bothThrow("ExpressionInterpreter L985 both-throw",
    "SELECT case true when unbound_long = 1 then 1 when 0 / 0 = 0 then 2 else 33 end FROM (SELECT CAST(9876 AS BIGINT) AS unbound_long) t",
    "SELECT case true when unbound_long = 1 then 1 when 0 / 0 = 0 then 2 else 33 end FROM (SELECT CAST(9876 AS BIGINT) AS unbound_long) t")
  // both engines raise at runtime (division by zero in a
  // reached branch / multi-char dynamic LIKE escape)
  bothThrow("ExpressionInterpreter L1203 both-throw",
    "SELECT unbound_string LIKE unbound_pattern ESCAPE unbound_string FROM (SELECT CAST('%x%' AS VARCHAR) AS unbound_pattern, CAST('xyzzy' AS VARCHAR) AS unbound_string) t",
    "SELECT unbound_string LIKE unbound_pattern ESCAPE unbound_string FROM (SELECT CAST('%x%' AS VARCHAR) AS unbound_pattern, CAST('xyzzy' AS VARCHAR) AS unbound_string) t")
  // both engines raise at runtime (division by zero in a
  // reached branch / multi-char dynamic LIKE escape)
  bothThrow("ExpressionInterpreter L1220 both-throw",
    "SELECT if(unbound_boolean, 0 / 0, 1) FROM (SELECT true AS unbound_boolean) t",
    "SELECT CASE WHEN unbound_boolean THEN 0 / 0 ELSE 1 END FROM (SELECT true AS unbound_boolean) t")
}
