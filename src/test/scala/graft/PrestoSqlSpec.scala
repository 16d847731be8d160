package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the dialect scanner itself — the text-level invariants
  * the corpus runs rely on (string literals and comments must never be
  * rewritten; bracket/paren matching must survive nesting). */
class PrestoSqlSpec extends AnyFunSuite {

  private def rw(s: String) = PrestoSql.rewrite(s)

  test("ARRAY constructor with nesting and trailing subscripts") {
    assert(rw("ARRAY[1, 2]") == "array(1, 2)")
    assert(rw("ARRAY[ARRAY[1],ARRAY[2,3]]") == "array(array(1),array(2,3))")
    assert(rw("ARRAY[1,2][1]") == "array(1,2)[1]")
    assert(rw("x[1][2]") == "x[1][2]") // plain subscripts untouched
  }

  test("string literals, quoted identifiers and comments pass through") {
    assert(rw("SELECT 'ARRAY[1]'") == "SELECT 'ARRAY[1]'")
    assert(rw("SELECT 'it''s ARRAY[1]'") == "SELECT 'it''s ARRAY[1]'")
    // Presto double quotes delimit IDENTIFIERS (never strings) — they
    // lower to Spark's backtick spelling so the default parser (which
    // reads "..." as a string literal) resolves them as identifiers
    assert(rw("SELECT \"ARRAY\" FROM t") == "SELECT `ARRAY` FROM t")
    assert(rw("SELECT \"a\"\"b\" FROM t") == "SELECT `a\"b` FROM t")
    assert(rw("SELECT 1 -- ARRAY[1]\n+ 2") == "SELECT 1 -- ARRAY[1]\n+ 2")
    assert(rw("SELECT /* ARRAY[1] */ 2") == "SELECT /* ARRAY[1] */ 2")
    assert(rw("SELECT 'a = ANY(b)'") == "SELECT 'a = ANY(b)'")
  }

  test("VALUES row constructors strip; row() elsewhere stays") {
    assert(rw("VALUES ROW(1, 2)") == "VALUES (1, 2)")
    assert(rw("VALUES (1), ROW(2)") == "VALUES (1), (2)")
    assert(rw("(VALUES ROW(CAST(1 AS INT)))") == "(VALUES (CAST(1 AS INT)))")
    assert(rw("SELECT row(1, 2)") == "SELECT row(1, 2)")
    assert(rw("VALUES (ROW(1), 2)") == "VALUES (ROW(1), 2)") // nested struct kept
  }

  test("complex cast-target types convert recursively") {
    assert(rw("CAST(x AS ROW(a INTEGER, b VARCHAR))") ==
      "CAST(x AS STRUCT<a: INTEGER, b: STRING>)")
    assert(rw("CAST(x AS ROW(a ROW(b INT)))") == "CAST(x AS STRUCT<a: STRUCT<b: INT>>)")
    assert(rw("CAST(x AS ARRAY(ROW(a INT)))") == "CAST(x AS ARRAY<STRUCT<a: INT>>)")
    assert(rw("CAST(x AS MAP(INTEGER, VARCHAR))") == "CAST(x AS MAP<INTEGER, STRING>)")
    assert(rw("CAST(x AS array<row(aa bigint)>)") == "CAST(x AS STRUCT<aa: bigint>)" ||
      rw("CAST(x AS array<row(aa bigint)>)") == "CAST(x AS ARRAY<STRUCT<aa: bigint>>)")
  }

  test("quantified comparisons become IN / NOT IN") {
    assert(rw("x = ANY(SELECT 1)").replaceAll("\\s+", " ") == "x IN (SELECT 1)")
    assert(rw("x = SOME(SELECT 1)").replaceAll("\\s+", " ") == "x IN (SELECT 1)")
    assert(rw("x <> ALL(SELECT 1)").replaceAll("\\s+", " ") == "x NOT IN (SELECT 1)")
    assert(rw("x != ALL(SELECT 1)").replaceAll("\\s+", " ") == "x NOT IN (SELECT 1)")
    assert(rw("x <= 2") == "x <= 2") // bare comparison untouched
    assert(rw("max(x) over ()") == "max(x) over ()") // ALL/ANY only with (
  }

  test("VARCHAR and DECIMAL literal spellings") {
    assert(rw("CAST(x AS VARCHAR)") == "CAST(x AS STRING)")
    assert(rw("CAST(x AS VARCHAR(10))") == "CAST(x AS VARCHAR(10))")
    assert(rw("DECIMAL '2.5'") == "2.5BD")
    assert(rw("DECIMAL '-0.1'") == "-0.1BD")
  }

  test("UNNEST forms") {
    assert(rw("SELECT * FROM UNNEST(a)").contains("explode(a)"))
    assert(rw("SELECT * FROM UNNEST(a, b) t(x, y)").contains("inline(arrays_zip(a, b))"))
    assert(rw("t CROSS JOIN UNNEST(a) AS u(c)").contains("LATERAL VIEW explode(a) u AS c"))
    assert(rw("FROM t, UNNEST(a) u(b)").contains("LATERAL VIEW explode(a) u AS b"))
    val ord = rw("SELECT * FROM UNNEST(a) WITH ORDINALITY t(v, o)")
    assert(ord.contains("posexplode(arrays_zip(a))") && ord.contains("t(v, o)"))
  }

  test("unwrapLateralParens: derived tables and identifiers keep their parens") {
    // an unaliased-looking derived table whose inner FROM carries a
    // LATERAL-rewritten UNNEST: the parens are a subquery boundary Spark
    // needs, not a parenthesized join — must NOT be stripped
    val derived =
      rw("SELECT e FROM (SELECT e FROM orders CROSS JOIN UNNEST(arr) t(e)) GROUP BY e")
    assert(derived.replaceAll("\\s+", " ").contains("FROM (SELECT"))
    // identifier containing 'lateral' as a substring must not count as the
    // LATERAL keyword (word-boundary check)
    val ident = rw("SELECT * FROM (t1 JOIN t2 ON t1.collateral = t2.k) WHERE x = 1")
    assert(ident.replaceAll("\\s+", " ").contains("FROM (t1 JOIN"))
    // the genuine parenthesized-join-with-LATERAL case still unwraps
    val join = rw("SELECT * FROM ((SELECT a FROM t) u CROSS JOIN UNNEST(u.a) t(c)) GROUP BY c")
    assert(!join.replaceAll("\\s+", " ").matches("(?s).*FROM \\(\\(SELECT.*"))
  }

  test("rewrite output is deterministic (per-call alias counter)") {
    val q = "SELECT * FROM UNNEST(a) WITH ORDINALITY"
    assert(rw(q) == rw(q)) // a process-global counter would differ per call
  }

  test("pre-passes skip string literals") {
    // UNNEST(/AS ROW( inside literals must pass through untouched
    assert(rw("SELECT 'use UNNEST(x) here' FROM t")
      == "SELECT 'use UNNEST(x) here' FROM t")
    assert(rw("SELECT 'CAST(a AS ROW(x INT))' FROM t")
      == "SELECT 'CAST(a AS ROW(x INT))' FROM t")
  }

  test("rewrite is idempotent over representative dialect forms") {
    // A second rewrite pass must be a no-op: a query text that has already
    // been lowered contains no remaining Presto-only forms, and every pass
    // must leave lowered output alone (the FULL-JOIN/VALUES alias bug class
    // — double application through nested Engine.sql calls is legal).
    val forms = Seq(
      "SELECT ARRAY[1, ARRAY[2]][1][1] FROM t",
      "SELECT * FROM UNNEST(a) WITH ORDINALITY u(v, o)",
      "SELECT CAST(x AS ROW(a INTEGER, b ARRAY(VARCHAR))) FROM t",
      "SELECT count() over(partition by k) FROM t",
      "SELECT array_agg(x ORDER BY y DESC NULLS FIRST) FILTER (WHERE x > 1) FROM t",
      "SELECT a FROM t ORDER BY a, b DESC, c NULLS FIRST LIMIT 3",
      "SELECT 1 WHERE x < ALL (SELECT y FROM u) AND z >= ANY (SELECT w FROM v)",
      "SELECT x IN (VALUES (1), (2)) FROM t",
      "SELECT SMALLINT '1', VARCHAR 'a', JSON '[1]', DECIMAL '2.5'",
      "SELECT JSON_FORMAT(CAST(ROW(1, 'a') AS JSON))",
      "SELECT date_add('day', 10, d), date_diff('hour', a, b) FROM t",
      "SELECT x = ANY(SELECT 1), y <> ALL(SELECT 2)",
      "VALUES ROW(1, 2), (ROW(3, 4))")
    for (f <- forms) {
      val once = PrestoSql.rewrite(f)
      assert(PrestoSql.rewrite(once) == once, s"\nnot idempotent for: $f\nonce: $once")
    }
  }

  test("bare localtime/localtimestamp get argument lists") {
    assert(PrestoSql.rewrite("SELECT localtime").contains("localtime()"))
    assert(PrestoSql.rewrite("SELECT LOCALTIMESTAMP")
      .toLowerCase.contains("localtimestamp()"))
    // already-callable and qualified forms, and literals, stay untouched
    assert(PrestoSql.rewrite("SELECT localtime()") == "SELECT localtime()")
    assert(PrestoSql.rewrite("SELECT t.localtime FROM t")
      == "SELECT t.localtime FROM t")
    assert(PrestoSql.rewrite("SELECT 'localtime'") == "SELECT 'localtime'")
    // idempotent (nested Engine.sql calls re-rewrite lowered text)
    val once = PrestoSql.rewrite("SELECT localtime, localtimestamp")
    assert(PrestoSql.rewrite(once) == once)
  }

  test("oracleize skips table names inside literals") {
    val o = graft.queries.RefCorpus.oracleize(
      "SELECT comment FROM orders WHERE comment LIKE '%orders%'")
    assert(o.contains("FROM ref_orders"))
    assert(o.contains("LIKE '%orders%'"), o)
  }
}
