package graft

import org.scalatest.funsuite.AnyFunSuite

/** Presto's fail-on-error semantics (SURVEY §7 risk register): under ANSI
  * mode Spark matches Presto — division by zero, bad casts, and array
  * out-of-bounds throw; try()/try_* recover to NULL. */
class ErrorSemanticsSpec extends AnyFunSuite {
  import TestSession._

  private lazy val engine = Engine(spark)

  private def withAnsi[T](f: => T): T = {
    // the Engine runs on its own isolated session — toggle ANSI there
    val prev = engine.spark.conf.get("spark.sql.ansi.enabled")
    engine.spark.conf.set("spark.sql.ansi.enabled", "true")
    try f finally engine.spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  private def one(sql: String): Any = engine.sql(s"SELECT $sql").head.get(0)

  test("ANSI: division by zero throws (Presto DIVISION_BY_ZERO)") {
    withAnsi {
      val e = intercept[Exception](one("1 / 0"))
      assert(e.getMessage.contains("DIVIDE_BY_ZERO"))
    }
  }

  test("ANSI: invalid cast throws (Presto INVALID_CAST_ARGUMENT)") {
    withAnsi {
      val e = intercept[Exception](one("CAST('abc' AS INT)"))
      assert(e.getMessage.contains("CAST_INVALID_INPUT"))
    }
  }

  test("ANSI: array subscript out of bounds throws (Presto 1-based, throws)") {
    withAnsi {
      val e = intercept[Exception](one("ARRAY(1, 2)[5]"))
      assert(e.getMessage.toLowerCase.contains("index"))
    }
  }

  test("try() recovers errors to NULL (Presto TryFunction)") {
    withAnsi {
      assert(one("try(1 / 0)") == null)
      assert(one("try(CAST('abc' AS INT))") == null)
      assert(one("try(2 + 2)") == 4)
    }
  }

  test("fail() raises; try(fail()) recovers to NULL") {
    val e = intercept[Exception](one("fail('boom')"))
    assert(e.getMessage.contains("boom"))
    assert(one("try(fail('boom'))") == null)
  }

  test("try_cast / try_divide builtins") {
    withAnsi {
      assert(one("try_cast('abc' AS INT)") == null)
      assert(one("try_cast('42' AS INT)") == 42)
      assert(one("try_divide(1, 0)") == null)
    }
  }

  test("ANSI: integer overflow throws; try recovers") {
    withAnsi {
      intercept[Exception](one(s"${Long.MaxValue}L + 1L"))
      assert(one(s"try(${Long.MaxValue}L + 1L)") == null)
    }
  }

  test("grouping() over plain GROUP BY: key args give 0, non-key args error") {
    // Presto GroupingOperationRewriter: plain GROUP BY → every flag 0
    assert(engine.sql(
      "SELECT a, grouping(a) FROM (VALUES (1)) t(a) GROUP BY a").head.get(1) == 0)
    // "arguments must be grouping expressions" — a non-key argument must
    // NOT silently become 0 (the reference rejects the query)
    intercept[Exception](engine.sql(
      "SELECT a, grouping(b) FROM (VALUES (1, 2)) t(a, b) GROUP BY a").collect())
  }
}
