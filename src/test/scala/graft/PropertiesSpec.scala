package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round-trips (SURVEY §5: casts, encodings, date
  * arithmetic) evaluated through the engine itself. Deterministic seeds
  * (plain scalacheck Gen — no scalatestplus bridge in the build). */
class PropertiesSpec extends AnyFunSuite {
  import TestSession._

  private lazy val engine = Engine(spark)

  private def one(sql: String): Any = engine.sql(s"SELECT $sql").head.get(0)

  private def forAll[T](gen: Gen[T], minSuccessful: Int = 30)(f: T => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var done = 0
    var attempts = 0
    while (done < minSuccessful && attempts < minSuccessful * 10) {
      gen.apply(params, seed).foreach { v => f(v); done += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(done >= minSuccessful / 2, s"generator produced too few values ($done)")
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B], minSuccessful: Int)(
      f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), minSuccessful) { case (a, b) => f(a, b) }

  private def minSuccessful(n: Int): Int = n

  test("base64 round-trips arbitrary strings") {
    val strGen = Gen.asciiPrintableStr.map(_.filterNot(c => c == '\\' || c == '\''))
    forAll(strGen, minSuccessful(30)) { s =>
      assert(one(s"decode(unbase64(base64(encode('$s', 'UTF-8'))), 'UTF-8')") == s)
    }
  }

  test("hex round-trips longs") {
    forAll(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue), minSuccessful(30)) { n =>
      assert(one(s"conv(hex(${n}L), 16, -10)").toString.toLong == n)
    }
  }

  test("to_base/from_base round-trips across radices") {
    forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(2, 36), minSuccessful(30)) {
      (n, radix) =>
        assert(one(s"from_base(to_base(${n}L, $radix), $radix)") == n)
    }
  }

  test("date_add/date_sub are inverses") {
    forAll(Gen.chooseNum(-3000, 3000), minSuccessful(30)) { d =>
      assert(one(s"date_sub(date_add(DATE '2000-06-15', $d), $d)").toString
        == "2000-06-15")
    }
  }

  test("mysql date pattern round-trips timestamps at second precision") {
    val tsGen = Gen.chooseNum(0L, 4102444800L) // 1970..2100
    forAll(tsGen, minSuccessful(30)) { epoch =>
      val v = one(
        s"""CAST(to_unixtime(date_parse(
           |  date_format(from_unixtime($epoch), '%Y-%m-%d %H:%i:%s'),
           |  '%Y-%m-%d %H:%i:%s')) AS BIGINT)""".stripMargin)
      assert(v == epoch)
    }
  }

  test("word tokens: split/array_join round-trip") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    forAll(Gen.nonEmptyListOf(word), minSuccessful(30)) { ws =>
      val joined = ws.mkString(" ")
      assert(one(s"array_join(split('$joined', ' '), ' ')") == joined)
    }
  }

  test("big-endian codecs round-trip ints and longs") {
    forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue), minSuccessful(30)) { n =>
      assert(one(s"from_big_endian_32(to_big_endian_32($n))") == n)
    }
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue), minSuccessful(30)) { n =>
      assert(one(s"from_big_endian_64(to_big_endian_64(${n}L))") == n)
    }
  }

  test("ieee754 codecs round-trip doubles exactly") {
    forAll(Gen.chooseNum(-1e12, 1e12), minSuccessful(30)) { d: Double =>
      assert(one(s"from_ieee754_64(to_ieee754_64(cast($d as double)))") == d)
    }
  }

  test("normal_cdf and inverse are inverses on (0,1)") {
    forAll(Gen.chooseNum(0.01, 0.99), minSuccessful(20)) { p: Double =>
      val back = one(s"normal_cdf(0, 1, inverse_normal_cdf(0, 1, $p))")
        .asInstanceOf[Double]
      assert(math.abs(back - p) < 1e-9, s"p=$p back=$back")
    }
  }

  test("TIME literals round-trip through string casts") {
    val hms = Gen.zip(Gen.chooseNum(0, 23), Gen.chooseNum(0, 59), Gen.chooseNum(0, 59))
    forAll(hms, minSuccessful(30)) { case (h, m, s) =>
      val t = f"$h%02d:$m%02d:$s%02d"
      assert(one(s"CAST(CAST(TIME '$t' AS STRING) AS TIME)") ==
        java.time.LocalTime.of(h, m, s))
      assert(one(s"hour(TIME '$t') * 3600 + minute(TIME '$t') * 60 + " +
        s"second(TIME '$t')") == h * 3600 + m * 60 + s)
    }
  }

  test("hll estimate error stays within 5% across cardinalities") {
    Seq(100L, 1000L, 20000L).foreach { n =>
      val est = one(
        s"CAST(cardinality(approx_set(id)) AS BIGINT) FROM range(0, $n)")
        .asInstanceOf[Long]
      assert(math.abs(est - n).toDouble / n < 0.05, s"n=$n est=$est")
    }
  }
}
