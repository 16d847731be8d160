package graft

import org.scalatest.funsuite.AnyFunSuite

/** IPADDRESS (functions/IpAddress.scala) — assertions mirror the
  * reference's MAIN/test/type/TestIpAddressOperators.java: varchar and
  * varbinary casts both ways (IPv4 stored ::ffff-mapped, RFC 5952
  * canonical rendering), bytewise comparisons, the typed literal, and the
  * reference's cast error texts. */
class IpAddressSpec extends AnyFunSuite {
  import TestSession._

  private lazy val e = Engine(spark)
  private def one(sql: String): Any = e.sql(s"SELECT $sql AS r").collect()(0).get(0)

  test("varchar casts canonicalize: lowercase, zero-run compression, mapped IPv4") {
    assert(one("cast(cast('192.168.0.1' as ipaddress) as varchar)") == "192.168.0.1")
    assert(one("cast(cast('2001:DB8:0:0:0:0:0:1' as ipaddress) as varchar)") == "2001:db8::1")
    assert(one("cast(cast('2001:db8::2:1' as ipaddress) as varchar)") == "2001:db8::2:1")
    assert(one("cast(cast('::ffff:1.2.3.4' as ipaddress) as varchar)") == "1.2.3.4")
    assert(one("cast(cast('::1' as ipaddress) as varchar)") == "::1")
    // single zero group is NOT compressed (RFC 5952 4.2.2)
    assert(one("cast(cast('2001:db8:1:0:2:3:4:5' as ipaddress) as varchar)")
      == "2001:db8:1:0:2:3:4:5")
  }

  test("varbinary casts: 4-byte widens to mapped form, 16-byte passes through") {
    assert(one("to_hex(cast(cast('1.2.3.4' as ipaddress) as varbinary))")
      == "00000000000000000000FFFF01020304")
    assert(one("cast(cast(from_hex('20010db8000000000000000000000001') as ipaddress) as varchar)")
      == "2001:db8::1")
    assert(one("cast(cast(from_hex('01020304') as ipaddress) as varchar)")
      == "1.2.3.4")
  }

  test("comparisons are bytewise on the 16-byte image; literal form works") {
    assert(one("ipaddress '10.0.0.2' > ipaddress '10.0.0.1'") == true)
    assert(one("ipaddress '2001:db8::1' > ipaddress '255.255.255.255'") == true)
    assert(one("ipaddress '::ffff:1.2.3.4' = ipaddress '1.2.3.4'") == true)
    assert(one("ipaddress '10.0.0.1' between ipaddress '10.0.0.0' and ipaddress '10.0.0.9'") == true)
    val n = e.sql(
      "SELECT count(DISTINCT x) AS n FROM (VALUES ipaddress '1.2.3.4', " +
        "ipaddress '::ffff:1.2.3.4', ipaddress '1.2.3.5') t(x)")
      .collect()(0).getLong(0)
    assert(n == 2L)
    val ordered = e.sql(
      "SELECT cast(x AS varchar) AS r FROM (VALUES ipaddress '2001:db8::1', " +
        "ipaddress '9.255.255.255', ipaddress '10.0.0.0') t(x) ORDER BY x")
      .collect().map(_.getString(0)).toSeq
    assert(ordered == Seq("9.255.255.255", "10.0.0.0", "2001:db8::1"))
  }

  test("invalid casts raise the reference error texts; TRY_CAST recovers") {
    val ex = intercept[Exception](one("cast('not-an-ip' as ipaddress)"))
    assert(ex.getMessage.contains("Cannot cast value to IPADDRESS"),
      ex.getMessage)
    val ex2 = intercept[Exception](
      one("cast(cast(from_hex('0102030405') as ipaddress) as varchar)"))
    assert(ex2.getMessage.contains("Invalid IP address binary length: 5"),
      ex2.getMessage)
    assert(one("try_cast('not-an-ip' as ipaddress)") == null)
  }
}
