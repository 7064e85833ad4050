package graft.parse

import org.scalatest.funsuite.AnyFunSuite

/** Inet.inetAton vs MySQL INET6_ATON semantics (db/mysqldb.go:168-175). */
class InetSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String =
    if (b == null) "NULL" else b.map(x => f"$x%02x").mkString

  test("ipv4 dotted quad encodes to 4 bytes") {
    assert(hex(Inet.inetAton("203.0.113.7")) == "cb007107")
    assert(hex(Inet.inetAton("0.0.0.0")) == "00000000")
    assert(hex(Inet.inetAton("255.255.255.255")) == "ffffffff")
  }

  test("ipv4 rejects out-of-range / malformed") {
    assert(Inet.inetAton("256.1.1.1") == null)
    assert(Inet.inetAton("1.2.3") == null)
    assert(Inet.inetAton("1.2.3.4.5") == null)
    assert(Inet.inetAton("a.b.c.d") == null)
    assert(Inet.inetAton("1..2.3") == null)
    assert(Inet.inetAton("") == null)
    assert(Inet.inetAton(null) == null)
  }

  test("ipv6 full, compressed, and v4-mapped forms encode to 16 bytes") {
    assert(hex(Inet.inetAton("2001:db8:0:0:0:ff00:42:8329")) ==
      "20010db8000000000000ff0000428329")
    assert(hex(Inet.inetAton("2001:db8::ff00:42:8329")) ==
      "20010db8000000000000ff0000428329")
    assert(hex(Inet.inetAton("::1")) == "00000000000000000000000000000001")
    assert(hex(Inet.inetAton("::")) == "00000000000000000000000000000000")
    assert(hex(Inet.inetAton("::ffff:192.0.2.128")) ==
      "00000000000000000000ffffc0000280")
    assert(hex(Inet.inetAton("fe80::")) == "fe800000000000000000000000000000")
  }

  test("ipv6 rejects malformed") {
    assert(Inet.inetAton("1:2:3:4:5:6:7") == null)     // 7 groups, no ::
    assert(Inet.inetAton("1:2:3:4:5:6:7:8:9") == null) // 9 groups
    assert(Inet.inetAton("1::2::3") == null)           // two ::
    assert(Inet.inetAton("1:2:3:4:5:6:7:8::") == null) // :: compresses nothing
    assert(Inet.inetAton("12345::") == null)           // group > 4 hex digits
    assert(Inet.inetAton("g::1") == null)
    assert(Inet.inetAton("::1.2.3.4.5") == null)
    assert(Inet.inetAton("1.2.3.4::5") == null)        // v4 tail not in last slot
  }
}
