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

  test("randomized cross-check vs the JDK literal parser (seeded, 1000 cases)") {
    // InetAddress.getByName on a LITERAL never touches DNS. Excluded from
    // the property: v4-mapped ::ffff:a.b.c.d forms, where Java collapses to
    // an Inet4Address (4 bytes) while MySQL INET6_ATON keeps 16 — that case
    // is pinned explicitly in the forms test above.
    val rnd = new scala.util.Random(20260816L)
    (1 to 500).foreach { _ =>
      val ip = Seq.fill(4)(rnd.nextInt(256)).mkString(".")
      assert(Inet.inetAton(ip).toSeq ==
        java.net.InetAddress.getByName(ip).getAddress.toSeq, ip)
    }
    (1 to 500).foreach { _ =>
      val groups = Seq.fill(8)(Integer.toHexString(rnd.nextInt(0x10000)))
      val full = groups.mkString(":")
      // also a compressed variant: zero out a run and replace with ::
      val at = rnd.nextInt(7)
      val len = 1 + rnd.nextInt(8 - at)
      val left = groups.take(at).mkString(":")
      val right = groups.drop(at + len).mkString(":")
      val compressed = s"$left::$right"
      val zeroed = (groups.take(at) ++ Seq.fill(len)("0") ++ groups.drop(at + len))
        .mkString(":")
      assert(Inet.inetAton(full).toSeq ==
        java.net.InetAddress.getByName(full).getAddress.toSeq, full)
      assert(Inet.inetAton(compressed) != null &&
        Inet.inetAton(compressed).toSeq == Inet.inetAton(zeroed).toSeq,
        s"$compressed vs $zeroed")
    }
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
