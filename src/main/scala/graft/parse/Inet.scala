package graft.parse

/** MySQL INET6_ATON-compatible textual-IP → binary encoding, as the
  * reference's raw-log sink stores client IPs (db/mysqldb.go:168-175 passes
  * the IP string through INET6_ATON; masked IPs arrive as NULL). Pure
  * parser — never touches java.net.InetAddress, which can trigger resolver
  * lookups on malformed input.
  *
  * Semantics (MySQL 8 INET6_ATON):
  *  - IPv4 dotted quad → 4 bytes
  *  - IPv6 (any RFC 4291 textual form, including "::" compression and an
  *    embedded IPv4 tail like ::ffff:1.2.3.4) → 16 bytes
  *  - anything else → null
  */
object Inet {

  def inetAton(s: String): Array[Byte] = {
    if (s == null || s.isEmpty) null
    else if (s.indexOf(':') >= 0) parseV6(s)
    else parseV4(s)
  }

  private def parseV4(s: String): Array[Byte] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return null
    val out = new Array[Byte](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      // MySQL rejects empty, non-digit, and >255 octets (leading zeros allowed)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return null
      val v = p.toInt
      if (v > 255) return null
      out(i) = v.toByte
      i += 1
    }
    out
  }

  private def parseV6(s: String): Array[Byte] = {
    // split around at most one "::"; each side is a list of 16-bit hex
    // groups, except the final group may be an embedded IPv4 quad
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return null
    val (leftStr, rightStr) =
      if (dc < 0) (s, null)
      else (s.substring(0, dc), s.substring(dc + 2))

    // an embedded IPv4 quad is only legal as the FINAL group of the whole
    // address (it must occupy bytes 12-15), i.e. the last slot of the right
    // part when "::" is present, or of the left part when it is not
    def groups(part: String, allowV4Tail: Boolean): Array[Array[Byte]] = {
      if (part == null || part.isEmpty) return Array.empty
      val gs = part.split(":", -1)
      val out = Array.newBuilder[Array[Byte]]
      var i = 0
      while (i < gs.length) {
        val g = gs(i)
        if (g.isEmpty) return null
        if (g.indexOf('.') >= 0) {
          if (!allowV4Tail || i != gs.length - 1) return null
          val v4 = parseV4(g)
          if (v4 == null) return null
          out += Array(v4(0), v4(1))
          out += Array(v4(2), v4(3))
        } else {
          if (g.length > 4 || !g.forall(c => Character.digit(c, 16) >= 0)) return null
          val v = Integer.parseInt(g, 16)
          out += Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        }
        i += 1
      }
      out.result()
    }

    val left = groups(leftStr, allowV4Tail = dc < 0)
    if (left == null) return null
    val right = if (dc < 0) Array.empty[Array[Byte]]
    else groups(rightStr, allowV4Tail = true)
    if (right == null) return null
    val n = left.length + right.length
    if (dc < 0 && n != 8) return null
    if (dc >= 0 && n > 7) return null // "::" must compress ≥ 1 zero group
    val out = new Array[Byte](16)
    var i = 0
    left.indices.foreach { j => out(i) = left(j)(0); out(i + 1) = left(j)(1); i += 2 }
    i = 16 - right.length * 2
    right.indices.foreach { j => out(i) = right(j)(0); out(i + 1) = right(j)(1); i += 2 }
    out
  }
}
