package graft.parse

import java.nio.charset.StandardCharsets

/** Minimal reimplementation of the Go net/url behaviors the reference relies
  * on (httpservers.go:79-131): `url.ParseRequestURI(uri)` for request paths
  * and `url.Parse(referer).Hostname()` for referer normalization. Java's
  * java.net.URI differs on several edge cases, so the subset is implemented
  * explicitly and pinned by tests. Not a general URL parser.
  */
object GoUrl {

  private def hasCtl(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < ' ' || c == '\u007f') return true
      i += 1
    }
    false
  }

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Go url.unescape in path mode: '%XX' must be two hex digits; '+' is NOT
    * decoded in paths. Returns None on a malformed escape (Go errors).
    */
  def unescapePath(s: String): Option[String] = {
    if (!s.contains('%')) return Some(s)
    val bytes = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length) return None
        val h = hexVal(s.charAt(i + 1)); val l = hexVal(s.charAt(i + 2))
        if (h < 0 || l < 0) return None
        bytes.write((h << 4) | l)
        i += 3
      } else {
        // append the UTF-8 bytes of this code point (surrogate-pair aware)
        val cp = s.codePointAt(i)
        val cs = new String(Character.toChars(cp)).getBytes(StandardCharsets.UTF_8)
        bytes.write(cs, 0, cs.length)
        i += Character.charCount(cp)
      }
    }
    Some(new String(bytes.toByteArray, StandardCharsets.UTF_8))
  }

  /** Go getScheme: returns (scheme, rest) or None for "no scheme". A leading
    * ':' is a hard parse error, signalled as Some(("", raw)) → caller errors.
    */
  private def splitScheme(raw: String): Either[Unit, (String, String)] = {
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) { /* ok */ }
      else if ((c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') {
        if (i == 0) return Right(("", raw)) // no scheme
      } else if (c == ':') {
        if (i == 0) return Left(()) // "missing protocol scheme"
        return Right((raw.substring(0, i).toLowerCase(java.util.Locale.ROOT), raw.substring(i + 1)))
      } else {
        return Right(("", raw)) // first non-scheme char → no scheme
      }
      i += 1
    }
    Right(("", raw))
  }

  /** Valid optional port per Go validOptionalPort: ":" or ":digits". */
  private def stripPort(host: String): String = {
    if (host.startsWith("[")) {
      val end = host.indexOf(']')
      if (end >= 0) host.substring(1, end) else host
    } else {
      val colon = host.lastIndexOf(':')
      if (colon < 0) host
      else {
        val port = host.substring(colon + 1)
        if (port.forall(c => c >= '0' && c <= '9')) host.substring(0, colon) else host
      }
    }
  }

  /** Mirrors url.ParseRequestURI for the two fields the reference reads:
    * (decoded Path, raw RawQuery). None = Go error (→ REQUEST_MALICIOUS_INVALID
    * at httpservers.go:100).
    */
  def parseRequestUri(raw: String): Option[(String, String)] = {
    if (raw.isEmpty || hasCtl(raw)) return None
    if (raw == "*") return Some(("*", ""))
    val (scheme, afterScheme) = splitScheme(raw) match {
      case Left(_)  => return None
      case Right(r) => r
    }
    var rest = afterScheme
    var rawQuery = ""
    if (rest.endsWith("?") && !rest.substring(0, rest.length - 1).contains("?")) {
      rest = rest.substring(0, rest.length - 1) // ForceQuery
    } else {
      val q = rest.indexOf('?')
      if (q >= 0) { rawQuery = rest.substring(q + 1); rest = rest.substring(0, q) }
    }
    if (!rest.startsWith("/")) {
      if (scheme.nonEmpty) return Some(("", rawQuery)) // opaque URI: Path stays ""
      return None // viaRequest: "invalid URI for request"
    }
    if (scheme.nonEmpty && rest.startsWith("//")) {
      val slash = rest.indexOf('/', 2)
      val authority = if (slash < 0) rest.substring(2) else rest.substring(2, slash)
      rest = if (slash < 0) "" else rest.substring(slash)
      // Go validates the port; a non-numeric port is a parse error
      val hostPart = { val at = authority.lastIndexOf('@'); if (at >= 0) authority.substring(at + 1) else authority }
      if (!hostPart.startsWith("[")) {
        val colon = hostPart.lastIndexOf(':')
        if (colon >= 0 && !hostPart.substring(colon + 1).forall(c => c >= '0' && c <= '9')) return None
      }
    }
    unescapePath(rest).map(path => (path, rawQuery))
  }

  /** Mirrors url.Parse(referer) → .Hostname() with "www." TrimPrefix applied
    * by the caller. Returns "" wherever Go yields an empty hostname or a
    * parse error (the reference leaves Referer unset on error,
    * httpservers.go:86-91).
    */
  def refererHostname(ref: String): String = {
    if (ref.isEmpty || hasCtl(ref)) return ""
    var s = ref
    val frag = s.indexOf('#')
    if (frag >= 0) s = s.substring(0, frag)
    val (scheme, afterScheme) = splitScheme(s) match {
      case Left(_)  => return ""
      case Right(r) => r
    }
    var rest = afterScheme
    val q = rest.indexOf('?')
    if (q >= 0) rest = rest.substring(0, q)
    if (!rest.startsWith("/")) return "" // opaque or relative: no host
    // authority present when "//" and (scheme != "" or not "///")
    if (rest.startsWith("//") && (scheme.nonEmpty || !rest.startsWith("///"))) {
      val slash = rest.indexOf('/', 2)
      val authority = if (slash < 0) rest.substring(2) else rest.substring(2, slash)
      val hostPart = { val at = authority.lastIndexOf('@'); if (at >= 0) authority.substring(at + 1) else authority }
      stripPort(hostPart)
    } else ""
  }
}
