package graft.sources

import graft.model.TranscriptTurn

/** Deterministic synthetic transcripts table (the Iceberg transcript table
  * stand-in per SURVEY.md §1.5). Every field is a pure closed-form function
  * of the global row index, so generation is embarrassingly parallel,
  * reproducible at any scale factor, and never touches a clock or RNG state.
  *
  * Each turn's `text` is an Apache/nginx-style access-log line (the
  * reference's input generalized to per-turn text per BASELINE.json). One
  * conversation = one log stream: the format is sticky per conversation,
  * mirroring the reference's per-file parser memoization (main.go:728-751).
  *
  * Skew is built in deliberately (north rule: hot-conversation skew): 4 hot
  * conversations carry ~4% of all turns each at sf0.01+, dwarfing the
  * 12-turn median conversation.
  */
object TranscriptGen {

  // -------------------------------------------------------------------------
  // deterministic hashing (splitmix64)
  final def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  private def mix2(a: Long, b: Long): Long = mix(mix(a) ^ b)
  private def pick(h: Long, shift: Int, n: Int): Int =
    (((h >>> shift) & 0xffffffL) % n).toInt

  // -------------------------------------------------------------------------
  // pools (all ASCII; chosen so percent-decoding is identity everywhere the
  // DuckDB oracle needs to reconstruct the path — quirk cases with decode
  // divergence are exercised only in ScalaTest fixtures)

  /** user agents — the 19 reference-pinned fixtures
    * (logparsers/useragent_test.go:121-661) plus a few single-token agents.
    */
  val uaPool: Vector[String] = Vector(
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_7_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/137.0.7151.51 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko); compatible; GPTBot/1.1; +https://openai.com/gptbot",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/136.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/91.0.4472.124 Safari/537.36 Edg/91.0.864.59",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.3.1 Safari/605.1.15",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:138.0) Gecko/20100101 Firefox/138.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_7_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/18.4 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 (Linux; Android 15) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/136.0.7103.127 Mobile Safari/537.36",
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    "Mozilla/5.0 (Linux; Android 6.0.1; Nexus 5X Build/MMB29P) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/W.X.Y.Z Mobile Safari/537.36 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    "Mozilla/5.0 (compatible; AhrefsBot/7.0; +http://ahrefs.com/robot/)",
    "Mozilla/5.0 (Linux; Android 8.0; Pixel 2 Build/OPD3.170816.012) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/56.0.1511.1269 Mobile Safari/537.36; Bytespider",
    "Mozilla/5.0 (Linux; Android 5.0) AppleWebKit/537.36 (KHTML, like Gecko) Mobile Safari/537.36 (compatible; Bytespider; spider-feedback@bytedance.com)",
    "Dalvik/2.1.0 (Linux; U; Android 9.0; ZTE BA520 Build/MRA58K)",
    "facebookexternalhit/1.1 (+http://www.facebook.com/externalhit_uatext.php)",
    "facebook/1.1",
    "meta-externalagent/1.1 (+https://developers.facebook.com/docs/sharing/webmasters/crawler)",
    "Mozilla/5.0 zgrab/0.x",
    "Expanse, a Palo Alto Networks company, searches across the global IPv4 space multiple times per day to identify customers&#39; presences on the Internet. If you would like to be excluded from our scans, please send IP addresses/domains to: scaninfo@paloaltonetworks.com",
    "Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko; compatible; Amazonbot/0.1; +https://developer.amazon.com/support/amazonbot) Chrome/119.0.6045.214 Safari/537.36",
    "curl/8.5.0",
    "python-requests/2.31.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:139.0) Gecko/20100101 Firefox/139.0",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36")

  val benignPaths: Vector[String] = Vector(
    "/", "/index.html", "/api/v1/items", "/api/v1/items/123", "/about",
    "/blog/2025/11/weekly-update.html", "/static/css/main.css", "/robots.txt",
    "/a/b/c/d/e.html", "/img/logo.png", "/docs/guide/intro", "/health")

  val queryPaths: Vector[String] = Vector(
    "/search?q=spark+tuning", "/api/v1/items/123?sort=asc&page=2",
    "/landing?utm_source=newsletter&x=1",
    "/wp-content/plugins/helloapx/wp-apxupx.php?apx=upx&utm_source=google&otherparam=1",
    "/track?utm_source=ads-campaign", "/list?filter=recent&limit=50")

  /** traversal, %00-traversal, xss, sqlinj, invalid-escape — one of each class */
  val maliciousPaths: Vector[String] = Vector(
    "/files/../../etc/passwd",
    "/download?file=%00evil",
    "/comment?text=<script>alert(1)</script>",
    "/items?id='1%20insert%20into%20users",
    "/bad%zzpath")

  val refererPool: Vector[String] = Vector(
    "-", "-", "-", // weight: most requests have no referer
    "http://www.example.com/start.html",
    "https://google.com/search?q=analytics",
    "https://news.site.org:8080/a",
    "https://sub.partner.io/deals?id=7",
    "android-app://com.google.android.gm")

  val statusPool: Vector[String] = {
    // 70x 200, 10x 404, 5x 301, 5x 500, 4x 403, 3x 201, 3x 204 (of 100)
    Vector.fill(70)("200") ++ Vector.fill(10)("404") ++ Vector.fill(5)("301") ++
      Vector.fill(5)("500") ++ Vector.fill(4)("403") ++ Vector.fill(3)("201") ++
      Vector.fill(3)("204")
  }

  val methodPool: Vector[String] =
    Vector.fill(70)("GET") ++ Vector.fill(20)("POST") ++ Vector.fill(5)("HEAD") ++
      Vector.fill(3)("PUT") ++ Vector.fill(2)("DELETE")

  val domainPool: Vector[String] = Vector(
    "shop.example.com", "api.example.com", "blog.example.net",
    "example.org", "cdn.example.io", "example.dev:443")

  /** J2 fallback when the line format carries no vhost (main.go:666-669) */
  val defaultDomain = "default.local"

  val toolPool: Vector[String] = Vector("bash", "browser", "search", "python", "editor")

  // -------------------------------------------------------------------------
  // conversation layout: 4 hot conversations then uniform 12-turn tails
  final case class Layout(n: Long, hot: Int, hotLen: Long, tailLen: Long) {
    val hotTotal: Long = hot * hotLen
    def convOf(i: Long): (Long, Int) =
      if (i < hotTotal) (i / hotLen, (i % hotLen).toInt)
      else { val j = i - hotTotal; (hot + j / tailLen, (j % tailLen).toInt) }
  }

  def layout(n: Long): Layout = Layout(n, hot = 4, hotLen = math.max(64L, n / 100L), tailLen = 12L)

  def turnsFor(sfName: String): Long = sfName match {
    case "sf0.001" => 6000L
    case "sf0.01"  => 60000L
    case "sf0.1"   => 600000L
    case s if s.startsWith("sf") =>
      try math.max(1000L, (s.drop(2).toDouble * 6000000L).toLong)
      catch { case _: Exception => 60000L }
    case _ => 60000L
  }

  // 2025-11-17T00:00:00Z
  val baseEpochSec: Long = 1763337600L

  /** sticky per-conversation format id: 0 common, 1 combined, 2 vhost,
    * 3 nginx combined, 4 nginx custom
    */
  def formatOf(c: Long): Int = {
    val r = pick(mix2(c, 1L), 0, 10)
    if (r == 0) 0 else if (r <= 3) 1 else if (r <= 5) 2 else if (r <= 7) 3 else 4
  }

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("dd/MMM/uuuu:HH:mm:ss", java.util.Locale.ENGLISH)
    .withZone(java.time.ZoneOffset.UTC)

  def renderTs(epochSec: Long): String =
    tsFmt.format(java.time.Instant.ofEpochSecond(epochSec)) + " +0000"

  /** One turn, fully determined by (global index, total rows). */
  def turn(i: Long, lay: Layout): TranscriptTurn = {
    val (c, t) = lay.convOf(i)
    val hc = mix2(c, 2L)
    val h = mix2(c * 1000003L, t.toLong)

    val fmt = formatOf(c)
    val convId = f"conv-$c%08d"

    // event time: conversation start spread over a day, ~37s between turns,
    // +/-10s jitter (bounded out-of-orderness << one 10-minute metric window,
    // so the reference's late-drop rule (SBOMetrics.go:193-196) never fires
    // on generated data — SURVEY.md §7.4 item 2)
    val convStart = baseEpochSec + (java.lang.Long.remainderUnsigned(hc, 86400L) / 60L) * 60L
    val jitter = (java.lang.Long.remainderUnsigned(h, 21L) - 10L)
    val epochSec = convStart + t.toLong * 37L + jitter

    // request fields
    val ip = {
      val k = pick(h, 8, 64)
      s"203.0.113.$k"
    }
    val pathRoll = pick(h, 32, 100)
    val uri =
      if (pathRoll < 70) benignPaths(pick(h, 40, benignPaths.size))
      else if (pathRoll < 92) queryPaths(pick(h, 40, queryPaths.size))
      else maliciousPaths(pick(h, 40, maliciousPaths.size))
    val method = methodPool(pick(h, 56, methodPool.size))
    val status = statusPool(pick(h, 48, statusPool.size))
    val bytes = 1L + java.lang.Long.remainderUnsigned(h, 49999L)
    val ua = uaPool(pick(h, 16, uaPool.size))
    val referer = refererPool(pick(h, 24, refererPool.size))
    val logname = if (pick(hc, 4, 3) == 0) "frank" else "-"
    val user = if (pick(hc, 12, 4) == 0) "alice" else "-"
    val domain = domainPool(pick(hc, 20, domainPool.size))
    val tsStr = renderTs(epochSec)
    val reqTime = s"0.${100 + pick(h, 36, 900)}"
    val upTime = s"0.${100 + pick(h, 44, 900)}"

    val text = fmt match {
      case 0 => s"""$ip $logname $user [$tsStr] "$method $uri HTTP/1.1" $status $bytes"""
      case 1 => s"""$ip $logname $user [$tsStr] "$method $uri HTTP/1.1" $status $bytes "$referer" "$ua""""
      case 2 => s"""$domain $ip $logname $user [$tsStr] "$method $uri HTTP/1.1" $status $bytes "$referer" "$ua""""
      case 3 => s"""$ip - $user [$tsStr] "$method $uri HTTP/1.1" $status $bytes "$referer" "$ua""""
      case _ => s"""$ip - $user [$tsStr] "$method $uri HTTP/1.1" $status $bytes "$referer" "$ua" $reqTime $upTime"""
    }

    // transcript metadata
    val role =
      if (t == 0) "system"
      else {
        val r = pick(h, 4, 10)
        if (r < 4) "user" else if (r < 8) "assistant" else "tool"
      }
    val tool = if (role == "tool") toolPool(pick(h, 12, toolPool.size)) else ""

    TranscriptTurn(convId, t, role, text, tool, new java.sql.Timestamp(epochSec * 1000L))
  }
}
