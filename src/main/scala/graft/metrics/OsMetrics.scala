package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5: OS metrics source — the reference's `uptime`/`free` output parsers
  * (metrics/os_metrics.go:69-160), semantics pinned by its own test fixtures
  * (metrics/os_metrics_test.go:64-175). The scheduler that samples them
  * (main.go:102-202) is driver-side housekeeping here: Pipeline emits a
  * job-metrics snapshot next to the lineage manifest.
  */
object OsMetrics {

  final case class UptimeInfo(
      currentTime: String,
      upDurationMinutes: Int,
      users: Int,
      load1: String,
      load5: String,
      load15: String)

  final case class MemoryInfo(
      swapUse: Long,
      cachUse: Long,
      memUse: Long,
      memFree: Long,
      memAvailable: Long)

  private val timeRe = """^\s*(\d{2}:\d{2}(:\d{2})?)""".r.unanchored
  private val durUsersRe = """up\s+(.*),\s*(\d+)\s+users?""".r.unanchored
  private val daysHoursRe = """(\d+).*?,\s*(\d{1,2}):(\d{2})""".r.unanchored
  private val hourMinRe = """(\d{1,2}):(\d{2})""".r.unanchored
  private val loadRe = """load averages?\s*:\s*(\d+\.\d+)[,\s]\s*(\d+\.\d+)[,\s]\s*(\d+\.\d+)""".r.unanchored

  /** os_metrics.go:69-115. Like the reference, assumes the `up …, N users`
    * clause exists (the Go indexes the match unchecked and would panic);
    * callers pass real `uptime` output. fallbackNow stands in for the
    * reference's time.Now() fallback when the leading clock is absent.
    */
  def parseUptime(s: String, fallbackNow: => String = ""): UptimeInfo = {
    val currentTime = timeRe.findFirstMatchIn(s).map(_.group(1)).getOrElse(fallbackNow)
    val du = durUsersRe.findFirstMatchIn(s).get // unchecked like os_metrics.go:86
    val duration = du.group(1)
    val upMinutes = daysHoursRe.findFirstMatchIn(duration) match {
      case Some(m) => m.group(1).toInt * 24 * 60 + m.group(2).toInt * 60 + m.group(3).toInt
      case None => // no days, just hours:minutes
        hourMinRe.findFirstMatchIn(duration)
          .map(m => m.group(1).toInt * 60 + m.group(2).toInt).getOrElse(0)
    }
    val (l1, l5, l15) = loadRe.findFirstMatchIn(s)
      .map(m => (m.group(1), m.group(2), m.group(3))).getOrElse(("", "", ""))
    UptimeInfo(currentTime, upMinutes, du.group(2).toInt, l1, l5, l15)
  }

  /** os_metrics.go:132-160. Bug-for-bug: the reference scans the swap line
    * with `Sscanf("%s %d %d %d", &swapTotal:int64, …)` — %s into an int64
    * pointer errors out before anything is assigned, so SwapUse is ALWAYS 0
    * regardless of actual swap usage (os_metrics.go:148). Reproduced.
    */
  def parseFree(s: String): Option[MemoryInfo] = {
    val lines = s.split("\n")
    if (lines.length < 3) return None
    val mem = lines(1).trim.split("\\s+")
    def at(i: Int): Long = if (i < mem.length) mem(i).toLongOption.getOrElse(0L) else 0L
    Some(MemoryInfo(
      swapUse = 0L, // the Sscanf bug above
      cachUse = at(5),
      memUse = at(2),
      memFree = at(3),
      memAvailable = at(6)))
  }

  /** the reference's own test fixtures (os_metrics_test.go:66,93,120) —
    * the deterministic inputs for the driver correctness row
    */
  val uptimeFixtures: Seq[(String, String)] = Seq(
    "macos" -> "12:13  up 13 days, 13:27, 11 users, load averages: 1.25 1.50 1.52",
    "ubuntu" -> "09:18:58 up 34 days, 14:35,  2 users,  load average: 0.04, 0.03, 0.00",
    "ubuntu_fresh" -> "09:18:58 up 14:35,  2 users,  load average: 0.04, 0.03, 0.00")

  val freeFixture: String =
    """               total        used        free      shared  buff/cache   available
      |Mem:         8131912     1142280     5147464        4044     2163520     6989632
      |Swap:              0           0           0""".stripMargin

  /** long-format (fixture, metric, value) rows over the pinned fixtures —
    * the driver-visible face of the S5 parsers
    */
  def fixtureMetricsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val up = uptimeFixtures.flatMap { case (name, raw) =>
      val u = parseUptime(raw)
      Seq(
        (name, "current_time", u.currentTime),
        (name, "up_minutes", u.upDurationMinutes.toString),
        (name, "users", u.users.toString),
        (name, "load1", u.load1),
        (name, "load5", u.load5),
        (name, "load15", u.load15))
    }
    val free = parseFree(freeFixture).toSeq.flatMap { m =>
      Seq(
        ("free", "swap_use", m.swapUse.toString),
        ("free", "cach_use", m.cachUse.toString),
        ("free", "mem_use", m.memUse.toString),
        ("free", "mem_free", m.memFree.toString),
        ("free", "mem_available", m.memAvailable.toString))
    }
    (up ++ free).toDF("fixture", "metric", "value")
  }

  /** live snapshot for job-metrics emission (best effort, None off-Linux or
    * sandboxed) — the analog of the reference's sampling goroutine
    */
  def liveSnapshot(): (Option[UptimeInfo], Option[MemoryInfo]) = {
    def run(cmd: String): Option[String] =
      scala.util.Try(scala.sys.process.Process(cmd).!!.trim).toOption
    (run("uptime").flatMap(s => scala.util.Try(parseUptime(s)).toOption),
      run("free").flatMap(parseFree))
  }
}
