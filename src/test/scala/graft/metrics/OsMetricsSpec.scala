package graft.metrics

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's own parser tests (metrics/os_metrics_test.go:
  * 64-175) — the 6 active unit-test surfaces of the S5 source.
  */
class OsMetricsSpec extends AnyFunSuite {

  test("uptime parse: macOS format (os_metrics_test.go:64-89)") {
    val u = OsMetrics.parseUptime(
      "12:13  up 13 days, 13:27, 11 users, load averages: 1.25 1.50 1.52")
    assert(u.currentTime == "12:13")
    assert(u.upDurationMinutes == 13 * 24 * 60 + 13 * 60 + 27)
    assert(u.users == 11)
    assert((u.load1, u.load5, u.load15) == ("1.25", "1.50", "1.52"))
  }

  test("uptime parse: Ubuntu format with days (os_metrics_test.go:92-117)") {
    val u = OsMetrics.parseUptime(
      "09:18:58 up 34 days, 14:35,  2 users,  load average: 0.04, 0.03, 0.00")
    assert(u.currentTime == "09:18:58")
    assert(u.upDurationMinutes == 34 * 24 * 60 + 14 * 60 + 35)
    assert(u.users == 2)
    assert((u.load1, u.load5, u.load15) == ("0.04", "0.03", "0.00"))
  }

  test("uptime parse: rebooted under a day, hours:minutes only (os_metrics_test.go:119-145)") {
    val u = OsMetrics.parseUptime(
      "09:18:58 up 14:35,  2 users,  load average: 0.04, 0.03, 0.00")
    assert(u.upDurationMinutes == 14 * 60 + 35)
    assert(u.users == 2)
  }

  test("free parse: Ubuntu fixture incl. the always-zero SwapUse Sscanf bug (os_metrics.go:148)") {
    val m = OsMetrics.parseFree(OsMetrics.freeFixture).get
    assert(m.cachUse == 2163520L)
    assert(m.memFree == 5147464L)
    assert(m.memUse == 1142280L)
    assert(m.memAvailable == 6989632L)
    assert(m.swapUse == 0L)
    // the bug: a non-zero swap column still reads as 0, like the Go
    val busy = OsMetrics.freeFixture.replace("Swap:              0           0           0",
      "Swap:        1000000      500000      500000")
    assert(OsMetrics.parseFree(busy).get.swapUse == 0L)
  }

  test("free parse: short output rejected (os_metrics.go:139-141)") {
    assert(OsMetrics.parseFree("just one line").isEmpty)
  }

  test("uptime fallback clock when the leading time is absent (os_metrics.go:77-80)") {
    val u = OsMetrics.parseUptime("up 1 day, 2:03, 4 users, load average: 0.10, 0.20, 0.30",
      fallbackNow = "99:99:99")
    assert(u.currentTime == "99:99:99")
    assert(u.upDurationMinutes == 1 * 24 * 60 + 2 * 60 + 3)
  }
}
