package graft.oracle

import scala.collection.mutable

import graft.model.{Malicious, MetricRow, MetricType, ParsedFields, TranscriptTurn}
import graft.parse.{LineParser, UserAgents}

/** Single-threaded, arrival-order reimplementation of the reference's
  * handler semantics (SURVEY.md §5.2). Used ONLY as a test oracle: the Spark
  * engine's outputs must equal this on generated data. No Spark imports.
  *
  * Arrival order: conversations are independent streams (the per-file analog,
  * main.go:83-96); within a conversation, turns arrive in turn_idx order.
  */
object RefOracle {

  /** Sticky-format parse of one conversation's turns, arrival order.
    * quirk=true reproduces main.go:744's variable shadowing: the format-
    * detection line itself is dropped (counted as an error) — the engine
    * default (quirk=false) emits it, parsed with the detected format.
    */
  def parseConv(turns: Seq[TranscriptTurn], quirk: Boolean = false): Seq[(TranscriptTurn, ParsedFields)] = {
    var parser: Option[LineParser.Format] = None
    val out = Vector.newBuilder[(TranscriptTurn, ParsedFields)]
    turns.foreach { t =>
      val line = t.text
      if (line.nonEmpty) {
        parser match {
          case None =>
            // detection: last match wins (main.go:743-749)
            val fmt = LineParser.detect(line)
            fmt.foreach { f =>
              parser = Some(f)
              if (!quirk) LineParser.parse(line, f).foreach(p => out += ((t, p)))
            }
          case Some(f) =>
            LineParser.parse(line, f).foreach(p => out += ((t, p)))
        }
      }
    }
    out.result()
  }

  /** Parse the whole table (grouped by conv, arrival order). */
  def parseAll(turns: Seq[TranscriptTurn], quirk: Boolean = false): Seq[(TranscriptTurn, ParsedFields)] =
    turns.groupBy(_.conv_id).toSeq.sortBy(_._1).flatMap { case (_, ts) =>
      parseConv(ts.sortBy(_.turn_idx), quirk)
    }

  // ---------------------------------------------------------------------
  // COUNTER handler (handlers/counter.go:137-229). Pure sums — order-free.
  final case class CounterTotals(
      handledEntries: Long, totalRequests: Long, totalBytes: Long,
      humans: Long, nonHumans: Long, malicious: Long)

  def counterTotals(parsed: Seq[ParsedFields]): CounterTotals = CounterTotals(
    handledEntries = parsed.size,
    totalRequests = parsed.size,
    totalBytes = parsed.map(_.bytes_sent).sum,
    humans = parsed.count(_.ua.exists(_.ua_human == UserAgents.HumanYes)),
    nonHumans = parsed.count(_.ua.exists(_.ua_human == UserAgents.HumanNo)),
    malicious = parsed.count(_.malicious != Malicious.Unknown))

  /** The 9 keyed count maps (counter.go:67-75). Key None = the Go nil-UA
    * case (Apache common format), where the reference would nil-panic —
    * defined here (and in the engine) as counting under a null key.
    */
  def keyedCounts(parsed: Seq[ParsedFields]): Map[String, Map[Option[String], Long]] = {
    def cnt(f: ParsedFields => Option[String]) =
      parsed.groupBy(f).view.mapValues(_.size.toLong).toMap
    Map(
      "client_ip" -> cnt(p => Some(p.client_ip)),
      "device_type" -> cnt(p => p.ua.map(_.ua_device_type)),
      "intent" -> cnt(p => p.ua.map(_.ua_intent)),
      "method" -> cnt(p => Some(p.method)),
      "status" -> cnt(p => Some(p.status)),
      "ua_family" -> cnt(p => p.ua.map(_.ua_family)),
      "os_family" -> cnt(p => p.ua.map(_.ua_os)),
      "referer" -> cnt(p => Some(p.referer)),
      "path" -> cnt(p => Some(p.path)))
  }

  // ---------------------------------------------------------------------
  // time window (handlers/metricgenerator.go:131-158): int64 yyyyMMddHHmm
  // computed in the event's own UTC offset, minute floored to the window.
  def timeWindow(p: ParsedFields, windowMinutes: Int = 10): Long = p.log_ts match {
    case None => 101010000L // Go zero time: "0001010100"+"00"
    case Some(ts) =>
      val odt = java.time.Instant.ofEpochMilli(ts.getTime)
        .atOffset(java.time.ZoneOffset.ofTotalSeconds(p.tz_offset_sec))
      val base = f"${odt.getYear}%04d${odt.getMonthValue}%02d${odt.getDayOfMonth}%02d${odt.getHour}%02d"
      val m = odt.getMinute
      val floored = windowMinutes match {
        case 1  => m
        case 5  => m - m % 5
        case 15 => m - m % 15
        case 30 => m - m % 30
        case 60 => 0
        case _  => m - m % 10
      }
      (base + f"$floored%02d").toLong
  }

  // ---------------------------------------------------------------------
  // METRICS handler state store (metrics/SBOMetrics.go) — exact replication
  // of the bounded out-of-order window logic including its quirks: keys[0]
  // overwrite-then-sort (SBOMetrics.go:189-191), late-drop (:193-196), and
  // `Values[tw] < 1` re-entry when a stored value is 0 (:188).
  final class MetricState(windowSize: Int) {
    final class SboMetric {
      val keys: Array[Long] = Array.fill(windowSize)(0L)
      val values: mutable.LinkedHashMap[Long, Long] = mutable.LinkedHashMap.empty
      var keyCounter: Int = 0
    }
    private val metrics = mutable.LinkedHashMap.empty[(Int, String), SboMetric]
    private var tracking: mutable.ArrayBuffer[Long] = _
    private val emitted = Vector.newBuilder[(Int, String, Long, Long)]

    private def doTracking(tw: Long): Unit = { // SBOMetrics.go:159-177
      if (tracking == null) tracking = mutable.ArrayBuffer.fill(windowSize + 1)(0L)
      if (!tracking.contains(tw)) {
        tracking += tw
        if (tracking.length >= windowSize) {
          val sorted = tracking.sorted
          tracking = sorted.drop(1)
        }
      }
    }

    def add(metricType: Int, key: String, tw: Long, v: Long): Unit = {
      val m = metrics.getOrElseUpdate((metricType, key), new SboMetric)
      doTracking(tw)
      if (m.values.getOrElse(tw, 0L) < 1) { // SBOMetrics.go:188
        m.keys(0) = tw
        java.util.Arrays.sort(m.keys)
        if (m.keyCounter >= windowSize) {
          if (m.keys(0) == tw) return // late arrival: silently dropped (:193-196)
          else {
            val evictTw = m.keys(0)
            val evictVal = m.values.getOrElse(evictTw, 0L)
            m.values.remove(evictTw)
            emitted += ((metricType, key, evictTw, evictVal))
          }
        }
        m.values(tw) = v
        m.keyCounter += 1
      } else {
        m.values(tw) = m.values(tw) + v
      }
    }

    /** End() flush (metricgenerator.go:170-182) + previously evicted rows. */
    def allRows(): Seq[(Int, String, Long, Long)] = {
      val flush = metrics.toSeq.flatMap { case ((mt, k), m) =>
        m.values.toSeq.map { case (tw, v) => (mt, k, tw, v) }
      }
      emitted.result() ++ flush
    }
  }

  /** METRICS handler per entry (metricgenerator.go:86-126). */
  def handleMetrics(state: MetricState, p: ParsedFields, windowMinutes: Int = 10): Unit = {
    val tw = timeWindow(p, windowMinutes)
    state.add(MetricType.ReqCount, "", tw, 1L)
    state.add(MetricType.BytesSent, "", tw, p.bytes_sent)
    state.add(MetricType.HttpStatus, p.status, tw, 1L)
    state.add(MetricType.Method, p.method, tw, 1L)
    if (p.referer.nonEmpty) state.add(MetricType.Referer, p.referer, tw, 1L)
    if (p.status.nonEmpty && p.status.startsWith("2")) {
      state.add(MetricType.Path, p.path1, tw, 1L)
      if (p.path2.nonEmpty) state.add(MetricType.Path, p.path2, tw, 1L)
      if (p.path3.nonEmpty) state.add(MetricType.Path, p.path3, tw, 1L)
    }
    // nil-UA (Apache common) → null key, defined divergence from the Go crash
    state.add(MetricType.UaFamily, p.ua.map(_.ua_family).orNull, tw, 1L)
    state.add(MetricType.OsFamily, p.ua.map(_.ua_os).orNull, tw, 1L)
    state.add(MetricType.DeviceType, p.ua.map(_.ua_device_type).orNull, tw, 1L)
    state.add(MetricType.IsHuman, p.ua.map(_.ua_human).orNull, tw, 1L)
    state.add(MetricType.RequestIntent, p.ua.map(_.ua_intent).orNull, tw, 1L)
  }

  /** Full metrics pipeline over the table: per-conversation state (the
    * per-file analog), arrival order, evictions + final flush, aggregated
    * by (conv, type, key, window) — the form the engine's groupBy produces.
    */
  def metricRows(turns: Seq[TranscriptTurn], windowMinutes: Int = 10,
      metricsWindowSize: Int = 3, quirk: Boolean = false): Seq[MetricRow] = {
    turns.groupBy(_.conv_id).toSeq.sortBy(_._1).flatMap { case (conv, ts) =>
      val st = new MetricState(metricsWindowSize)
      parseConv(ts.sortBy(_.turn_idx), quirk).foreach { case (_, p) => handleMetrics(st, p, windowMinutes) }
      st.allRows()
        .groupBy { case (mt, k, tw, _) => (mt, k, tw) }
        .map { case ((mt, k, tw), rows) => MetricRow(conv, mt, k, tw, rows.map(_._4).sum) }
    }
  }

  /** F1 "relevant-only" routing predicate (main.go:768-779). Rows with no
    * UA (Go would nil-panic) are defined as NOT relevant.
    */
  def isRelevant(p: ParsedFields): Boolean =
    p.malicious == Malicious.Unknown &&
      (p.status.startsWith("2") || p.status.startsWith("5")) &&
      p.ua.exists(u =>
        u.ua_device_type != UserAgents.DeviceScript &&
          u.ua_family != UserAgents.FamilyScanner &&
          u.ua_family != UserAgents.FamilySEOBot &&
          u.ua_family != UserAgents.FamilyScript)
}
