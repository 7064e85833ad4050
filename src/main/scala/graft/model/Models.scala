package graft.model

import java.sql.Timestamp

/** Input row shape — the transcript table from BASELINE.json `input_hint`:
  * (conv_id, turn_idx, role, text, tool, ts). A conversation generalizes the
  * reference's per-file stream identity (reference: main.go:60, metrics/SBOMetrics.go:103);
  * `turn_idx` generalizes line order within a file.
  */
final case class TranscriptTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** User-agent classification result.
  * Mirrors the reference's SBOUserAgent (logparsers/useragent.go:117-124):
  * six strings drawn from closed enums (useragent.go:62-103).
  */
final case class UaInfo(
    ua_full: String,
    ua_os: String,
    ua_family: String,
    ua_device_type: String,
    ua_human: String,
    ua_intent: String)

/** Flat parse output. Mirrors the reference's SBOHttpRequestLog
  * (logparsers/httpservers.go:40-61) with the nested SBOUserAgent inlined
  * (flat columns prune/filter better in Parquet + Catalyst).
  *
  * Conventions kept from Go zero values: unset strings are "" (not null);
  * `ua` is None exactly where the reference leaves the pointer nil (Apache
  * common log format has no UA field, httpservers.go:169-192). `log_ts` is
  * None where Go silently produced the zero time (parse error ignored at
  * httpservers.go:175) — divergence documented in SURVEY.md §7.4.
  */
final case class ParsedFields(
    domain: String,
    client_ip: String,
    remote_logname: String,
    remote_user: String,
    log_ts: Option[Timestamp],
    tz_offset_sec: Int,
    method: String,
    path: String,
    path1: String,
    path2: String,
    path3: String,
    protocol: String,
    status: String, // kept as string like the reference (prefix-tested "2"/"5", main.go:771)
    bytes_sent: Long,
    referer: String,
    ua: Option[UaInfo],
    malicious: Int,
    format: String)

/** Flat parsed row: provenance + every derived field. The parse stage emits
  * this via a typed mapPartitions, which guarantees the branchy per-row parse
  * runs EXACTLY once per row (a Catalyst-expression parse is either collapsed
  * / predicate-pushed into multiple evaluations when deterministic, or kills
  * whole-stage codegen for the fused stage when marked nondeterministic —
  * both measured slower; see ParseStage).
  */
final case class ParsedTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    ts: Timestamp,
    text: String,
    domain: String,
    client_ip: String,
    remote_logname: String,
    remote_user: String,
    log_ts: Option[Timestamp],
    tz_offset_sec: Int,
    method: String,
    path: String,
    path1: String,
    path2: String,
    path3: String,
    protocol: String,
    status: String,
    bytes_sent: Long,
    referer: String,
    ua_full: Option[String],
    ua_os: Option[String],
    ua_family: Option[String],
    ua_device_type: Option[String],
    ua_human: Option[String],
    ua_intent: Option[String],
    malicious: Int,
    format: String)

object ParsedTurn {
  def apply(t: TranscriptTurn, p: ParsedFields): ParsedTurn = ParsedTurn(
    conv_id = t.conv_id, turn_idx = t.turn_idx, role = t.role, tool = t.tool,
    ts = t.ts, text = t.text,
    domain = p.domain, client_ip = p.client_ip,
    remote_logname = p.remote_logname, remote_user = p.remote_user,
    log_ts = p.log_ts, tz_offset_sec = p.tz_offset_sec,
    method = p.method, path = p.path, path1 = p.path1, path2 = p.path2,
    path3 = p.path3, protocol = p.protocol, status = p.status,
    bytes_sent = p.bytes_sent, referer = p.referer,
    ua_full = p.ua.map(_.ua_full), ua_os = p.ua.map(_.ua_os),
    ua_family = p.ua.map(_.ua_family), ua_device_type = p.ua.map(_.ua_device_type),
    ua_human = p.ua.map(_.ua_human), ua_intent = p.ua.map(_.ua_intent),
    malicious = p.malicious, format = p.format)
}

object Malicious {
  // reference: logparsers/httpservers.go:31-38
  val Unknown = 0
  val Invalid = 1
  val SqlInj = 10
  val Xss = 20
  val Traversal = 30
  val Scan = 40
}

/** Long-format metric row — the reference's SBOMetricWindowDataToBeSaved
  * (metrics/SBOMetrics.go:57-64) with conv_id standing in for FilePath.
  */
final case class MetricRow(
    conv_id: String,
    metric_type: Int,
    key_value: String,
    time_window: Long,
    metric_value: Long)

object MetricType {
  // reference: metrics/SBOMetrics.go:35-47
  val ReqCount = 1
  val BytesSent = 2
  val HttpStatus = 3
  val ClientIp = 4 // disabled in the reference (metricgenerator.go:92-98)
  val Method = 5
  val Referer = 6
  val Path = 7
  val UaFamily = 11
  val OsFamily = 12
  val DeviceType = 13
  val IsHuman = 14
  val RequestIntent = 15
}
