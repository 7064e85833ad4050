package graft.app

import graft.operators.TextAnalysis
import graft.parse.UserAgents
import graft.sources.TranscriptGen

/** DuckDB oracle SQL builder for the transcript-pipeline queries. The parse
  * CTE re-derives every field with DuckDB regex/string functions; the UA
  * classification CASE is GENERATED from UserAgents.classify over the
  * generator's closed UA pool, so the SQL oracle and the engine cannot
  * disagree on classification by construction (the classifier itself is
  * pinned to the reference by UserAgentsSpec).
  *
  * The generator guarantees percent-decoding is identity for every pool path
  * except the invalid-escape case, which is why `split_part(uri,'?',1)`
  * reconstructs Go's decoded url.Path here (see TranscriptGen pool notes).
  */
object OracleSql {

  /** The scale the oracle SQL reads its derived tables (transcripts, sig
    * tables) at. Defaults to the driver's correctness scale (TESTDATA.md: t2
    * uses sf0.01) but is SET BY Verify.main from the sfDir it receives, so
    * verification at any other scale compares against same-scale tables
    * (VERDICT r2 "What's missing" item 4).
    */
  @volatile var verifySf: String = "sf0.01"
  def transcriptsGlob: String = s"/root/repo/data/transcripts/$verifySf/*.parquet"

  private def sq(s: String): String = s.replace("'", "''")

  // per-format regex built from ordered pieces; field → capture-group index.
  // DuckDB's regexp_extract only accepts group indexes 0-9, so each field
  // extraction uses a pattern variant where ONLY that field's group captures
  // (all others are non-capturing) and the index is always 1.
  private case class Fmt(name: String, pieces: Seq[(String, String)]) {
    // pieces: (fieldName or "", regex fragment that would be parenthesized)
    def matchPattern: String =
      "^" + pieces.map { case (_, frag) => s"(?:$frag)" }.mkString + "$"
    def capturing(field: String): Option[String] =
      if (!pieces.exists(_._1 == field)) None
      else Some("^" + pieces.map { case (f, frag) =>
        if (f == field) s"($frag)" else s"(?:$frag)"
      }.mkString + "$")
  }

  private val q = "\"" // regex literal quote char inside SQL single quotes
  private def sp(frag: String) = ("", frag) // separator piece

  private val fmts: Seq[Fmt] = {
    val ts = ("ts", "[^\\]]+")
    def req = Seq(sp(s" $q"), ("method", "\\S+"), sp(" "), ("uri", "\\S+"), sp(" "),
      ("proto", "\\S+"), sp(s"$q "), ("status", "\\d+"), sp(" "), ("bytes", "\\d+"))
    def refUa = Seq(sp(s" $q"), ("ref", s"[^$q]*"), sp(s"$q $q"), ("ua", s"[^$q]*"), sp(q))
    Seq(
      Fmt("nginx_custom",
        Seq(("ip", "\\S+"), sp(" - "), ("user", "\\S+"), sp(" \\["), ts, sp("\\]")) ++ req ++ refUa ++
          Seq(sp(" \\S+ \\S+"))),
      Fmt("nginx_combined",
        Seq(("ip", "\\S+"), sp(" - "), ("user", "\\S+"), sp(" \\["), ts, sp("\\]")) ++ req ++ refUa),
      Fmt("apache_vhost_combined",
        Seq(("domain", "\\S+"), sp(" "), ("ip", "\\S+"), sp(" "), ("logname", "\\S+"), sp(" "),
          ("user", "\\S+"), sp(" \\["), ts, sp("\\]")) ++ req ++ refUa),
      Fmt("apache_combined",
        Seq(("ip", "\\S+"), sp(" "), ("logname", "\\S+"), sp(" "), ("user", "\\S+"),
          sp(" \\["), ts, sp("\\]")) ++ req ++ refUa),
      Fmt("apache_common",
        Seq(("ip", "\\S+"), sp(" "), ("logname", "\\S+"), sp(" "), ("user", "\\S+"),
          sp(" \\["), ts, sp("\\]")) ++ req))
  }

  /** detection CASE: first match over reversed reference order (== the
    * reference's last-match-wins, main.go:743-749)
    */
  private val fmtCase: String =
    "CASE " + fmts.map(f => s"WHEN regexp_matches(text, '${f.matchPattern}') THEN '${f.name}'").mkString(" ") +
      " ELSE NULL END"

  private def groupCase(field: String, absentVal: String = "''"): String =
    "CASE fmt " + fmts.map { f =>
      val v = f.capturing(field)
        .map(p => s"regexp_extract(text, '$p', 1)")
        .getOrElse(absentVal)
      s"WHEN '${f.name}' THEN $v"
    }.mkString(" ") + " END"

  /** UA classification CASE generated from the engine classifier itself */
  private def uaCase(field: graft.model.UaInfo => String): String =
    "CASE ua_raw " + TranscriptGen.uaPool.map { ua =>
      s"WHEN '${sq(ua)}' THEN '${field(UserAgents.classify(ua))}'"
    }.mkString(" ") + " ELSE NULL END"

  /** the shared parse CTE prefix (def: transcriptsGlob tracks verifySf) */
  def parsedCte: String = {
    val raw = s"""
  t AS (SELECT * FROM read_parquet('$transcriptsGlob')),
  g AS (
    SELECT conv_id, turn_idx, role, tool, ts, text, $fmtCase AS fmt FROM t
  ),
  g2 AS (
    SELECT conv_id, turn_idx, role, tool, ts, text, fmt,
      ${groupCase("domain")} AS domain,
      ${groupCase("ip")} AS client_ip,
      ${groupCase("logname")} AS remote_logname,
      ${groupCase("user")} AS remote_user,
      ${groupCase("ts")} AS ts_str,
      ${groupCase("method")} AS method,
      ${groupCase("uri")} AS uri,
      ${groupCase("proto")} AS protocol,
      ${groupCase("status")} AS status,
      CAST(${groupCase("bytes")} AS BIGINT) AS bytes_sent,
      ${groupCase("ref", "NULL")} AS ref_raw,
      ${groupCase("ua", "NULL")} AS ua_raw
    FROM g WHERE fmt IS NOT NULL
  ),
  g3 AS (
    SELECT *,
      contains(uri, '%zz') AS invalid,
      split_part(uri, '?', 1) AS path,
      CASE WHEN strpos(uri, '?') > 0 THEN substr(uri, strpos(uri, '?') + 1) ELSE '' END AS rawq,
      strptime(substr(ts_str, 1, 20), '%d/%b/%Y:%H:%M:%S') AS log_ts,
      -- the "±hhmm" zone suffix; strptime's result above is WALL time, so
      -- instant = wall - tz_offset_sec wherever epoch math is needed
      CASE WHEN substr(ts_str, 22, 1) = '-' THEN -1 ELSE 1 END *
        (coalesce(TRY_CAST(substr(ts_str, 23, 2) AS INT), 0) * 3600 +
         coalesce(TRY_CAST(substr(ts_str, 25, 2) AS INT), 0) * 60) AS tz_offset_sec
    FROM g2
  ),
  g4 AS (
    SELECT *,
      CASE WHEN invalid OR path = '' THEN ''
           WHEN len(str_split(path, '/')) = 1 THEN '/'
           ELSE '/' || str_split(path, '/')[2] END AS path1,
      CASE WHEN invalid OR len(str_split(path, '/')) <= 2 THEN ''
           ELSE '/' || str_split(path, '/')[2] || '/' || str_split(path, '/')[3] END AS path2,
      CASE WHEN invalid OR len(str_split(path, '/')) <= 3 THEN ''
           ELSE '/' || str_split(path, '/')[2] || '/' || str_split(path, '/')[3] || '/' || str_split(path, '/')[4] END AS path3,
      CASE WHEN invalid THEN 1
           WHEN contains(path, '/../') OR contains(uri, '%00') THEN 30
           WHEN regexp_matches(rawq, '<script|script>|alert|onmouseover|onmouseout') THEN 20
           WHEN regexp_matches(rawq, '''.*(insert|update|exec|execute)') THEN 10
           ELSE 0 END AS malicious
    FROM g3
  ),
  g5 AS (
    SELECT *,
      CASE WHEN ref_raw IS NULL THEN ''
           WHEN regexp_extract(uri, '(\\?|&)utm_source=([^&]+)(&|$$)', 2) <> ''
             THEN regexp_extract(uri, '(\\?|&)utm_source=([^&]+)(&|$$)', 2)
           WHEN ref_raw = '' THEN ''
           ELSE regexp_replace(regexp_replace(
                  regexp_extract(ref_raw, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1),
                  ':[0-9]+$$', ''), '^www\\.', '') END AS referer,
      ${uaCase(_.ua_family)} AS ua_family0,
      ${uaCase(_.ua_os)} AS ua_os,
      ${uaCase(_.ua_device_type)} AS ua_device_type0,
      ${uaCase(_.ua_human)} AS ua_human0,
      ${uaCase(_.ua_intent)} AS ua_intent
    FROM g4
  ),
  parsed AS (
    SELECT conv_id, turn_idx, role, tool, ts, text, fmt, domain, client_ip,
      remote_logname, remote_user, log_ts, tz_offset_sec, method, uri, path, path1, path2, path3,
      protocol, status, bytes_sent, referer, malicious, ua_raw, ua_intent,
      CASE WHEN ua_raw IS NULL THEN NULL
           WHEN path1 = '/robots.txt' AND ua_family0 NOT IN ('AIBot','SEOBot','Script','SearchBot','SocialBot')
             THEN 'OtherBot' ELSE ua_family0 END AS ua_family,
      CASE WHEN ua_raw IS NULL THEN NULL
           WHEN path1 = '/robots.txt' THEN 'Script' ELSE ua_device_type0 END AS ua_device_type,
      CASE WHEN ua_raw IS NULL THEN NULL
           WHEN path1 = '/robots.txt' THEN 'NonHuman' ELSE ua_human0 END AS ua_human,
      ua_os,
      CAST(strftime(log_ts, '%Y%m%d%H') AS BIGINT) * 100 + (minute(log_ts) // 10) * 10 AS time_window
    FROM g5
  )"""
    raw
  }

  def withParsed(body: String): String = s"WITH$parsedCte\n$body"

  /** signature-table parquet globs (graft.sources.SigTables), pinned at the
    * verify scale — the oracle re-executes the distributed logic (band joins,
    * bit-counts, cosine rescoring) over signatures the engine's own
    * deterministic hash functions produced at synth time
    */
  // derived FROM SigTables' own path functions (single source of truth —
  // a versioned write path must move the read glob with it)
  def docSigsGlob: String = s"${graft.sources.SigTables.docSigsPath(verifySf)}/*.parquet"
  def minhashBandsGlob: String = s"${graft.sources.SigTables.minhashBandsPath(verifySf)}/*.parquet"
  def embSigsGlob: String = s"${graft.sources.SigTables.embSigsPath(verifySf)}/*.parquet"
  def ivfCentroidsGlob: String = s"${graft.sources.SigTables.ivfCentroidsPath(verifySf)}/*.parquet"

  /** the A2 keyed-count unpivot in SQL, generated from the same dim table
    * the engine uses (Aggregates.counterDims) so the two cannot drift
    */
  val keyedLongSql: String = graft.operators.Aggregates.counterDims
    .map { case (d, c) => s"SELECT '$d' AS dim, $c AS key FROM parsed" }
    .mkString(" UNION ALL ")

  /** the A6 12-family metric unpivot + aggregate (shared by a6/a8/r3) */
  val metricRowsSql: String =
    """SELECT conv_id, metric_type, key_value, time_window,
      |  CAST(sum(inc) AS BIGINT) AS metric_value FROM (
      |  SELECT conv_id, 1 AS metric_type, '' AS key_value, time_window, 1 AS inc FROM parsed UNION ALL
      |  SELECT conv_id, 2, '', time_window, bytes_sent FROM parsed UNION ALL
      |  SELECT conv_id, 3, status, time_window, 1 FROM parsed UNION ALL
      |  SELECT conv_id, 5, method, time_window, 1 FROM parsed UNION ALL
      |  SELECT conv_id, 6, referer, time_window, 1 FROM parsed WHERE len(referer) > 0 UNION ALL
      |  SELECT conv_id, 7, path1, time_window, 1 FROM parsed WHERE status LIKE '2%' UNION ALL
      |  SELECT conv_id, 7, path2, time_window, 1 FROM parsed WHERE status LIKE '2%' AND len(path2) > 0 UNION ALL
      |  SELECT conv_id, 7, path3, time_window, 1 FROM parsed WHERE status LIKE '2%' AND len(path3) > 0 UNION ALL
      |  SELECT conv_id, 11, ua_family, time_window, 1 FROM parsed UNION ALL
      |  SELECT conv_id, 12, ua_os, time_window, 1 FROM parsed UNION ALL
      |  SELECT conv_id, 13, ua_device_type, time_window, 1 FROM parsed UNION ALL
      |  SELECT conv_id, 14, ua_human, time_window, 1 FROM parsed UNION ALL
      |  SELECT conv_id, 15, ua_intent, time_window, 1 FROM parsed
      |) GROUP BY 1, 2, 3, 4""".stripMargin

  /** the J2 domain dimension CTEs (shared by j2/r3) — named/dim over parsed */
  val domainDimCtes: String =
    s""", named AS (
       |  SELECT *, CASE WHEN domain = '' THEN '${graft.sources.TranscriptGen.defaultDomain}' ELSE domain END AS domain_name FROM parsed
       |), dim AS (
       |  SELECT domain_name, row_number() OVER (ORDER BY min(conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 12, '0'))) AS domain_id
       |  FROM named GROUP BY domain_name
       |)""".stripMargin

  /** F1 + rule-table sink label (must mirror graft.operators.Route.rules) */
  val sinkExpr: String =
    """CASE WHEN malicious <> 0 THEN 'quarantine'
      |     WHEN malicious = 0 AND (status LIKE '2%' OR status LIKE '5%')
      |          AND ua_device_type IS NOT NULL AND ua_device_type <> 'Script'
      |          AND ua_family NOT IN ('Scanner','SEOBot','Script') THEN 'relevant'
      |     WHEN role = 'tool' OR ua_device_type = 'Script' OR ua_human = 'NonHuman' THEN 'bot_traffic'
      |     ELSE 'archive' END""".stripMargin

  /** language-ID scoring SQL mirroring TextAnalysis.langIdCol */
  val langIdExpr: String = {
    val toks = "list_filter(str_split_regex(lower(text), '[^a-z]+'), x -> len(x) > 0)"
    val scores = TextAnalysis.stopwords.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ",", "]")
      lang -> s"len(list_filter($toks, x -> list_contains($lst, x)))"
    }
    val Seq(en, de, fr, es) = scores.map(_._2)
    s"""CASE WHEN greatest($en,$de,$fr,$es) = 0 THEN 'und'
       |     WHEN $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
       |     WHEN $de >= $fr AND $de >= $es THEN 'de'
       |     WHEN $fr >= $es THEN 'fr'
       |     ELSE 'es' END""".stripMargin
  }
}
