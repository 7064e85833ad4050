package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.{Tables, TranscriptGen}

/** Job configuration — the reference's ConfigForAMonitoredFile
  * (main.go:1015-1068) reduced to the knobs that are actually live there
  * (SURVEY.md §1.3.4; `Enabled` and `SkipIfLineMatchesRegex` are parsed but
  * never applied in the reference, so they are deliberately absent here).
  */
final case class JobConfig(
    handlers: Seq[String] = Seq("COUNTER", "METRICS", "WRITE_TO_FILE"),
    domainName: String = TranscriptGen.defaultDomain, // J2 fallback
    hostId: Int = 0, // sbo_rawlogs host_id (mysqldb.go:162-165)
    timeWindowSizeMinutes: Int = 10, // A7 (metricgenerator.go:131-158)
    metricsWindowSize: Int = 3, // A8 state width 2-10 (main.go:388-397)
    replaceExistingMetrics: Boolean = true, // R3 upsert mode
    saveLogsToDbOnlyRelevant: Boolean = true, // F1 (main.go:768-779)
    saveLogsToDbMaskIps: Boolean = false, // R4 masking
    counterTopNForKeyedMetrics: Int = 10, // A4
    startFrom: Int = 0, // S3: 0=begin, -1=end, N=skip first N turns per conv
    arrivalOrderMetrics: Boolean = false) // exact A8 semantics vs batch sums

object JobConfig {
  /** tiny flat-JSON loader (no external deps): {"key": value, ...}.
    * Fields absent from the JSON fall back to `base` — the per-field
    * presence semantics the reference tracks via its `*_ok` flags
    * (main.go:405-475): present-but-empty stays empty, absent inherits.
    */
  def fromJson(json: String, base: JobConfig = JobConfig()): JobConfig = {
    def str(k: String): Option[String] =
      ("\"" + k + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(json).map(_.group(1))
    def num(k: String): Option[Int] =
      ("\"" + k + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(json).map(_.group(1).toInt)
    def bool(k: String): Option[Boolean] =
      ("\"" + k + "\"\\s*:\\s*(true|false)").r.findFirstMatchIn(json).map(_.group(1).toBoolean)
    def arr(k: String): Option[Seq[String]] =
      ("\"" + k + "\"\\s*:\\s*\\[([^\\]]*)\\]").r.findFirstMatchIn(json)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq)
    JobConfig(
      handlers = arr("Handlers").getOrElse(base.handlers),
      domainName = str("DomainName").getOrElse(base.domainName),
      hostId = num("HostId").getOrElse(base.hostId),
      timeWindowSizeMinutes = num("TimeWindowSizeMinutes").getOrElse(base.timeWindowSizeMinutes),
      metricsWindowSize = num("MetricsWindowSize").getOrElse(base.metricsWindowSize),
      replaceExistingMetrics = bool("ReplaceExistingMetrics").getOrElse(base.replaceExistingMetrics),
      saveLogsToDbOnlyRelevant = bool("SaveLogsToDbOnlyRelevant").getOrElse(base.saveLogsToDbOnlyRelevant),
      saveLogsToDbMaskIps = bool("SaveLogsToDbMaskIPs").getOrElse(base.saveLogsToDbMaskIps),
      counterTopNForKeyedMetrics = num("CounterTopNForKeyedMetrics").getOrElse(base.counterTopNForKeyedMetrics),
      startFrom = num("StartFrom").getOrElse(base.startFrom),
      arrivalOrderMetrics = bool("ArrivalOrderMetrics").getOrElse(base.arrivalOrderMetrics))
  }
}

/** The reference's multi-source config map (main.go:405-570): a JSON object
  * of {sourcePath → per-source config}. The `--default--` entry supplies the
  * value of every field a per-source entry does not explicitly set; the
  * `--OS-metrics--` entry configures the metrics sampler and is not a
  * source. Here a "source" is a transcripts table dir; multi-source = one
  * Pipeline.run per entry (union-of-DataFrames is the cluster-side shape).
  */
object MultiJobConfig {
  val DefaultKey = "--default--"
  val OsMetricsKey = "--OS-metrics--"

  /** split a top-level JSON object into (key, rawValue) pairs — a tiny
    * depth/string-aware scanner, no external JSON dependency
    */
  private[app] def topLevelEntries(json: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var i = json.indexOf('{') + 1
    def skipWs(): Unit = while (i < json.length && json.charAt(i).isWhitespace) i += 1
    def readString(): String = { // at opening quote
      val sb = new StringBuilder
      i += 1
      while (i < json.length && json.charAt(i) != '"') {
        if (json.charAt(i) == '\\' && i + 1 < json.length) { sb.append(json.charAt(i + 1)); i += 2 }
        else { sb.append(json.charAt(i)); i += 1 }
      }
      i += 1
      sb.toString
    }
    if (i == 0) return Seq.empty
    while (i < json.length) {
      skipWs()
      if (i >= json.length || json.charAt(i) == '}') return out.result()
      if (json.charAt(i) == ',') { i += 1 }
      else if (json.charAt(i) == '"') {
        val key = readString()
        skipWs()
        if (i < json.length && json.charAt(i) == ':') i += 1
        skipWs()
        val start = i
        var depth = 0
        var done = false
        while (i < json.length && !done) {
          json.charAt(i) match {
            case '"' => readString(); i -= 1
            case '{' | '[' => depth += 1
            case '}' | ']' =>
              if (depth == 0) done = true else depth -= 1
            case ',' if depth == 0 => done = true
            case _ =>
          }
          if (!done) i += 1
        }
        out += ((key, json.substring(start, i)))
      } else i += 1
    }
    out.result()
  }

  /** source dir → merged config (default-filled), in declaration order */
  def fromJson(json: String): Seq[(String, JobConfig)] = {
    val entries = topLevelEntries(json)
    val default = entries.collectFirst { case (DefaultKey, body) => JobConfig.fromJson(body) }
      .getOrElse(JobConfig())
    entries.collect {
      case (k, body) if k != DefaultKey && k != OsMetricsKey =>
        k -> JobConfig.fromJson(body, default)
    }
  }

  /** the `--OS-metrics--` sampler config (main.go:545-570): not a source —
    * its live fields (HostId for the emitted sample, the handler list) apply
    * to the job-metrics emission. Default-merged like any source entry.
    */
  def osMetricsConfig(json: String): Option[JobConfig] = {
    val entries = topLevelEntries(json)
    val default = entries.collectFirst { case (DefaultKey, body) => JobConfig.fromJson(body) }
      .getOrElse(JobConfig())
    entries.collectFirst { case (OsMetricsKey, body) => JobConfig.fromJson(body, default) }
  }

  /** A config is the multi-source map iff every top-level value is itself an
    * object — structural, like the reference's {filePath → config} shape —
    * not a substring heuristic (a flat config whose string values merely
    * mention --default-- must not be misrouted, and a map WITHOUT a
    * --default-- entry is still a valid map, main.go:405-475).
    */
  def isMultiSource(json: String): Boolean = {
    val entries = topLevelEntries(json)
    entries.nonEmpty && entries.forall(_._2.trim.startsWith("{"))
  }
}

/** The whole engine as one runnable pipeline: transcripts in, sinks out —
  * what `spark-submit --class graft.app.Pipeline` runs on a cluster.
  * Handler set mirrors the reference's R1 registry (main.go:576-600):
  * COUNTER → stdout report; METRICS → metrics table; WRITE_TO_FILE → JSON
  * re-log; plus the routed raw-log table (main.go:761-784) and the
  * lineage-manifested multi-sink fan-out.
  */
object Pipeline {

  final case class Result(manifest: String, report: String, rows: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String, cfg: JobConfig = JobConfig(),
      osCfg: Option[JobConfig] = None): Result = {
    val transcripts0 = Tables.transcripts(spark, sfDir)
    // S3 start offset (main.go:926-978): per-conversation analog
    val transcripts = cfg.startFrom match {
      case 0 => transcripts0
      case -1 => transcripts0.filter(lit(false)) // seek-to-end: nothing historical
      case n => transcripts0.filter(col("turn_idx") >= n)
    }
    val parsed = ParseStage.parse(transcripts)
    val routed = Route.withSink(parsed)

    // fan-out with lineage (idempotent resume)
    val manifest = Route.fanOutWithLineage(routed, s"$outDir/routed", partitions = 32)

    var report = ""
    if (cfg.handlers.contains("COUNTER")) {
      report = CounterReport.format(CounterReport.snapshot(parsed), None,
        cfg.counterTopNForKeyedMetrics)
    }
    if (cfg.handlers.contains("METRICS")) {
      val metricRows: DataFrame =
        if (cfg.arrivalOrderMetrics)
          MetricsArrivalOrder.metricRows(parsed, cfg.timeWindowSizeMinutes, cfg.metricsWindowSize).toDF()
        else Aggregates.metricRows(parsed, cfg.timeWindowSizeMinutes)
      val domainDim = Enrich.withDomainId(parsed, cfg.domainName)
        .select("conv_id", "domain_id").distinct()
      Sinks.writeMetrics(metricRows, domainDim, s"$outDir/metrics", cfg.replaceExistingMetrics)
    }
    if (cfg.handlers.contains("WRITE_TO_FILE")) {
      Sinks.writeJsonRelog(parsed, s"$outDir/relog")
    }
    Sinks.writeRawLogs(parsed, s"$outDir/rawlogs", cfg.saveLogsToDbMaskIps,
      cfg.saveLogsToDbOnlyRelevant, cfg.hostId)

    val rows = parsed.count()

    // S5 analog: job-metrics snapshot next to the lineage manifest — rows
    // processed plus a best-effort host sample through the reference's
    // uptime/free parsers (os_metrics.go; scheduler main.go:102-202).
    // The sample is stamped with the --OS-metrics-- entry's HostId when the
    // multi-source config carries one (ADVICE r2: previously parsed and
    // discarded), falling back to the source config's host id.
    val (up, mem) = graft.metrics.OsMetrics.liveSnapshot()
    val jm = s"""{"rows":$rows,"host_id":${osCfg.getOrElse(cfg).hostId}""" +
      up.map(u => s""","up_minutes":${u.upDurationMinutes},"load1":"${u.load1}"""").getOrElse("") +
      mem.map(m => s""","mem_use":${m.memUse},"mem_available":${m.memAvailable}""").getOrElse("") +
      "}"
    val mp = java.nio.file.Paths.get(outDir, "_metrics", "job_metrics.json")
    java.nio.file.Files.createDirectories(mp.getParent)
    java.nio.file.Files.writeString(mp, jm)

    Result(manifest, report, rows)
  }

  /** spark-submit entry: args = sfDir outDir [configJsonPath]. A config is
    * treated as the reference's multi-source map when EVERY top-level value
    * is itself a JSON object (structural {sourcePath → config} detection —
    * see MultiJobConfig.isMultiSource; a `--default--` entry is optional):
    * each non-special key is a source dir run with its merged config
    * (outputs land under outDir/<sanitized full path>).
    */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-pipeline"
    val rawCfg = if (args.length > 2)
      Some(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(2)))))
    else None
    val multi = rawCfg.filter(MultiJobConfig.isMultiSource)
    val cfg = if (multi.isEmpty) rawCfg.map(JobConfig.fromJson(_)).getOrElse(JobConfig())
    else JobConfig()
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    multi match {
      case Some(json) =>
        val osCfg = MultiJobConfig.osMetricsConfig(json)
        MultiJobConfig.fromJson(json).foreach { case (srcDir, c) =>
          // key the output on the sanitized FULL path: two sources sharing a
          // basename (/a/logs, /b/logs) must not overwrite each other
          val name = srcDir.replaceAll("[^A-Za-z0-9._-]+", "_").dropWhile(_ == '_')
          val r = run(spark, srcDir, s"$outDir/$name", c, osCfg)
          println(r.report)
          println(s"[pipeline] source=$srcDir rows=${r.rows}")
        }
      case None =>
        val r = run(spark, sfDir, outDir, cfg)
        println(r.report)
        println(s"[pipeline] rows=${r.rows} manifest=${r.manifest.take(200)}...")
    }
    spark.stop()
  }
}
