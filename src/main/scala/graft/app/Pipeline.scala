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
    timeWindowSizeMinutes: Int = 10, // A7 (metricgenerator.go:131-158)
    metricsWindowSize: Int = 3, // A8 state width 2-10 (main.go:388-397)
    replaceExistingMetrics: Boolean = true, // R3 upsert mode
    saveLogsToDbOnlyRelevant: Boolean = true, // F1 (main.go:768-779)
    saveLogsToDbMaskIps: Boolean = false, // R4 masking
    counterTopNForKeyedMetrics: Int = 10, // A4
    startFrom: Int = 0, // S3: 0=begin, -1=end, N=skip first N turns per conv
    arrivalOrderMetrics: Boolean = false) // exact A8 semantics vs batch sums

object JobConfig {
  /** tiny flat-JSON loader (no external deps): {"key": value, ...} */
  def fromJson(json: String): JobConfig = {
    def str(k: String): Option[String] =
      ("\"" + k + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(json).map(_.group(1))
    def num(k: String): Option[Int] =
      ("\"" + k + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(json).map(_.group(1).toInt)
    def bool(k: String): Option[Boolean] =
      ("\"" + k + "\"\\s*:\\s*(true|false)").r.findFirstMatchIn(json).map(_.group(1).toBoolean)
    def arr(k: String): Option[Seq[String]] =
      ("\"" + k + "\"\\s*:\\s*\\[([^\\]]*)\\]").r.findFirstMatchIn(json)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq)
    val d = JobConfig()
    JobConfig(
      handlers = arr("Handlers").getOrElse(d.handlers),
      domainName = str("DomainName").getOrElse(d.domainName),
      timeWindowSizeMinutes = num("TimeWindowSizeMinutes").getOrElse(d.timeWindowSizeMinutes),
      metricsWindowSize = num("MetricsWindowSize").getOrElse(d.metricsWindowSize),
      replaceExistingMetrics = bool("ReplaceExistingMetrics").getOrElse(d.replaceExistingMetrics),
      saveLogsToDbOnlyRelevant = bool("SaveLogsToDbOnlyRelevant").getOrElse(d.saveLogsToDbOnlyRelevant),
      saveLogsToDbMaskIps = bool("SaveLogsToDbMaskIPs").getOrElse(d.saveLogsToDbMaskIps),
      counterTopNForKeyedMetrics = num("CounterTopNForKeyedMetrics").getOrElse(d.counterTopNForKeyedMetrics),
      startFrom = num("StartFrom").getOrElse(d.startFrom),
      arrivalOrderMetrics = bool("ArrivalOrderMetrics").getOrElse(d.arrivalOrderMetrics))
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

  def run(spark: SparkSession, sfDir: String, outDir: String, cfg: JobConfig = JobConfig()): Result = {
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
      cfg.saveLogsToDbOnlyRelevant)

    Result(manifest, report, parsed.count())
  }

  /** spark-submit entry: args = sfDir outDir [configJsonPath] */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-pipeline"
    val cfg = if (args.length > 2)
      JobConfig.fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(2)))))
    else JobConfig()
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, sfDir, outDir, cfg)
    println(r.report)
    println(s"[pipeline] rows=${r.rows} manifest=${r.manifest.take(200)}...")
    spark.stop()
  }
}
