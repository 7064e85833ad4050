package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Table sinks (SURVEY.md §2 R3/R4): the reference's MySQL upsert targets
  * re-expressed as partitioned Parquet tables (Iceberg stand-in, §1.5).
  */
object Sinks {

  /** R3 metrics sink (db/mysqldb.go:144-159): metric rows enriched with the
    * domain surrogate id, key_value truncated to 100 chars like the
    * reference (mysqldb.go:152), written partitioned by metric_type.
    *
    * replace=true ~ ReplaceExistingMetrics: dynamic partition overwrite;
    * replace=false ~ accumulate: in batch the recompute already holds the
    * full sums, so accumulate == append of a complete snapshot (documented
    * divergence — the reference accumulates because it streams).
    */
  def writeMetrics(metricRows: DataFrame, domainDim: DataFrame, outDir: String,
      replace: Boolean = true): Unit = {
    val withDomain = metricRows
      .join(broadcast(domainDim), Seq("conv_id"), "left")
      .withColumn("key_value", substring(col("key_value"), 0, 100))
      .select("domain_id", "conv_id", "metric_type", "key_value", "time_window", "metric_value")
    val writer = withDomain.write
      .mode(if (replace) SaveMode.Overwrite else SaveMode.Append)
      .partitionBy("metric_type")
    writer.parquet(outDir)
  }

  /** R4 raw-log sink (db/mysqldb.go:161-222) — filter F1 upstream; masking
    * and truncation via Route.rawLogProjection.
    */
  def writeRawLogs(parsed: DataFrame, outDir: String, maskIps: Boolean,
      onlyRelevant: Boolean = true, hostId: Int = 0): Unit = {
    val rows = if (onlyRelevant) parsed.filter(Route.isRelevant) else parsed
    Route.rawLogProjection(rows, maskIps, hostId)
      .withColumn("log_date", date_format(col("request_ts"), "yyyyMMdd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("log_date")
      .parquet(outDir)
  }

  /** R2 JSON-lines re-log sink (handlers/writetofile.go:50-90): Go
    * json.Marshal field names, null fields kept (Go emits "UserAgent":null).
    */
  def writeJsonRelog(parsed: DataFrame, outDir: String): Unit =
    Route.goJsonProjection(parsed)
      .write.mode(SaveMode.Overwrite)
      .option("ignoreNullFields", "false")
      .json(outDir)
}
