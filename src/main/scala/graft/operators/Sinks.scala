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
    * replace=true ~ ReplaceExistingMetrics (ON DUPLICATE KEY UPDATE ... =
    * VALUES(...)): the new snapshot wins — plain overwrite.
    *
    * replace=false ~ accumulate (mysqldb.go:147-151: metric_value =
    * metric_value + VALUES(metric_value)): a READ-MERGE-WRITE — union the
    * existing table with the new rows, re-sum per key, stage the merged
    * table next to the target, then swap via FileSystem.rename. Two
    * incremental runs over overlapping windows therefore SUM per key
    * instead of duplicating rows (the r2 VERDICT gap). On a real cluster
    * this is the MERGE INTO of an Iceberg metrics table. Plain parquet has
    * no atomic swap, so the commit is a THREE-step rename dance: target →
    * backup, staging → target, drop backup. Each rename is atomic on
    * HDFS-like filesystems, and a crash between any two steps leaves a
    * complete copy of the table on disk; nothing is deleted until the new
    * table is in place, and the next writeMetrics call auto-recovers a
    * `._backup` orphaned by a mid-swap crash before reading or writing
    * anything.
    */
  /** the sink's row shape: domain-id broadcast join + key truncation */
  def withDomainRows(metricRows: DataFrame, domainDim: DataFrame): DataFrame =
    metricRows
      .join(broadcast(domainDim), Seq("conv_id"), "left")
      .withColumn("key_value", substring(col("key_value"), 0, 100))
      .select("domain_id", "conv_id", "metric_type", "key_value", "time_window", "metric_value")

  def writeMetrics(metricRows: DataFrame, domainDim: DataFrame, outDir: String,
      replace: Boolean = true): Unit = {
    val spark = metricRows.sparkSession
    val withDomain = withDomainRows(metricRows, domainDim)
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(outDir)
    val fs = target.getFileSystem(hconf)
    // crash recovery: a ._backup with no committed target means a previous
    // accumulate died between its two renames — restore the old table
    // FIRST, otherwise an accumulate run would treat the sink as empty and
    // silently drop everything the backup holds
    val recoverBackup = new org.apache.hadoop.fs.Path(outDir + "._backup")
    if (!fs.exists(new org.apache.hadoop.fs.Path(outDir, "_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(recoverBackup, "_SUCCESS"))) {
      if (fs.exists(target)) fs.delete(target, true) // partial swap leftovers
      if (!fs.rename(recoverBackup, target))
        throw new java.io.IOException(s"backup recovery failed: $recoverBackup -> $target")
    }
    if (replace || !fs.exists(new org.apache.hadoop.fs.Path(outDir, "_SUCCESS"))) {
      withDomain.write.mode(SaveMode.Overwrite).partitionBy("metric_type").parquet(outDir)
    } else {
      val keys = Seq("domain_id", "conv_id", "metric_type", "key_value", "time_window")
      val merged = spark.read.parquet(outDir)
        .unionByName(withDomain)
        .groupBy(keys.map(col): _*)
        .agg(sum(col("metric_value")).as("metric_value"))
        .select("domain_id", "conv_id", "metric_type", "key_value", "time_window", "metric_value")
      val staging = new org.apache.hadoop.fs.Path(outDir + "._staging")
      val backup = new org.apache.hadoop.fs.Path(outDir + "._backup")
      merged.write.mode(SaveMode.Overwrite).partitionBy("metric_type").parquet(staging.toString)
      if (fs.exists(backup)) fs.delete(backup, true) // stale leftover from a crash
      if (!fs.rename(target, backup))
        throw new java.io.IOException(s"accumulate swap failed: $target -> $backup")
      if (!fs.rename(staging, target)) {
        fs.rename(backup, target) // restore — the old table is still whole
        throw new java.io.IOException(s"accumulate swap failed: $staging -> $target")
      }
      fs.delete(backup, true)
    }
  }

  /** Catalog-table (DataFrameWriterV2) face of the metrics sink: same rows,
    * written with `writeTo(table).partitionedBy(metric_type)` against the
    * session catalog — the API an Iceberg deployment uses verbatim (swap the
    * catalog, keep the call). replace=false merges like writeMetrics, via
    * the catalog table instead of a path.
    */
  def writeMetricsTable(metricRows: DataFrame, domainDim: DataFrame, table: String,
      replace: Boolean = true): Unit = {
    val spark = metricRows.sparkSession
    val rows = withDomainRows(metricRows, domainDim)
    val merged =
      if (replace || !spark.catalog.tableExists(table)) rows
      else {
        val keys = Seq("domain_id", "conv_id", "metric_type", "key_value", "time_window")
        // materialize the merge before the createOrReplace drops the source
        val m = spark.table(table)
          .unionByName(rows)
          .groupBy(keys.map(col): _*)
          .agg(sum(col("metric_value")).as("metric_value"))
          .select("domain_id", "conv_id", "metric_type", "key_value", "time_window", "metric_value")
          .localCheckpoint()
        m
      }
    // REPLACE TABLE AS SELECT needs a v2 catalog (Iceberg has it; the
    // built-in session catalog does not) — drop+create is the v1-compatible
    // spelling of createOrReplace, same V2 writer API for the write itself
    if (spark.catalog.tableExists(table)) spark.sql(s"DROP TABLE $table")
    merged.writeTo(table).using("parquet")
      .partitionedBy(col("metric_type"))
      .create()
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
