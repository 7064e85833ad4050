package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.ParsedFields
import graft.parse.LineParser

/** The parse stage: one single-pass, struct-returning UDF (SURVEY.md §2
  * P1-P12). A UDF instead of per-column `regexp_extract` because the built-in
  * would re-run the regex for every projected field (SURVEY.md §4); the UDF
  * runs the winning regex once and derives all ~20 fields in one pass.
  *
  * The UDF is marked non-deterministic ON PURPOSE: it is deterministic in
  * fact, but the flag stops Catalyst from (a) collapsing the struct
  * projection into 20 per-field copies of the UDF and (b) pushing later
  * filters below the parse, both of which would re-evaluate it per field.
  */
object ParseStage {

  private val parseUdf =
    udf((text: String) => LineParser.parseAuto(text)).asNondeterministic()

  val provenanceCols: Seq[String] = Seq("conv_id", "turn_idx", "role", "tool", "ts", "text")

  /** transcripts(conv_id, turn_idx, role, text, tool, ts) → flat parsed DF.
    * Unparseable lines are dropped (the reference counts them as errors and
    * emits nothing, main.go:753-756 / :789).
    */
  def parse(transcripts: DataFrame, keepText: Boolean = true): DataFrame = {
    val withP = transcripts
      .select((provenanceCols.map(col) :+ parseUdf(col("text")).as("p")): _*)
      .filter(col("p").isNotNull)
    val flat = withP.select(
      col("conv_id"), col("turn_idx"), col("role"), col("tool"), col("ts"), col("text"),
      col("p.domain").as("domain"),
      col("p.client_ip").as("client_ip"),
      col("p.remote_logname").as("remote_logname"),
      col("p.remote_user").as("remote_user"),
      col("p.log_ts").as("log_ts"),
      col("p.tz_offset_sec").as("tz_offset_sec"),
      col("p.method").as("method"),
      col("p.path").as("path"),
      col("p.path1").as("path1"),
      col("p.path2").as("path2"),
      col("p.path3").as("path3"),
      col("p.protocol").as("protocol"),
      col("p.status").as("status"),
      col("p.bytes_sent").as("bytes_sent"),
      col("p.referer").as("referer"),
      col("p.ua.ua_full").as("ua_full"),
      col("p.ua.ua_os").as("ua_os"),
      col("p.ua.ua_family").as("ua_family"),
      col("p.ua.ua_device_type").as("ua_device_type"),
      col("p.ua.ua_human").as("ua_human"),
      col("p.ua.ua_intent").as("ua_intent"),
      col("p.malicious").as("malicious"),
      col("p.format").as("format"))
    if (keepText) flat else flat.drop("text")
  }

  /** Event-time window as int64 yyyyMMddHHmm, minute floored to the window
    * size, computed in the event's own UTC offset — exact integer semantics
    * of metricgenerator.go:131-158. Null timestamp → the Go zero-time window.
    */
  def timeWindowCol(logTs: Column, tzOffsetSec: Column, windowMinutes: Int = 10): Column = {
    require(Set(1, 5, 10, 15, 30, 60).contains(windowMinutes), s"bad window $windowMinutes")
    // shift the instant by its offset, then format in UTC = local-time fields
    val local = expr("timestampadd(SECOND, tz_offset_sec, log_ts)")
    val minuteFloored =
      if (windowMinutes == 60) lit(0L)
      else (minute(local) - (minute(local) % windowMinutes)).cast("long")
    coalesce(
      date_format(local, "yyyyMMddHH").cast("long") * 100L + minuteFloored,
      lit(101010000L)) // Go zero time "0001010100"+"00" (error ignored at httpservers.go:175)
  }
}
