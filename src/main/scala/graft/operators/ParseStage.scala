package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{ParsedTurn, TranscriptTurn}
import graft.parse.LineParser

/** The parse stage: one single-pass struct parse per row (SURVEY.md §2
  * P1-P12), as a typed mapPartitions over Dataset[TranscriptTurn].
  *
  * Why not per-column `regexp_extract`: the built-in re-runs the regex for
  * every projected field (SURVEY.md §4). Why not a struct-returning Catalyst
  * UDF: measured both ways —
  *  - deterministic UDF: CollapseProject / predicate pushdown can inline the
  *    alias and re-evaluate the UDF per reference;
  *  - `asNondeterministic()` UDF: single evaluation, but any stage fused with
  *    a Nondeterministic expression loses whole-stage codegen, which made the
  *    downstream explode+aggregate pipeline ~12x slower (4s → 46s at sf0.1).
  * The object-level mapPartitions guarantees exactly-once per-row parsing,
  * keeps every operator above the serialization boundary codegen'd, and the
  * encoder's serializer is itself code-generated.
  */
object ParseStage {

  val provenanceCols: Seq[String] = Seq("conv_id", "turn_idx", "role", "tool", "ts", "text")

  /** transcripts(conv_id, turn_idx, role, text, tool, ts) → flat parsed DF.
    * Unparseable lines are dropped (the reference counts them as errors and
    * emits nothing, main.go:753-756 / :789).
    */
  def parse(transcripts: DataFrame, keepText: Boolean = true): DataFrame = {
    val spark = transcripts.sparkSession
    import spark.implicits._
    val flat = transcripts
      .select(provenanceCols.head, provenanceCols.tail: _*)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"))
      .as[TranscriptTurn]
      .mapPartitions(_.flatMap(t => LineParser.parseAuto(t.text).map(p => ParsedTurn(t, p))))
      .toDF()
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
