package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{ParseStage, Route}
import graft.sources.Tables

/** Dev decomposition bench (opt guide §1.4): isolates the stages of the
  * frozen scaling job (Bench.pipelineE2E) at chosen core counts with the
  * noop sink, so the non-scaling fraction can be attributed. Does NOT
  * replace any Bench entry — cited from OPTIMIZATION_r06.md only.
  *
  * `runMain graft.BenchExtra [sfName] [cores,cores,...] [runs]`
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfName = if (args.length > 0) args(0) else "sf4"
    val cores = (if (args.length > 1) args(1) else "8,32").split(",").map(_.toInt)
    val runs = if (args.length > 2) args(2).toInt else 3
    val dir = s"/root/testdata/$sfName"

    // materialize the table once
    { val s = session(32); Tables.transcripts(s, dir).count(); s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession() }

    cores.foreach { n =>
      val s = session(n)
      try {
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val stages: Seq[(String, () => Unit)] = Seq(
          "scan_only(noop)" -> (() => noop(Tables.transcripts(s, dir))),
          "scan_text_count" -> (() => { Tables.transcripts(s, dir).select("text")
            .agg(sum(length(col("text")))).head(); () }),
          "parse(noop)" -> (() => noop(ParseStage.parse(Tables.transcripts(s, dir)))),
          "parse_count" -> (() => { ParseStage.parse(Tables.transcripts(s, dir)).count(); () }),
          "e2e(groupBy count)" -> (() => {
            val parsed = ParseStage.parse(Tables.transcripts(s, dir))
            Route.withSink(parsed)
              .groupBy(col("sink"), col("role"),
                ParseStage.timeWindowCol(col("log_ts"), col("tz_offset_sec")).as("w"))
              .agg(count(lit(1)), sum(col("bytes_sent")))
              .count(); () }))
        stages.foreach { case (label, f) =>
          s.sparkContext.setJobDescription(s"benchextra $label @$n")
          val ts = (1 to runs).map(_ => time(f()))
          println(f"[extra] cores=$n%-2d $label%-20s min=${ts.min}%7.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
        }
      } finally {
        s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }
  }
}
