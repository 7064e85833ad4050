package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.MetricRow
import graft.oracle.RefOracle

/** Distributed implementation of the reference's EXACT arrival-order metric
  * semantics (metrics/SBOMetrics.go addValue/doTimeWindowTracking including
  * the bounded-window eviction and silent late-drop) — for inputs where
  * stragglers DO cross the eviction horizon and the order-insensitive batch
  * aggregation (Aggregates.metricRows) would legitimately differ.
  *
  * Scale path: secondary sort. Repartition by conv_id (one conversation =
  * one reference "file" = one state machine), sort within partitions by
  * (conv_id, turn_idx), then run the per-conversation state machine
  * streaming over each partition — no per-group materialization, state is
  * O(keys x windowSize) per live conversation, exactly like the reference.
  *
  * Hot-conversation skew note: a conversation must live in one partition
  * (its state is sequential by definition — same as the reference's one
  * consumer goroutine per file). Many conversations hash across partitions;
  * the salted fan-out used elsewhere cannot apply here.
  */
object MetricsArrivalOrder {

  def metricRows(parsed: DataFrame, windowMinutes: Int = 10,
      metricsWindowSize: Int = 3, partitions: Int = 32): Dataset[MetricRow] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed
      .select(col("conv_id"), col("turn_idx"), col("log_ts"), col("tz_offset_sec"),
        col("status"), col("method"), col("referer"), col("path1"), col("path2"),
        col("path3"), col("bytes_sent"), col("ua_family"), col("ua_os"),
        col("ua_device_type"), col("ua_human"), col("ua_intent"))
      .repartition(partitions, col("conv_id"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .mapPartitions { rows =>
        new Iterator[MetricRow] {
          private var cur: String = null
          private var state: RefOracle.MetricState = _
          private val out = scala.collection.mutable.Queue.empty[MetricRow]

          private def flush(): Unit = if (cur != null) {
            val grouped = state.allRows()
              .groupBy { case (mt, k, tw, _) => (mt, k, tw) }
              .map { case ((mt, k, tw), rs) => MetricRow(cur, mt, k, tw, rs.map(_._4).sum) }
            out ++= grouped
          }

          private def step(): Unit = {
            while (out.isEmpty && rows.hasNext) {
              val r = rows.next()
              val conv = r.getString(0)
              if (conv != cur) {
                flush()
                cur = conv
                state = new RefOracle.MetricState(metricsWindowSize)
              }
              val p = graft.model.ParsedFields(
                domain = "", client_ip = "", remote_logname = "", remote_user = "",
                log_ts = Option(r.getTimestamp(2)), tz_offset_sec = r.getInt(3),
                method = r.getString(5), path = "", path1 = r.getString(7),
                path2 = r.getString(8), path3 = r.getString(9), protocol = "",
                status = r.getString(4), bytes_sent = r.getLong(10),
                referer = r.getString(6),
                ua = Option(r.getString(11)).map(f => graft.model.UaInfo("", r.getString(12), f, r.getString(13), r.getString(14), r.getString(15))),
                malicious = 0, format = "")
              RefOracle.handleMetrics(state, p, windowMinutes)
            }
            if (out.isEmpty && !rows.hasNext) { flush(); cur = null }
          }

          override def hasNext: Boolean = { if (out.isEmpty) step(); out.nonEmpty }
          override def next(): MetricRow = { if (out.isEmpty) step(); out.dequeue() }
        }
      }
  }
}
