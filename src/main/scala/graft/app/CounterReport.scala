package graft.app

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R6 counter stdout report (handlers/counter.go:326-445): the formatted
  * text report with totals, (+delta) between reporting windows (A3 — the
  * CounterValue.PreviousValue snapshot, counter.go:49-56), per-dimension
  * sections sorted by count desc (A5), top-N shrink applied per keyed
  * dimension (A4), empty keys rendered "-not set-", label width clamped
  * 10..15 (counter.go:395-445).
  *
  * Report layer: operates on collected aggregate rows (tiny), not a Spark
  * operator.
  */
object CounterReport {

  final case class Snapshot(
      totals: Map[String, Long],
      keyed: Map[String, Map[String, Long]])

  /** collect a snapshot from a parsed DF (two small jobs) */
  def snapshot(parsed: DataFrame): Snapshot = {
    val t = graft.operators.Aggregates.totals(parsed).collect()(0)
    val totals = Map(
      "Total log lines" -> t.getLong(0),
      "Total requests" -> t.getLong(1),
      "Total bytes sent" -> t.getLong(2),
      "Requests by humans" -> t.getLong(3),
      "Requests by non-humans" -> t.getLong(4),
      "Malicious requests" -> t.getLong(5))
    val keyed = graft.operators.Aggregates.keyedCounts(parsed).collect()
      .groupBy(_.getString(0))
      .map { case (dim, rows) =>
        dim -> rows.map(r => Option(r.getString(1)).getOrElse("") -> r.getLong(2)).toMap
      }
    Snapshot(totals, keyed)
  }

  /** fold two snapshots (streaming ticks accumulate micro-batches) */
  def merge(a: Snapshot, b: Snapshot): Snapshot = Snapshot(
    totals = (a.totals.keySet ++ b.totals.keySet).iterator
      .map(k => k -> (a.totals.getOrElse(k, 0L) + b.totals.getOrElse(k, 0L))).toMap,
    keyed = (a.keyed.keySet ++ b.keyed.keySet).iterator.map { d =>
      val ma = a.keyed.getOrElse(d, Map.empty[String, Long])
      val mb = b.keyed.getOrElse(d, Map.empty[String, Long])
      d -> (ma.keySet ++ mb.keySet).iterator
        .map(k => k -> (ma.getOrElse(k, 0L) + mb.getOrElse(k, 0L))).toMap
    }.toMap)

  private def clampLabel(s: String): String = {
    val shown = if (s.isEmpty) "-not set-" else s
    val w = math.max(10, math.min(15, shown.length))
    if (shown.length > 15) shown.take(15) else shown.padTo(w, ' ')
  }

  /** top-N by count with deterministic tie-break (key asc) — documented
    * divergence from the reference's Go-map-iteration ties (A4)
    */
  def topN(m: Map[String, Long], n: Int): Seq[(String, Long)] =
    m.toSeq.sortBy { case (k, v) => (-v, k) }.take(n)

  def format(cur: Snapshot, prev: Option[Snapshot], topNSize: Int = 10,
      nowUtc: String = ""): String = {
    val sb = new StringBuilder
    sb.append(s"---------$nowUtc---------\n")
    val totalOrder = Seq("Total log lines", "Total requests", "Total bytes sent",
      "Requests by humans", "Requests by non-humans", "Malicious requests")
    totalOrder.foreach { k =>
      val v = cur.totals(k)
      prev match {
        case Some(p) =>
          val d = v - p.totals.getOrElse(k, 0L)
          sb.append(f"$k%-22s: $v%d (${if (d >= 0) "+" else ""}$d%d)\n")
        case None =>
          sb.append(f"$k%-22s: $v%d\n")
      }
    }
    val dimOrder = Seq("status", "method", "client_ip", "ua_family", "os_family",
      "device_type", "intent", "referer", "path")
    dimOrder.foreach { dim =>
      cur.keyed.get(dim).foreach { m =>
        sb.append(s"--- $dim (top $topNSize) ---\n")
        topN(m, topNSize).foreach { case (k, v) =>
          val d = prev.flatMap(_.keyed.get(dim)).map(pm => v - pm.getOrElse(k, 0L))
          val delta = d.map(x => s" (${if (x >= 0) "+" else ""}$x)").getOrElse("")
          sb.append(s"${clampLabel(k)} : $v$delta\n")
        }
      }
    }
    sb.toString
  }
}
