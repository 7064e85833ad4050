package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Enrichment joins (SURVEY.md §2 J1/J2): the reference's grow-on-first-sight
  * dimension lookup (db/mysqldb.go:91-121 GetDomainId) re-expressed as a
  * broadcast hash join against a dimension built in one pass. Surrogate ids
  * are assigned by FIRST APPEARANCE in stable (conv_id, turn_idx) order —
  * deterministic, unlike insertion order under concurrency in the reference.
  *
  * The dimensions are tiny (roles, tools, domains), so `broadcast()` keeps
  * every join shuffle-free on the fact side — at 100 TB this is the only
  * sane plan, and Catalyst is told so explicitly.
  */
object Enrich {

  /** first-sight surrogate-id dimension over one column. */
  def dimension(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val firstSeen = df
      .groupBy(col(keyCol))
      .agg(min(concat_ws("#", col("conv_id"), lpad(col("turn_idx").cast("string"), 12, "0"))).as("first_seen"))
    firstSeen
      .withColumn(idCol, row_number().over(Window.orderBy(col("first_seen"))))
      .drop("first_seen")
  }

  /** J2 + J1: per-row domain = parsed vhost domain if non-empty else the
    * configured default (main.go:666-669), then surrogate id via broadcast.
    */
  def withDomainId(parsed: DataFrame, defaultDomain: String = graft.sources.TranscriptGen.defaultDomain): DataFrame = {
    val withName = parsed.withColumn(
      "domain_name", coalesce(nullif(col("domain"), lit("")), lit(defaultDomain)))
    val dim = dimension(withName, "domain_name", "domain_id")
    withName.join(broadcast(dim), Seq("domain_name"), "left")
  }

  /** role + tool enrichment (the north-star lookup dims). */
  def withRoleToolIds(parsed: DataFrame): DataFrame = {
    val roleDim = dimension(parsed, "role", "role_id")
    val toolDim = dimension(parsed, "tool", "tool_id")
    parsed
      .join(broadcast(roleDim), Seq("role"), "left")
      .join(broadcast(toolDim), Seq("tool"), "left")
  }
}
