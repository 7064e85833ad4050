package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment joins (SURVEY.md §2 J1/J2): the reference's grow-on-first-sight
  * dimension lookup (db/mysqldb.go:91-121 GetDomainId) re-expressed as a
  * broadcast hash join against a dimension built in one aggregation pass.
  * Surrogate ids are assigned by FIRST APPEARANCE in stable (conv_id,
  * turn_idx) order — deterministic, unlike insertion order under concurrency
  * in the reference.
  *
  * The dimensions are tiny (roles, tools, domains), so they are aggregated
  * distributively (min first-seen key per value — map-side combine, one
  * shuffle of #distinct rows), collected, numbered on the driver, and
  * broadcast — the fact side never shuffles. At 100 TB this is the only
  * sane plan, and Catalyst is told so explicitly via `broadcast()`.
  */
object Enrich {

  /** stable first-appearance ordering key: a (conv_id, turn_idx) struct —
    * struct min orders field-by-field, which matches the lexicographic order
    * the zero-padded "conv#turn" string gave, without allocating a
    * concatenated string per fact row inside the aggregation.
    *
    * Equivalence caveat (ADVICE r3): the two orders agree only while no
    * conv_id is a strict prefix of another whose next character sorts below
    * '#' (e.g. "a" vs "a!") — for such ids the struct order and the
    * concatenated order disagree and first-sight ranks would shift. Every
    * conv id this engine generates or ingests is alphanumeric ("conv" +
    * digits), where the orders coincide; asserted in EnrichSpec.
    */
  private def firstKey: Column = struct(col("conv_id"), col("turn_idx"))

  /** Build several first-sight dimensions in ONE pass over the fact table:
    * unpivot the requested columns, aggregate min(first-seen) per (dim, key),
    * collect (tiny), assign row-number ids per dim on the driver.
    * Returns dim name → Seq[(key, id)].
    */
  def firstSightDims(df: DataFrame, dims: Seq[String]): Map[String, Seq[(String, Int)]] = {
    val entries = dims.map(c => struct(lit(c).as("dim"), col(c).cast("string").as("key")))
    val rows = df
      .select(explode(array(entries: _*)).as("e"), firstKey.as("fk"))
      .groupBy(col("e.dim").as("dim"), col("e.key").as("key"))
      .agg(min(col("fk")).as("first_seen"))
      .collect()
    dims.map { d =>
      d -> rows.filter(_.getString(0) == d)
        .sortBy(r => (r.getStruct(2).getString(0), r.getStruct(2).getInt(1)))
        .zipWithIndex
        .map { case (r, i) => (r.getString(1), i + 1) }
        .toSeq
    }.toMap
  }

  private def dimDf(df: DataFrame, pairs: Seq[(String, Int)], keyCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    pairs.toDF(keyCol, idCol)
  }

  /** single-dimension variant (kept for the generic API) */
  def dimension(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    dimDf(df, firstSightDims(df, Seq(keyCol))(keyCol), keyCol, idCol)

  /** role + tool enrichment (the north-star lookup dims) — both dims from
    * one aggregation pass, then two broadcast joins.
    */
  def withRoleToolIds(parsed: DataFrame): DataFrame = {
    val dims = firstSightDims(parsed, Seq("role", "tool"))
    parsed
      .join(broadcast(dimDf(parsed, dims("role"), "role", "role_id")), Seq("role"), "left")
      .join(broadcast(dimDf(parsed, dims("tool"), "tool", "tool_id")), Seq("tool"), "left")
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
}
