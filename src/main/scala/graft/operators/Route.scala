package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Routing / sink fan-out (SURVEY.md §2 R1-R4): a deterministic rule table
  * evaluated as one `when` chain producing a `sink` label column, then a
  * single partitioned write — one pass over the data for all sinks instead
  * of one job per handler.
  *
  * Skew handling per the north rule: salted repartition on conv_id (hot
  * conversations would otherwise pin single tasks), followed by
  * sortWithinPartitions(conv_id, turn_idx) so the per-turn text-equality
  * invariant holds under a stable order inside every file written.
  */
object Route {

  /** F1 "relevant" predicate (main.go:768-779). Null UA (Apache common
    * format, where the reference would nil-panic) is defined as not relevant.
    */
  val isRelevant: Column =
    col("malicious") === 0 &&
      (col("status").startsWith("2") || col("status").startsWith("5")) &&
      col("ua_device_type").isNotNull &&
      col("ua_device_type") =!= "Script" &&
      !col("ua_family").isin("Scanner", "SEOBot", "Script")

  /** The deterministic rule table, priority order. First match wins. */
  val rules: Seq[(String, Column)] = Seq(
    "quarantine" -> (col("malicious") =!= 0),
    "relevant" -> isRelevant,
    "bot_traffic" -> (col("role") === "tool" || col("ua_device_type") === "Script" ||
      col("ua_human") === "NonHuman"),
    "archive" -> lit(true))

  val sinkCol: Column = {
    val chain = rules.init.foldLeft[Option[Column]](None) { case (acc, (sink, pred)) =>
      Some(acc.fold(when(pred, lit(sink)))(_.when(pred, lit(sink))))
    }.get
    chain.otherwise(lit(rules.last._1)).as("sink")
  }

  def withSink(parsed: DataFrame): DataFrame = parsed.withColumn("sink", sinkCol)

  /** Salted exchange + in-partition stable order (north rule). The salt only
    * spreads rows of one conversation across SALT tasks; aggregates are
    * salt-insensitive because keys re-merge in their own final aggregation.
    */
  def salted(parsed: DataFrame, partitions: Int, salt: Int = 16): DataFrame =
    parsed
      .withColumn("_salt", pmod(hash(col("turn_idx")), lit(salt)))
      .repartition(partitions, col("conv_id"), col("_salt"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .drop("_salt")

  /** Go field-name projection for the WRITE_TO_FILE JSON sink (R2,
    * handlers/writetofile.go:50-90): field names and timestamp rendering
    * match Go's json.Marshal of SBOHttpRequestLog. withKeys=true prepends
    * (conv_id, turn_idx) — not part of the sink format, used by the driver
    * correctness query to make the projection row-addressable.
    */
  def goJsonProjection(parsed: DataFrame, withKeys: Boolean = false): DataFrame = {
    val local = ParseStage.localTs(col("log_ts"), col("tz_offset_sec"))
    val off = col("tz_offset_sec")
    val tzSuffix = when(off === 0, lit("Z")).otherwise(
      concat(
        when(off < 0, lit("-")).otherwise(lit("+")),
        lpad((abs(off) / 3600).cast("int").cast("string"), 2, "0"),
        lit(":"),
        lpad(((abs(off) % 3600) / 60).cast("int").cast("string"), 2, "0")))
    val rfc3339 = when(col("log_ts").isNull, lit("0001-01-01T00:00:00Z"))
      .otherwise(concat(date_format(local, "yyyy-MM-dd'T'HH:mm:ss"), tzSuffix))
    val keys = if (withKeys) Seq(col("conv_id"), col("turn_idx")) else Nil
    parsed.select(keys ++ Seq(
      col("domain").as("Domain"),
      col("client_ip").as("ClientIP"),
      col("remote_logname").as("RemoteLogname"),
      col("remote_user").as("RemoteUser"),
      rfc3339.as("Timestamp"),
      col("method").as("Method"),
      col("path").as("Path"),
      col("path1").as("Path1"),
      col("path2").as("Path2"),
      col("path3").as("Path3"),
      col("protocol").as("Protocol"),
      col("status").as("Status"),
      col("bytes_sent").cast("int").as("BytesSent"),
      col("referer").as("Referer"),
      when(col("ua_full").isNotNull, struct(
        col("ua_full").as("FullName"),
        col("ua_os").as("OS"),
        col("ua_family").as("Family"),
        col("ua_device_type").as("DeviceType"),
        col("ua_human").as("Human"),
        col("ua_intent").as("Intent"))).as("UserAgent"),
      col("malicious").as("Malicious"),
      lit(false).as("IsOutOfOrder")): _*)
  }

  /** Go/MySQL byte-length truncation: the reference's ReduceToMaxColumnLen
    * slices BYTES (Go `str[:n]`, mysqldb.go:226-238), not characters. For
    * multi-byte UTF-8 values the two diverge (and Go will happily cut a rune
    * in half); slicing through BinaryType reproduces the exact byte
    * semantics. The fast path (`octet_length <= n`, every ASCII value) never
    * leaves StringType.
    */
  private def byteTrunc(c: Column, n: Int): Column =
    when(octet_length(c) <= n, c)
      .otherwise(substring(c.cast("binary"), 1, n).cast("string"))

  /** last-n-BYTES variant (the masked-UA rule, mysqldb.go:208,232-238) */
  private def byteTruncLast(c: Column, n: Int): Column =
    when(octet_length(c) <= n, c)
      .otherwise(substring(c.cast("binary"), -n, n).cast("string"))

  /** R4 raw-log projection: IP masking + per-column truncation, constants
    * exactly as the reference's ReduceToMaxColumnLen calls
    * (db/mysqldb.go:161-238): remote_user/path3/request_uri/referer/ua 100,
    * http_method and the five UA classification columns 20 — all BYTE
    * lengths, like Go slicing. Masked UA keeps the LAST 100 bytes
    * (mysqldb.go:208/:232-238); everything else keeps the first N. path3
    * falls back path3→path2→path1 and stays empty when all are empty
    * (mysqldb.go:176-182). host_id mirrors the sbo_rawlogs column
    * (mysqldb.go:162-165). client_ip_bin is the INET6_ATON binary form the
    * reference actually stores (mysqldb.go:168-175): 4/16 bytes, NULL when
    * masked or unparseable.
    */
  def rawLogProjection(parsed: DataFrame, maskIps: Boolean, hostId: Int = 0): DataFrame = {
    val ip = if (maskIps) lit(null).cast("string") else col("client_ip")
    val inetAtonUdf = udf((s: String) => graft.parse.Inet.inetAton(s))
    val ipBin = if (maskIps) lit(null).cast("binary") else inetAtonUdf(col("client_ip"))
    val uaTrunc = if (maskIps) byteTruncLast(col("ua_full"), 100)
    else byteTrunc(col("ua_full"), 100)
    def t20(c: String) = byteTrunc(col(c), 20).as(c)
    parsed.select(
      col("conv_id"), col("turn_idx"),
      lit(hostId).as("host_id"),
      col("log_ts").as("request_ts"),
      ip.as("client_ip"),
      ipBin.as("client_ip_bin"),
      byteTrunc(col("remote_user"), 100).as("remote_user"),
      byteTrunc(col("method"), 20).as("http_method"),
      byteTrunc(coalesce(nullif(col("path3"), lit("")), nullif(col("path2"), lit("")),
        nullif(col("path1"), lit("")), lit("")), 100).as("path3"),
      byteTrunc(col("path"), 100).as("request_uri"),
      col("status").as("http_status"),
      col("bytes_sent"),
      byteTrunc(col("referer"), 100).as("referer"),
      col("malicious").as("is_malicious"),
      uaTrunc.as("ua_string"),
      t20("ua_os"), t20("ua_family"), t20("ua_device_type"), t20("ua_human"), t20("ua_intent"))
  }

  /** content-stable partition column: event-time day bucket */
  private def dayBucket = coalesce(
    date_format(ParseStage.localTs(col("log_ts"), col("tz_offset_sec")), "yyyyMMdd"),
    lit("00010101"))

  /** Multi-sink fan-out with per-partition lineage manifest + resume.
    * One salted pass, one write partitioned by (sink, event-day bucket) —
    * content-stable partition keys, not task ids (SURVEY.md §7.4 item 5).
    * The manifest records per-(sink, bucket) row counts and order-free
    * checksums plus the input fingerprint; a rerun over the same input
    * finds the matching manifest and skips the write entirely — the
    * checkpoint-resume contract (north rule). A changed input (different
    * fingerprint) rewrites and re-manifests.
    *
    * Returns the manifest JSON string.
    */
  def fanOutWithLineage(routed: DataFrame, outDir: String, partitions: Int): String = {
    val manifestPath = Paths.get(outDir, "_lineage", "manifest.json")
    // ZERO-SCAN resume tier (r5): fingerprint the input's FILE METADATA
    // (sorted paths + lengths — a listing, no data read; the Iceberg
    // analogue is comparing snapshot ids). A rerun over the byte-identical
    // input skips without launching any job; input rewritten under new file
    // names falls through to the content-checksum tier below, which
    // preserves the original contract (identical CONTENT still skips the
    // write at the cost of one stats scan).
    val inputFiles = routed.inputFiles.sorted
    // the (plan, layout) fingerprint, mixed into BOTH resume tiers: the
    // metadata tier (below) and the content tier's fpJson — ADVICE r5
    // (medium): the content fingerprint alone is a property of the INPUT
    // (total rows + global checksum), so a changed routing plan or
    // partitions argument over unchanged input used to match the content
    // tier, skip the rewrite, and stamp the NEW plan's metadata fingerprint
    // onto output written by the OLD plan — every later run then served
    // stale output through the zero-scan tier.
    val planFp = routed.queryExecution.analyzed.semanticHash().toLong * 31L + partitions
    val metaFp = {
      val hconf = routed.sparkSession.sparkContext.hadoopConfiguration
      // covers the PIPELINE as well as the input: the routed plan's
      // canonicalized semantic hash and the partitions argument are mixed
      // in, so a changed routing/projection or layout over unchanged files
      // re-runs instead of serving stale output (code-review r5); file
      // modification time catches an in-place same-length rewrite
      var h = 0xcbf29ce484222325L ^ routed.queryExecution.analyzed.semanticHash().toLong
      h *= 0x100000001b3L
      h ^= partitions.toLong; h *= 0x100000001b3L
      inputFiles.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        h ^= graft.operators.Dedup.fnv1a(f); h *= 0x100000001b3L
        val (len, mtime) =
          try {
            val st = p.getFileSystem(hconf).getFileStatus(p)
            (st.getLen, st.getModificationTime)
          } catch { case _: java.io.IOException => (-1L, -1L) }
        h ^= len; h *= 0x100000001b3L
        h ^= mtime; h *= 0x100000001b3L
      }
      h
    }
    // in-memory inputs (no backing files) all hash alike — the metadata tier
    // is only meaningful for file-backed plans; others go straight to the
    // content tier
    if (inputFiles.nonEmpty && Files.exists(manifestPath)) {
      val existing = new String(Files.readAllBytes(manifestPath), StandardCharsets.UTF_8)
      if (existing.contains(s""""input_files":$metaFp,""")) return existing // resume: no scan at all
    }
    // ONE stats pass: per-(sink, bucket) rows/checksum/min/max, collected as
    // a bounded (sinks × day-buckets) result. The global input fingerprint
    // folds out of the same rows — bit_xor is associative, so the xor of the
    // per-group checksums IS the whole-input checksum. Total input scans: 2
    // (this aggregate + the write), down from 3 — and 0 on a same-files
    // rerun via the metadata tier above.
    val groups = routed
      .groupBy(col("sink"), dayBucket.as("bucket"))
      .agg(
        count(lit(1)).as("rows"),
        coalesce(expr("bit_xor(xxhash64(conv_id, turn_idx, text))"), lit(0L)).as("checksum"),
        min(col("turn_idx")).as("min_turn"),
        max(col("turn_idx")).as("max_turn"))
      .collect()
    val totalRows = groups.map(_.getLong(2)).sum
    val totalChecksum = groups.map(_.getLong(3)).foldLeft(0L)(_ ^ _)
    val fpJson = s"""{"plan":$planFp,"rows":$totalRows,"checksum":$totalChecksum}"""

    if (Files.exists(manifestPath)) {
      val existing = new String(Files.readAllBytes(manifestPath), StandardCharsets.UTF_8)
      if (existing.contains(s""""input":$fpJson""")) {
        // same CONTENT under different file metadata: the written data is
        // valid — skip the write and refresh the metadata fingerprint so
        // the next rerun takes the zero-scan tier
        val refreshed =
          if (existing.contains("\"input_files\":"))
            existing.replaceFirst("\"input_files\":-?\\d+,", s""""input_files":$metaFp,""")
          else existing.replaceFirst("\\{", s"""{"input_files":$metaFp,""")
        Files.write(manifestPath, refreshed.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        return refreshed
      }
    }

    salted(routed.withColumn("bucket", dayBucket), partitions)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("sink", "bucket")
      .parquet(outDir + "/data")

    val perPartition = groups
      .map(r => s"""{"sink":"${r.getString(0)}","bucket":"${r.getString(1)}","rows":${r.getLong(2)},"checksum":${r.getLong(3)},"min_turn":${r.getInt(4)},"max_turn":${r.getInt(5)}}""")
      .sorted
      .mkString("[", ",", "]")
    val manifest = s"""{"input_files":$metaFp,"input":$fpJson,"partitions":$perPartition}"""
    Files.createDirectories(manifestPath.getParent)
    Files.write(manifestPath, manifest.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    manifest
  }
}
