package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.app.OracleSql
import graft.operators._
import graft.sources.Tables

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 plus the training-data operators; `oracleSql` gives the
  * DuckDB-equivalent SQL for everything SQL-expressible (the rest get the
  * driver's rows-only check and are pinned against the Scala oracle in
  * ScalaTest instead).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String): String => DataFrame =
    name => Tables.read(spark, dir, name)

  private def parsed(spark: SparkSession, dir: String): DataFrame =
    ParseStage.parse(Tables.transcripts(spark, dir))

  /** Flagship: full parse→enrich→route pipeline, sink distribution. */
  def entry(spark: SparkSession): DataFrame = {
    val p = parsed(spark, "/root/testdata/sf0.001")
    Route.withSink(Enrich.withRoleToolIds(p))
      .groupBy("sink").agg(count(lit(1)).as("rows"), sum("bytes_sent").as("bytes"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------------------- TPC-H-ish
    "q1_agg" -> ((s, d) => t(s, d)("lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_base_price"),
        count(lit(1)).as("count_order"))),

    "q3_topn_join" -> ((s, d) => {
      val c = t(s, d)("customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d)("orders")
      val l = t(s, d)("lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    "q_join_bcast" -> ((s, d) => {
      val sup = t(s, d)("supplier")
      val nat = t(s, d)("nation")
      val reg = t(s, d)("region")
      sup.join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("suppliers"))
    }),

    "w_window_running" -> ((s, d) => {
      val o = t(s, d)("orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("order_seq"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).as("running_spend"))
    }),

    "e_rate_windows" -> ((s, d) => t(s, d)("events")
      .groupBy((unix_timestamp(col("ts")) / 300L).cast("long").as("win5m"), col("event_type"))
      .agg(count(lit(1)).as("events"),
        sum(floor(col("value") * 1e6).cast("long")).as("value_micros"))),

    // ------------------------------------------------- transcript pipeline
    "p_parse_fields" -> ((s, d) => parsed(s, d).select(
      "conv_id", "turn_idx", "client_ip", "remote_logname", "remote_user",
      "method", "path", "path1", "path2", "path3", "protocol", "status",
      "bytes_sent", "malicious", "domain", "format")),

    "p_ua_classify" -> ((s, d) => parsed(s, d)
      .groupBy("ua_family", "ua_os", "ua_device_type", "ua_human", "ua_intent")
      .agg(count(lit(1)).as("cnt"))),

    "p9_referer" -> ((s, d) => parsed(s, d).groupBy("referer").agg(count(lit(1)).as("cnt"))),

    "a1_totals" -> ((s, d) => Aggregates.totals(parsed(s, d))),

    "a2_keyed_counts" -> ((s, d) => Aggregates.keyedCounts(parsed(s, d))),

    "a4_topn_paths" -> ((s, d) => Aggregates.topN(parsed(s, d), "path", 10)),

    "a6_metric_rows" -> ((s, d) => Aggregates.metricRows(parsed(s, d))),

    "a7_windows" -> ((s, d) => Aggregates.windowDistribution(parsed(s, d))),

    // A8: exact arrival-order bounded-window semantics (evictions + flush +
    // late-drop); equals the batch sums on bounded-lateness data, diverges
    // exactly like the reference on stragglers (PipelineAppSpec)
    "a8_arrival_metrics" -> ((s, d) => MetricsArrivalOrder.metricRows(parsed(s, d)).toDF()),

    "f1_route_sinks" -> ((s, d) => Route.withSink(parsed(s, d))
      .select("conv_id", "turn_idx", "sink")),

    "r1_sink_distribution" -> ((s, d) => Route.withSink(parsed(s, d))
      .groupBy("sink").agg(count(lit(1)).as("n_rows"), sum("bytes_sent").as("bytes"))),

    "j1_enrich" -> ((s, d) => {
      val e = Enrich.withRoleToolIds(parsed(s, d))
      e.groupBy("role", "role_id", "tool", "tool_id").agg(count(lit(1)).as("cnt"))
    }),

    "j2_domain_enrich" -> ((s, d) => Enrich.withDomainId(parsed(s, d))
      .groupBy("domain_name", "domain_id").agg(count(lit(1)).as("cnt"))),

    // ---------------------------------------------------- dedup / similarity
    "dedup_exact" -> ((s, d) => Dedup.exactFlags(t(s, d)("documents"))),

    "dedup_minhash" -> ((s, d) => Dedup.minhashNearDups(t(s, d)("documents"), 0.5)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))),

    "dedup_simhash" -> ((s, d) => Dedup.simhashNearDups(t(s, d)("documents"), 3)),

    "dedup_embedding" -> ((s, d) => Dedup.embeddingNearDups(t(s, d)("embeddings"), 0.4)
      .select("a_id", "b_id")),

    "ann_topk" -> ((s, d) => {
      val emb = t(s, d)("embeddings")
      // neighbor SET only: rank order near float ties is engine-specific,
      // the set is stable (10th-vs-11th margin is 1000x the float error)
      Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 8), 10).select("query_id", "neighbor_id")
    }),

    "ann_lsh" -> ((s, d) => {
      val emb = t(s, d)("embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8), 10).select("query_id", "rank", "neighbor_id")
    }),

    // ------------------------------------------------------- text analysis
    "text_langid" -> ((s, d) => TextAnalysis.langId(t(s, d)("documents"))),

    "text_quality" -> ((s, d) => TextAnalysis.quality(t(s, d)("documents"))),

    "text_tokens" -> ((s, d) => TextAnalysis.tokenCounts(t(s, d)("documents"))),

    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprints(t(s, d)("documents"))
      .select(col("doc_id"), col("fingerprint"), size(col("winnow_set")).as("n_winnow"))),

    // ---------------------------------------------------------- multimodal
    "mm_binary_meta" -> ((s, d) => Multimodal.metaColumns(t(s, d)("documents"))),

    "mm_decode_stub" -> ((s, d) => {
      Multimodal.decodeMeta(t(s, d)("documents")).toDF()
        .groupBy("media_type").agg(count(lit(1)).as("n"), sum("n_bytes").as("bytes"))
    }))

  def oracleSql: Map[String, String] = {
    val W = OracleSql.withParsed _
    val base = Map(
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
          |  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
          |  count(*) AS count_order
          |FROM lineitem WHERE l_shipdate <= '1998-09-02' GROUP BY 1, 2""".stripMargin,

      "q3_topn_join" ->
        """SELECT l_orderkey,
          |  sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |GROUP BY 1 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

      "q_join_bcast" ->
        """SELECT r_name, count(*) AS suppliers
          |FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey GROUP BY 1""".stripMargin,

      "w_window_running" ->
        """SELECT o_custkey, o_orderkey,
          |  row_number() OVER w AS order_seq,
          |  sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS running_spend
          |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

      "e_rate_windows" ->
        """SELECT epoch_ms(ts) // 300000 AS win5m, event_type,
          |  count(*) AS events,
          |  CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS value_micros
          |FROM events GROUP BY 1, 2""".stripMargin,

      "p_parse_fields" -> W(
        """SELECT conv_id, turn_idx, client_ip, remote_logname, remote_user,
          |  method, path, path1, path2, path3, protocol, status, bytes_sent,
          |  malicious, domain, fmt AS format FROM parsed""".stripMargin),

      "p_ua_classify" -> W(
        """SELECT ua_family, ua_os, ua_device_type, ua_human, ua_intent, count(*) AS cnt
          |FROM parsed GROUP BY 1, 2, 3, 4, 5""".stripMargin),

      "p9_referer" -> W("SELECT referer, count(*) AS cnt FROM parsed GROUP BY 1"),

      "a1_totals" -> W(
        """SELECT count(*) AS handled_entries, count(*) AS total_requests,
          |  CAST(sum(bytes_sent) AS BIGINT) AS total_bytes,
          |  CAST(sum(CASE WHEN ua_human = 'Human' THEN 1 ELSE 0 END) AS BIGINT) AS humans,
          |  CAST(sum(CASE WHEN ua_human = 'NonHuman' THEN 1 ELSE 0 END) AS BIGINT) AS non_humans,
          |  CAST(sum(CASE WHEN malicious <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS malicious_requests
          |FROM parsed""".stripMargin),

      "a2_keyed_counts" -> W(
        """SELECT dim, key, count(*) AS cnt FROM (
          |  SELECT 'client_ip' AS dim, client_ip AS key FROM parsed UNION ALL
          |  SELECT 'device_type', ua_device_type FROM parsed UNION ALL
          |  SELECT 'intent', ua_intent FROM parsed UNION ALL
          |  SELECT 'method', method FROM parsed UNION ALL
          |  SELECT 'status', status FROM parsed UNION ALL
          |  SELECT 'ua_family', ua_family FROM parsed UNION ALL
          |  SELECT 'os_family', ua_os FROM parsed UNION ALL
          |  SELECT 'referer', referer FROM parsed UNION ALL
          |  SELECT 'path', path FROM parsed
          |) GROUP BY 1, 2""".stripMargin),

      "a4_topn_paths" -> W(
        """SELECT key, cnt, rank FROM (
          |  SELECT path AS key, count(*) AS cnt,
          |    row_number() OVER (ORDER BY count(*) DESC, path ASC) AS rank
          |  FROM parsed GROUP BY path
          |) WHERE rank <= 10""".stripMargin),

      "a6_metric_rows" -> W(
        s"""SELECT conv_id, metric_type, key_value, time_window,
           |  CAST(sum(inc) AS BIGINT) AS metric_value FROM (
           |  SELECT conv_id, 1 AS metric_type, '' AS key_value, time_window, 1 AS inc FROM parsed UNION ALL
           |  SELECT conv_id, 2, '', time_window, bytes_sent FROM parsed UNION ALL
           |  SELECT conv_id, 3, status, time_window, 1 FROM parsed UNION ALL
           |  SELECT conv_id, 5, method, time_window, 1 FROM parsed UNION ALL
           |  SELECT conv_id, 6, referer, time_window, 1 FROM parsed WHERE len(referer) > 0 UNION ALL
           |  SELECT conv_id, 7, path1, time_window, 1 FROM parsed WHERE status LIKE '2%' UNION ALL
           |  SELECT conv_id, 7, path2, time_window, 1 FROM parsed WHERE status LIKE '2%' AND len(path2) > 0 UNION ALL
           |  SELECT conv_id, 7, path3, time_window, 1 FROM parsed WHERE status LIKE '2%' AND len(path3) > 0 UNION ALL
           |  SELECT conv_id, 11, ua_family, time_window, 1 FROM parsed UNION ALL
           |  SELECT conv_id, 12, ua_os, time_window, 1 FROM parsed UNION ALL
           |  SELECT conv_id, 13, ua_device_type, time_window, 1 FROM parsed UNION ALL
           |  SELECT conv_id, 14, ua_human, time_window, 1 FROM parsed UNION ALL
           |  SELECT conv_id, 15, ua_intent, time_window, 1 FROM parsed
           |) GROUP BY 1, 2, 3, 4""".stripMargin),

      "a7_windows" -> W("SELECT time_window, count(*) AS cnt FROM parsed GROUP BY 1"),


      "f1_route_sinks" -> W(
        s"SELECT conv_id, turn_idx, ${OracleSql.sinkExpr} AS sink FROM parsed"),

      "r1_sink_distribution" -> W(
        s"""SELECT ${OracleSql.sinkExpr} AS sink, count(*) AS n_rows, CAST(sum(bytes_sent) AS BIGINT) AS bytes
           |FROM parsed GROUP BY 1""".stripMargin),

      "j1_enrich" -> W(
        """, role_dim AS (
          |  SELECT role, row_number() OVER (ORDER BY min(conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 12, '0'))) AS role_id
          |  FROM parsed GROUP BY role
          |), tool_dim AS (
          |  SELECT tool, row_number() OVER (ORDER BY min(conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 12, '0'))) AS tool_id
          |  FROM parsed GROUP BY tool
          |)
          |SELECT p.role, role_id, p.tool, tool_id, count(*) AS cnt
          |FROM parsed p JOIN role_dim USING (role) JOIN tool_dim USING (tool)
          |GROUP BY 1, 2, 3, 4""".stripMargin),

      "j2_domain_enrich" -> W(
        s""", named AS (
           |  SELECT *, CASE WHEN domain = '' THEN '${graft.sources.TranscriptGen.defaultDomain}' ELSE domain END AS domain_name FROM parsed
           |), dim AS (
           |  SELECT domain_name, row_number() OVER (ORDER BY min(conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 12, '0'))) AS domain_id
           |  FROM named GROUP BY domain_name
           |)
           |SELECT domain_name, domain_id, count(*) AS cnt
           |FROM named JOIN dim USING (domain_name) GROUP BY 1, 2""".stripMargin),

      "dedup_exact" ->
        """SELECT doc_id,
          |  CAST(doc_id > min(doc_id) OVER (PARTITION BY text) AS INT) AS is_dup
          |FROM documents""".stripMargin,

      "dedup_embedding" ->
        """SELECT a.vec_id AS a_id, b.vec_id AS b_id
          |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4""".stripMargin,

      "ann_topk" ->
        """SELECT query_id, neighbor_id FROM (
          |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |    row_number() OVER (PARTITION BY q.vec_id
          |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id ASC) AS rk
          |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
          |  WHERE q.vec_id < 8
          |) WHERE rk <= 10""".stripMargin,

      "text_quality" -> {
        val allStop = graft.operators.TextAnalysis.stopwords.flatMap(_._2).distinct
          .map(w => s"'$w'").mkString("[", ",", "]")
        s"""WITH f AS (
           |  SELECT doc_id,
           |    CAST(length(text) AS BIGINT) AS n_chars,
           |    CAST(len(list_filter(str_split_regex(lower(text), '[^a-z]+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens,
           |    list_filter(str_split_regex(lower(text), '[^a-z]+'), x -> len(x) > 0) AS toks,
           |    length(text) - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g')) AS punct,
           |    length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS upper
           |  FROM documents
           |)
           |SELECT doc_id, n_chars, n_tokens,
           |  CASE WHEN n_tokens > 0 THEN round(CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / n_tokens, 4) ELSE 0.0 END AS mean_token_len,
           |  CASE WHEN n_chars > 0 THEN round(CAST(punct AS DOUBLE) / n_chars, 4) ELSE 0.0 END AS punct_ratio,
           |  CASE WHEN n_chars > 0 THEN round(CAST(upper AS DOUBLE) / n_chars, 4) ELSE 0.0 END AS upper_ratio,
           |  CASE WHEN n_tokens > 0 THEN round(CAST(len(list_filter(toks, x -> list_contains($allStop, x))) AS DOUBLE) / n_tokens, 4) ELSE 0.0 END AS stopword_ratio,
           |  CAST(n_chars >= 50 AND n_tokens >= 10
           |    AND (CASE WHEN n_chars > 0 THEN round(CAST(punct AS DOUBLE) / n_chars, 4) ELSE 0.0 END) < 0.1
           |    AND (CASE WHEN n_tokens > 0 THEN round(CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / n_tokens, 4) ELSE 0.0 END) BETWEEN 2 AND 12
           |    AS INT) AS keep
           |FROM f""".stripMargin
      },

      "text_langid" ->
        s"SELECT doc_id, ${OracleSql.langIdExpr} AS pred_lang FROM documents",

      "text_tokens" ->
        """SELECT doc_id,
          |  len(list_filter(str_split_regex(text, '\s+'), x -> len(x) > 0)) AS ws_tokens,
          |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpeish_tokens
          |FROM documents""".stripMargin,

      "mm_binary_meta" ->
        """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
          |  CAST(64 + length(text) % 576 AS INT) AS width,
          |  CAST(64 + (length(text) * 7) % 320 AS INT) AS height
          |FROM documents""".stripMargin)
    // a8 shares a6's SQL: arrival-order and batch sums coincide on the
    // bounded-lateness generated data (divergence pinned in PipelineAppSpec)
    base + ("a8_arrival_metrics" -> base("a6_metric_rows"))
  }
}
