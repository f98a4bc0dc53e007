package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tok
import graft.operators.Route

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Column-name convention: every computed column is aliased identically in
  * the Spark query and the DuckDB oracle SQL (the driver hash-compares after
  * sorting columns by name). Token arrays are rendered as a canonical
  * comma-joined string (`tok_str`) — the byte-for-byte per-row invariant.
  */
object SparkEntry {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full parse -> enrich -> route pipeline's per-sink aggregate counts.
    */
  def entry(spark: SparkSession): DataFrame =
    StandardPipeline.fromDir(spark, "/root/testdata/sf0.001").counts

  private def routedRows(s: SparkSession, dir: String, sink: String): DataFrame =
    StandardPipeline.fromDir(s, dir).sinkFrame(sink)
      .select(col("doc_id"), Tok.tokStr(col("tokens")).as("tok_str"))
      .orderBy("doc_id")

  /** DLQ side channel over the standard pipeline's dissect failures, with a
    * deterministic entry clock (epoch 2024-01-01Z + doc_id seconds).
    */
  private def dlqEntries(s: SparkSession, dir: String): DataFrame =
    operators.Dlq.entries(
      StandardPipeline.fromDir(s, dir).trunk.filter(col("delim_pos") === 0),
      reason = lit("_dissectfailure"),
      pluginType = "filter", pluginId = "dissect_tokens",
      entryTime = timestamp_seconds(lit(1704067200L) + col("doc_id").cast("long")))

  private def sqlRoutedRows(pred: String): String =
    s"""${StandardPipeline.sqlTrunk}
       |SELECT doc_id, array_to_string(tokens, ',') AS tok_str
       |FROM trunk WHERE $pred ORDER BY doc_id""".stripMargin

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.EventQueries.queries ++ registry.TextQueries.queries ++
      registry.OpsQueries.queries ++ Map(
    // -- sanity: classic aggregation over lineitem (scan + groupBy) --
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // -- tokenize: documents -> raw_sequences (the north-star input shape) --
    "pipe_tokenize" -> ((s, dir) => {
      Tok.rawSequences(docs(s, dir))
        .select(col("doc_id"), col("source"), col("n_tok"),
          Tok.tokStr(col("tokens")).as("tok_str"))
        .orderBy("doc_id")
    }),

    // -- parse: dissect-over-tokens + severity decode --
    "pipe_parse" -> ((s, dir) => {
      StandardPipeline.fromDir(s, dir).trunk
        .select(col("doc_id"), col("severity"), col("delim_pos"),
          col("payload_len"), col("hdr_tok"))
        .orderBy("doc_id")
    }),

    // -- enrich: translate-style broadcast dictionary lookup --
    "pipe_enrich" -> ((s, dir) => {
      StandardPipeline.fromDir(s, dir).trunk
        .select(col("doc_id"), col("source"), col("team"), col("tier"))
        .orderBy("doc_id")
    }),

    // -- route: per-sink aggregate counts (single-pass, the north-rule invariant) --
    "pipe_route_counts" -> ((s, dir) =>
      StandardPipeline.fromDir(s, dir).counts.orderBy("sink")),

    // -- routed-row sets with byte-exact token arrays, one per sink --
    "pipe_route_errors"  -> ((s, dir) => routedRows(s, dir, "sink_errors")),
    "pipe_route_warnbig" -> ((s, dir) => routedRows(s, dir, "sink_warn_big")),
    "pipe_route_teama"   -> ((s, dir) => routedRows(s, dir, "sink_teamA")),

    // -- default branch (matches no sink) --
    "pipe_route_default" -> ((s, dir) => {
      val p = StandardPipeline.fromDir(s, dir)
      Route.defaultFrame(p.flagged, StandardPipeline.sinks)
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // -- dlq: parse-failure side channel with full entry metadata
    //    (DLQEntry.java:49-65: reason/plugin_type/plugin_id/entry_time;
    //    deterministic clock = 2024-01-01T00:00:00Z + doc_id seconds) --
    "pipe_dlq" -> ((s, dir) => {
      dlqEntries(s, dir)
        .select(col("doc_id"), col("reason"), col("plugin_type"), col("plugin_id"),
          date_format(col("entry_time"), "yyyy-MM-dd HH:mm:ss").as("entry_ts"))
        .orderBy("doc_id")
    }),

    // -- dlq reader input: age-filtered replay (start-from-timestamp seek)
    //    through a recovery parse --
    "pipe_dlq_replay" -> ((s, dir) => {
      operators.Dlq.replayable(dlqEntries(s, dir),
          to_timestamp(lit("2024-01-01 00:02:00")))
        .withColumn("severity", lit("UNKNOWN"))
        .groupBy("source", "severity").agg(count(lit(1)).as("n"))
        .orderBy("source")
    }),

    // -- dlq retention: max_bytes under BOTH storage policies (drop_newer
    //    keeps the oldest-first prefix that fits, drop_older the newest
    //    suffix — DeadLetterQueueWriter.java:489-524), deterministic sizes --
    "pipe_dlq_bound" -> ((s, dir) => {
      val e = dlqEntries(s, dir)
        .withColumn("sz", lit(100) + col("doc_id").cast("long") % 50)
      val dn = operators.Dlq.bounded(e, col("sz"), "doc_id", 8000L, dropOlder = false)
        .select(col("doc_id").as("id_dn"))
      val dOld = operators.Dlq.bounded(e, col("sz"), "doc_id", 8000L, dropOlder = true)
        .select(col("doc_id").as("id_do"))
      e.join(dn, col("doc_id") === col("id_dn"), "left")
        .join(dOld, col("doc_id") === col("id_do"), "left")
        .select(col("doc_id"), col("sz"),
          col("id_dn").isNotNull.as("kept_newer"),
          col("id_do").isNotNull.as("kept_older"))
        .orderBy("doc_id")
    }),

    // -- codec encode side: event -> JSON line (JavaCodecDelegator.encode) --
    "evt_encode" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"),
          to_json(struct(col("event_type").as("t"), col("user_id").as("u"))).as("enc"))
        .orderBy("event_id")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.EventQueries.oracleSql ++ registry.TextQueries.oracleSql ++
      registry.OpsQueries.oracleSql ++ Map(
    "q1_agg" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "pipe_tokenize" ->
      s"""${Tok.sqlRawSequences}
         |SELECT doc_id, source, n_tok, array_to_string(tokens, ',') AS tok_str
         |FROM raw ORDER BY doc_id""".stripMargin,

    "pipe_parse" ->
      s"""${StandardPipeline.sqlTrunk}
         |SELECT doc_id, severity, delim_pos, payload_len, hdr_tok
         |FROM trunk ORDER BY doc_id""".stripMargin,

    "pipe_enrich" ->
      s"""${StandardPipeline.sqlTrunk}
         |SELECT doc_id, source, team, tier FROM trunk ORDER BY doc_id""".stripMargin,

    "pipe_route_counts" -> {
      val preds = StandardPipeline.sqlSinkPreds
      val sinkRows = preds.map { case (name, p) =>
        s"SELECT '$name' AS sink, COUNT(*) FILTER (WHERE $p) AS n FROM trunk"
      }
      val noneMatch = preds.map(_._2).mkString("NOT (", " OR ", ")")
      (Seq(StandardPipeline.sqlTrunk) ++ Seq((sinkRows ++ Seq(
        s"SELECT '_default' AS sink, COUNT(*) FILTER (WHERE $noneMatch) AS n FROM trunk",
        s"SELECT '_total' AS sink, COUNT(*) AS n FROM trunk"))
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY sink"))).mkString("\n")
    },

    "pipe_route_errors"  -> sqlRoutedRows(StandardPipeline.sqlSinkPreds(0)._2),
    "pipe_route_warnbig" -> sqlRoutedRows(StandardPipeline.sqlSinkPreds(1)._2),
    "pipe_route_teama"   -> sqlRoutedRows(StandardPipeline.sqlSinkPreds(2)._2),

    "pipe_route_default" -> {
      val noneMatch = StandardPipeline.sqlSinkPreds.map(_._2).mkString("NOT (", " OR ", ")")
      s"""${StandardPipeline.sqlTrunk}
         |SELECT doc_id FROM trunk WHERE $noneMatch ORDER BY doc_id""".stripMargin
    },

    "pipe_dlq" ->
      s"""${StandardPipeline.sqlTrunk}
         |SELECT doc_id, '_dissectfailure' AS reason,
         |       'filter' AS plugin_type, 'dissect_tokens' AS plugin_id,
         |       strftime(make_timestamp((1704067200 + CAST(doc_id AS BIGINT)) * 1000000),
         |                '%Y-%m-%d %H:%M:%S') AS entry_ts
         |FROM trunk WHERE delim_pos = 0 ORDER BY doc_id""".stripMargin,

    "pipe_dlq_replay" ->
      s"""${StandardPipeline.sqlTrunk}
         |SELECT source, 'UNKNOWN' AS severity, COUNT(*) AS n
         |FROM trunk
         |WHERE delim_pos = 0
         |  AND make_timestamp((1704067200 + CAST(doc_id AS BIGINT)) * 1000000)
         |      >= TIMESTAMP '2024-01-01 00:02:00'
         |GROUP BY source ORDER BY source""".stripMargin,

    "pipe_dlq_bound" ->
      s"""${StandardPipeline.sqlTrunk},
         |d AS (
         |  SELECT doc_id, 100 + CAST(doc_id AS BIGINT) % 50 AS sz
         |  FROM trunk WHERE delim_pos = 0),
         |c AS (
         |  SELECT doc_id, sz,
         |         SUM(sz) OVER (ORDER BY CAST(doc_id AS BIGINT)
         |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         SUM(sz) OVER () AS total
         |  FROM d)
         |SELECT doc_id, sz, cum <= 8000 AS kept_newer,
         |       total - cum + sz <= 8000 AS kept_older
         |FROM c ORDER BY doc_id""".stripMargin,

    "evt_encode" ->
      """SELECT event_id,
        |       CAST(to_json(struct_pack(t := event_type, u := user_id)) AS VARCHAR) AS enc
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
