package graft


/** DuckDB oracle SQL for the [[PipelinesSurface]] queries. */
private[graft] trait OraclesSurface { this: OracleSnippets =>
  protected def sqlSurface: Map[String, String] = Map(
    "q06_num_optional_services" ->
      """SELECT o_orderkey,
        |  CAST((CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |     + (CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
        |     + (CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS INTEGER)
        |    AS num_optional_services
        |FROM orders ORDER BY o_orderkey""".stripMargin,


    "q10_summary_stats" ->
      (Seq("l_quantity", "l_extendedprice", "l_discount").map(statsForSql)
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")),


    "q13_window_dedup" ->
      """SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,


    "q15_sql_revenue_per_nation" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,


    "q16_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,


    "q18_export_join" ->
      """SELECT c.c_custkey, c.c_name, c.c_mktsegment, o.n_orders, o.total_spent
        |FROM customer c
        |JOIN (SELECT o_custkey AS c_custkey,
        |        CAST(count(*) AS BIGINT) AS n_orders,
        |        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |      FROM orders GROUP BY o_custkey) o
        |  ON c.c_custkey = o.c_custkey
        |ORDER BY c.c_custkey""".stripMargin,


    "q19_catalog_ops" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey",


    "q17_event_window_agg" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin,


    "q14_publish_online" ->
      """SELECT o_custkey AS c_custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_order_price,
        |  epoch_us(max(o_orderdate)) AS last_order_us,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open_orders
        |FROM orders GROUP BY o_custkey ORDER BY c_custkey""".stripMargin,


    "q67_online_lookup" ->
      """SELECT o_custkey AS c_custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_order_price,
        |  epoch_us(max(o_orderdate)) AS last_order_us,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open_orders
        |FROM orders WHERE o_custkey BETWEEN 1 AND 50
        |GROUP BY o_custkey ORDER BY c_custkey""".stripMargin,


    "q33_pit_training_set" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day_ts,
        |    CAST(count(*) AS BIGINT) AS day_events
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT s.event_id, s.user_id, epoch_us(s.ts) AS ts_us, s.value,
        |  d.day_events
        |FROM spine s ASOF LEFT JOIN daily d
        |  ON s.user_id = d.user_id AND s.ts >= d.day_ts
        |ORDER BY s.event_id""".stripMargin,


    "q57_pit_forward" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day_ts,
        |    CAST(count(*) AS BIGINT) AS day_events
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT s.event_id, s.user_id, epoch_us(s.ts) AS ts_us, s.value,
        |  d.day_events
        |FROM spine s ASOF LEFT JOIN daily d
        |  ON s.user_id = d.user_id AND s.ts <= d.day_ts
        |ORDER BY s.event_id""".stripMargin,


    "q32_media_features" ->
      """SELECT doc_id AS media_id, CAST(strlen(text) AS INTEGER) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin,


    "q34_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        |s AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL THEN 1
        |                     WHEN us - lag(us) OVER w > 14400000000 THEN 1
        |                     ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s2 AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM s)
        |SELECT user_id, session_id, min(us) AS start_us, max(us) AS end_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM s2 GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,


    "q36_salted_join" ->
      """SELECT c.c_custkey, c.c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_custkey, c.c_mktsegment
        |ORDER BY c.c_custkey""".stripMargin,


    "q37_distinct_counts" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,


    "q38_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,


    "q39_set_ops" ->
      """WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |open_o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |u AS (SELECT o_custkey, 'intersect' AS set_op FROM (SELECT * FROM urgent INTERSECT SELECT * FROM open_o)
        |      UNION ALL
        |      SELECT o_custkey, 'except' AS set_op FROM (SELECT * FROM urgent EXCEPT SELECT * FROM open_o))
        |SELECT set_op, CAST(count(*) AS BIGINT) AS n_custs
        |FROM u GROUP BY set_op ORDER BY set_op""".stripMargin,


    "q40_term_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents WHERE length(trim(text)) > 0),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM toks GROUP BY doc_id, term),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
        |SELECT t.term, t.doc_id, t.tf, d.df,
        |  CAST((SELECT count(*) FROM documents) AS DOUBLE) / d.df AS idf_ratio
        |FROM tf t JOIN dfreq d USING (term)
        |ORDER BY doc_id, term""".stripMargin,

    // same md5-threshold arithmetic as Sampling.hashSplit: the
    // 0.8 cut is the first 8 hex digits of 0.8·2³², and an
    // 8-char-prefix tie compares greater (test side) in both engines
    "q41_train_test_split" ->
      """SELECT c_custkey,
        |  CASE WHEN md5(CAST(c_custkey AS VARCHAR)) <
        |    printf('%08x', CAST(floor(0.8e0 * 4294967296.0e0) AS BIGINT))
        |  THEN 'train' ELSE 'test' END AS side
        |FROM customer ORDER BY c_custkey""".stripMargin,


    "q42_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS qty_p25,
        |  quantile_cont(l_quantity, 0.5) AS qty_p50,
        |  quantile_cont(l_quantity, 0.75) AS qty_p75,
        |  quantile_cont(l_extendedprice, 0.5) AS price_p50
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,


    "q43_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,


    "q44_csv_ingest" ->
      s"""SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
         |  CAST(length(trim(c_name)) AS INTEGER) AS name_len,
         |  CASE WHEN c_mktsegment = 'BUILDING' THEN 1
         |       WHEN c_mktsegment = 'AUTOMOBILE' THEN 2
         |       WHEN c_mktsegment = 'MACHINERY' THEN 3 END AS segment_code,
         |  CAST(c_acctbal AS DOUBLE) AS acctbal
         |FROM read_csv_auto('${PipelinesExt.csvFixturePathFor(PipelinesRound12.oracleDatasetDir)}/*.csv', header=true)
         |ORDER BY c_custkey""".stripMargin,


    // invariant gate (r12): IVF cell routing is engine-specific; the
    // driver hashes the portable per-query facts + the recall floor
    "q35_ivf_ann" -> annInvariantOracleSql(withRecall = true),


    // the sampler's portable fact: ceil(n/2) frames survive everyK=2
    // over the (doc_id % 5 + 1)-frame container
    "q186_video_frames" ->
      """SELECT doc_id AS media_id,
        |  CAST((doc_id % 5 + 2) // 2 AS INTEGER) AS frames_kept
        |FROM documents ORDER BY media_id""".stripMargin,


    // invariant gate (r12): summary()'s cells are engine-formatted
    // strings; the booleans assert the parsed-back parity facts
    "q45_summary" ->
      """SELECT s AS summary, TRUE AS quantity_ok,
        |  TRUE AS extendedprice_ok, TRUE AS discount_ok
        |FROM (VALUES ('count'), ('mean'), ('stddev'), ('min'),
        |  ('25%'), ('50%'), ('75%'), ('max')) t(s)
        |ORDER BY summary""".stripMargin,
  )
}
