package graft.oracles

import graft.operators.{Analytics, Events, Expectations, Features, Gold, Graphs, PrefixJoin, Privacy, Relational, Scd2, TextOps, VectorOps}
import graft.util.Portable.Sql._
import graft.oracles.OracleDialect._

/** DuckDB oracle SQL — relational spine, SCD2, layers, storage and sources. Entries moved verbatim from the
  * pre-split SparkEntry registry; keys and strings unchanged
  * (CORRECTNESS gates hash every one of them).
  */
object RelationalOracles {

  val map: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sum2("l_quantity")} AS sum_qty,
         |  ${sum2("l_extendedprice")} AS sum_base_price,
         |  ${sum4(netExpr)} AS sum_disc_price,
         |  ${sum4(s"$netExpr * (1.0 + l_tax)")} AS sum_charge,
         |  ${avg2("l_quantity")} AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q02_filter_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  substr(o_orderpriority, 1, 1) AS priority_class
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
        |LIMIT 25""".stripMargin,

    "q03_revenue_by_nation" ->
      s"""SELECT n_name, ${sum4(netExpr)} AS revenue, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name
         |ORDER BY n_name NULLS FIRST""".stripMargin,

    "q04_brand_performance" ->
      s"""SELECT p_brand, ${sum4(netExpr)} AS revenue,
         |  ${sum2("l_quantity")} AS total_qty,
         |  COUNT(DISTINCT l_orderkey) AS n_orders
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand
         |ORDER BY p_brand NULLS FIRST""".stripMargin,

    "q05_top_customers" ->
      s"""SELECT c_custkey, c_name, revenue, n_orders
         |FROM (
         |  SELECT o_custkey, ${sum2("o_totalprice")} AS revenue,
         |    COUNT(*) AS n_orders
         |  FROM orders GROUP BY o_custkey
         |) JOIN customer ON o_custkey = c_custkey
         |ORDER BY revenue DESC NULLS LAST, c_custkey ASC NULLS FIRST
         |LIMIT 10""".stripMargin,

    "q06_distinct_users" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q07_late_shipments" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
        |      THEN 1 ELSE 0 END) AS BIGINT) AS late_items,
        |  COUNT(*) AS total_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin,

    "q08_monthly_revenue" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |  ${sum2("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,

    "q09_funnel" -> funnelSql,

    "q10_last_event_per_user" -> lastEventSql,

    "q11_first_item_per_order" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_extendedprice ASC NULLS FIRST, l_linenumber ASC NULLS FIRST) AS rn
        |  FROM lineitem) WHERE rn = 1
        |ORDER BY l_orderkey NULLS FIRST""".stripMargin,

    "q12_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id NULLS FIRST""".stripMargin,

    "q13_union_tagged" ->
      """SELECT 'customer' AS source_table, c_name AS name, c_acctbal AS acctbal
        |FROM customer
        |UNION ALL
        |SELECT 'supplier', s_name, s_acctbal FROM supplier
        |ORDER BY source_table NULLS FIRST, name NULLS FIRST""".stripMargin,

    "q14_mode_brand" ->
      """SELECT p_brand, COUNT(*) AS n FROM part
        |GROUP BY p_brand ORDER BY n DESC NULLS LAST, p_brand ASC NULLS FIRST LIMIT 1""".stripMargin,

    "q15_quantiles" ->
      """SELECT l_returnflag,
        |  median(l_quantity) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q16_event_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS gap_us
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_gaps,
        |  CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_gap_s,
        |  CAST(MAX(gap_us) AS DOUBLE) / 1000000.0 AS max_gap_s
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q17_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
         |sess AS (
         |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS session_id
         |  FROM flagged)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |  MIN(ts) AS session_start,
         |  CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS DOUBLE) / 1000000.0
         |    AS duration_s,
         |  ${sum2("value")} AS session_value
         |FROM sess GROUP BY user_id, session_id
         |ORDER BY user_id NULLS FIRST, session_id NULLS FIRST""".stripMargin,

    "q18_conversion_rates" ->
      s"""WITH stages(stage, stage_rank) AS
         |  (VALUES ('signup', 1), ('view', 2), ('click', 3), ('purchase', 4)),
         |counts AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
         |f AS (
         |  SELECT stage, stage_rank, COALESCE(n, 0) AS n_events
         |  FROM stages LEFT JOIN counts ON stage = event_type)
         |SELECT stage, stage_rank, n_events,
         |  CASE WHEN lag(n_events) OVER (ORDER BY stage_rank NULLS FIRST) > 0
         |    THEN ${val4("CAST(n_events AS DOUBLE) / lag(n_events) OVER (ORDER BY stage_rank NULLS FIRST) * 100.0")}
         |  END AS conversion_pct
         |FROM f ORDER BY stage_rank NULLS FIRST""".stripMargin,

    "q19_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q20_dq_metrics" ->
      """SELECT COUNT(*) AS total_rows,
        |  COUNT(*) - COUNT(DISTINCT
        |    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR))
        |    AS dup_keys,
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_qty,
        |  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_shipdate
        |FROM lineitem""".stripMargin,

    "q21_customer_sk" ->
      """SELECT c_custkey,
        |  ROW_NUMBER() OVER (ORDER BY c_custkey NULLS FIRST) + 1000 AS customer_sk,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q22_rollup_revenue" ->
      s"""SELECT c_mktsegment, o_orderstatus,
         |  ${sum2("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY ROLLUP(c_mktsegment, o_orderstatus)
         |ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "q23_scd2_merge" ->
      s"""WITH $scd2Ctes
         |$scd2HistSelect
         |ORDER BY order_id NULLS FIRST, valid_from NULLS FIRST""".stripMargin,

    "q24_gold_fact" ->
      s"""SELECT l_orderkey AS order_id, l_linenumber AS line_number,
         |  o_custkey AS customer_id, l_partkey AS product_id,
         |  l_suppkey AS seller_id, c_mktsegment AS customer_segment,
         |  p_brand AS product_brand, s_name AS seller_name,
         |  o_orderstatus AS order_status,
         |  CAST(o_orderdate AS DATE) AS order_date,
         |  CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_sk,
         |  CAST(strftime(l_shipdate, '%Y%m%d') AS INT) AS ship_date_sk,
         |  ${val2("l_quantity")} AS quantity,
         |  ${val2("l_extendedprice")} AS gross_amount,
         |  ${val4(netExpr)} AS net_amount,
         |  ${val4(s"$netExpr * (1.0 + l_tax)")} AS charged_amount,
         |  ${val4("l_extendedprice * l_discount")} AS discount_amount
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |ORDER BY order_id NULLS FIRST, line_number NULLS FIRST""".stripMargin,

    "q25_silver_events" ->
      s"""SELECT event_id, user_id, event_type, ts,
         |  CAST(ts AS DATE) AS event_date,
         |  CAST(strftime(ts, '%Y%m%d') AS INT) AS date_sk,
         |  ${val2("value")} AS value_amt,
         |  CAST(json_extract_string(props, '$$.k') AS INT) AS prop_k
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts NULLS FIRST) AS rn
         |  FROM events) WHERE rn = 1
         |  AND ts IS NOT NULL AND event_type IS NOT NULL
         |ORDER BY event_id NULLS FIRST""".stripMargin,

    "q26_product_performance" ->
      s"""WITH fact AS (
         |  SELECT p_brand AS product_brand, l_orderkey AS order_id,
         |    ${val2("l_quantity")} AS quantity,
         |    ${val4(netExpr)} AS net_amount
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN supplier ON l_suppkey = s_suppkey)
         |SELECT product_brand,
         |  ${sum4("net_amount")} AS revenue,
         |  ${sum2("quantity")} AS units,
         |  COUNT(DISTINCT order_id) AS n_orders
         |FROM fact GROUP BY product_brand ORDER BY product_brand NULLS FIRST""".stripMargin,

    "q39_kpis" ->
      s"""SELECT COUNT(*) AS total_orders,
         |  ${sum2("o_totalprice")} AS total_revenue,
         |  ${sum2("o_totalprice")} / COUNT(*) AS avg_order_value,
         |  ${val4("CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS DOUBLE) * 100.0 / COUNT(*)")} AS open_pct
         |FROM orders""".stripMargin,

    "q40_date_dim" ->
      """SELECT CAST(d AS DATE) AS full_date,
        |  CAST(strftime(d, '%Y%m%d') AS INT) AS date_sk,
        |  year(d) AS year, quarter(d) AS quarter, month(d) AS month,
        |  isodow(d) AS iso_dow
        |FROM (SELECT unnest(generate_series(
        |  DATE '1995-01-01', DATE '2001-12-31', INTERVAL 1 DAY)) AS d)
        |ORDER BY full_date NULLS FIRST""".stripMargin,

    "q43_scd2_asof_lookup" ->
      s"""WITH $scd2Ctes,
         |hist AS (
         |$scd2HistSelect),
         |probes AS (
         |  SELECT o_orderkey AS order_id,
         |    unnest([TIMESTAMP '2024-03-01 00:00:00',
         |            TIMESTAMP '2024-07-01 00:00:00']) AS probe_ts
         |  FROM orders)
         |SELECT p.order_id, p.probe_ts, h.order_status, h.order_sk
         |FROM probes p JOIN hist h ON p.order_id = h.order_id
         |  AND h.valid_from <= p.probe_ts AND p.probe_ts < h.valid_to
         |ORDER BY p.order_id NULLS FIRST, p.probe_ts NULLS FIRST""".stripMargin,

    // 6h tumbling windows, epoch-aligned exactly like Spark's window():
    // floor-divide event-time micros by the window span.,
    "q45_pivot_events" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q46_cube_revenue" ->
      """SELECT c_mktsegment, o_orderstatus,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderstatus)
        |ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "q47_moving_avg" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_cents
        |  FROM orders GROUP BY 1)
        |SELECT month,
        |  CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
        |  CAST(CAST(SUM(rev_cents) OVER w3 AS BIGINT) AS DOUBLE)
        |    / COUNT(*) OVER w3 / 100.0 AS revenue_ma3,
        |  CAST(CAST(SUM(rev_cents) OVER wc AS BIGINT) AS DOUBLE) / 100.0
        |    AS revenue_cum
        |FROM m
        |WINDOW w3 AS (ORDER BY month NULLS FIRST
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |       wc AS (ORDER BY month NULLS FIRST ROWS UNBOUNDED PRECEDING)
        |ORDER BY month NULLS FIRST""".stripMargin,

    "q48_hash_sample" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         |FROM orders
         |WHERE ${h32("CAST(o_orderkey AS VARCHAR)")} % 20 = 0
         |ORDER BY o_orderkey NULLS FIRST""".stripMargin,

    // KMV sketch mirror: the k-th smallest distinct portable hash per
    // group reproduces KmvDistinct.estimate exactly (integer math only).,
    "q49_kmv_distinct" ->
      s"""WITH h AS (
         |  SELECT DISTINCT event_type,
         |    ${h32("CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events),
         |r AS (
         |  SELECT event_type, hv,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY hv NULLS FIRST) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS nd
         |  FROM h)
         |SELECT event_type, CAST(nd AS BIGINT) AS exact_users,
         |  CAST(CASE WHEN nd < 64 THEN nd
         |       ELSE (63 * 4294967296) // GREATEST(hv, 1) END AS BIGINT)
         |    AS approx_users
         |FROM r WHERE rn = LEAST(nd, 64)
         |ORDER BY event_type NULLS FIRST""".stripMargin,

    // IVF ANN mirror: same deterministic centroids (vec_id < 16), same
    // nearest-centroid assignment, same top-4 probe list, same in-bucket
    // ranking — reproduces the approximation (recall loss included).,
    "q193_event_sequences" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type FROM events),
        |r AS (SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM o),
        |p AS (SELECT user_id,
        |    array_to_string(list(event_type ORDER BY rn), ' ') AS seq
        |  FROM r WHERE rn <= 30 GROUP BY 1),
        |c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM o GROUP BY 1)
        |SELECT c.user_id, c.n_events, p.seq
        |FROM c JOIN p USING (user_id)
        |ORDER BY c.user_id""".stripMargin,

    // q190: cluster data card over the trained k-means partition
    // (q76's trainer CTEs verbatim). d2 milli-scales and entropy
    // terms nano-scale before cross-row sums; dominant-label ties
    // break on the lower label.,
    "q167_change_feed" ->
      """WITH o AS (SELECT o_orderkey AS order_id, o_orderstatus AS status,
        |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
        |    o_orderkey % 8 AS m FROM orders),
        |f AS (
        |  SELECT order_id,
        |    CASE WHEN m IN (4, 5) THEN 'insert'
        |         WHEN m = 3 AND order_id % 5 = 0 THEN 'delete'
        |         WHEN m = 3 AND order_id % 3 = 0 THEN 'update'
        |         WHEN m = 2 AND order_id % 5 = 0 THEN 'delete'
        |         END AS change_type,
        |    CASE WHEN m IN (3, 4) AND order_id % 3 = 0 THEN 'R'
        |         ELSE status END AS status2,
        |    CASE WHEN m IN (3, 4) AND order_id % 3 = 0 THEN cents + 100
        |         ELSE cents END AS cents2
        |  FROM o)
        |SELECT order_id, change_type,
        |  CASE WHEN change_type = 'delete' THEN NULL ELSE status2 END AS status,
        |  CASE WHEN change_type = 'delete' THEN NULL
        |       ELSE CAST(cents2 AS DOUBLE) / 100.0 END AS total_price
        |FROM f WHERE change_type IS NOT NULL
        |ORDER BY order_id NULLS FIRST""".stripMargin,

    "q168_time_travel" ->
      """WITH o AS (SELECT o_orderkey AS order_id, o_orderstatus AS status,
        |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
        |    o_orderkey % 8 AS m FROM orders),
        |live AS (SELECT order_id,
        |    CASE WHEN m <= 4 AND order_id % 3 = 0 THEN 'R'
        |         ELSE status END AS status,
        |    CASE WHEN m <= 4 AND order_id % 3 = 0 THEN cents + 100
        |         ELSE cents END AS cents
        |  FROM o WHERE m <= 5 AND NOT (m <= 3 AND order_id % 5 = 0))
        |SELECT status, COUNT(*) AS n_orders,
        |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_revenue
        |FROM live GROUP BY status ORDER BY status NULLS FIRST""".stripMargin,

    // q169: PSI drift. Per-bucket contributions floor-scale to BIGINT
    // nano-units BEFORE the per-type sum (exact integer reduction); the
    // ln/divide chain is the same IEEE expression tree on both engines.,
    "q51_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |ORDER BY c_custkey NULLS FIRST""".stripMargin,

    "q52_except_users" ->
      """SELECT user_id, CAST(ts AS DATE) AS view_date
        |FROM events WHERE event_type = 'view'
        |EXCEPT
        |SELECT user_id, CAST(ts AS DATE)
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id NULLS FIRST, view_date NULLS FIRST""".stripMargin,

    "q54_string_funcs" ->
      """SELECT c_custkey,
        |  upper(trim(c_name)) AS name_upper,
        |  substr(c_mktsegment, 1, 3) AS seg_prefix,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS name_num,
        |  c_mktsegment LIKE '%ING%' AS seg_ing
        |FROM customer ORDER BY c_custkey NULLS FIRST""".stripMargin,

    // Streaming SCD2 = the batch history minus surrogate keys (sink-time
    // global assignment by design).,
    "q57_intersect_days" ->
      """SELECT user_id, CAST(ts AS DATE) AS day
        |FROM events WHERE event_type = 'view'
        |INTERSECT
        |SELECT user_id, CAST(ts AS DATE)
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id NULLS FIRST, day NULLS FIRST""".stripMargin,

    // zip-style set-returning functions: generate_subscripts + unnest
    // advance in lockstep, mirroring posexplode's (pos, token) pairs.,
    "q59_salted_agg" ->
      s"""SELECT o_orderstatus, ${sum2("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders GROUP BY o_orderstatus
         |ORDER BY o_orderstatus NULLS FIRST""".stripMargin,

    // Dense date axis is GENERATED (generate_series), mirroring Spark's
    // sequence(min,max) explode; actuals left-join onto the grid.,
    "q60_gapfill_daily" ->
      s"""WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day,
         |    o_orderpriority AS priority, o_totalprice FROM orders),
         |b AS (SELECT min(day) AS lo, max(day) AS hi FROM o),
         |days AS (SELECT CAST(unnest(generate_series(lo, hi,
         |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
         |prios AS (SELECT DISTINCT priority FROM o),
         |actual AS (SELECT priority, day,
         |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents,
         |    COUNT(*) AS n FROM o GROUP BY 1, 2)
         |SELECT p.priority, d.day,
         |  COALESCE(CAST(cents AS DOUBLE) / 100.0, 0.0) AS revenue,
         |  COALESCE(n, 0) AS n_orders
         |FROM days d CROSS JOIN prios p
         |LEFT JOIN actual a ON a.priority = p.priority AND a.day = d.day
         |ORDER BY p.priority NULLS FIRST, d.day NULLS FIRST""".stripMargin,

    "q61_grouping_sets" ->
      s"""SELECT c_mktsegment, o_orderstatus,
         |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
         |  ${sum2("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
         |ORDER BY g_seg ASC, g_status ASC,
         |  c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    // percent_rank/cume_dist are single exact rational divisions of rank
    // integers — bit-identical across engines; ntile is BIGINT in DuckDB
    // vs INT in Spark, hence the cast.,
    "q62_ntile_ranks" ->
      s"""WITH rev AS (SELECT o_custkey,
         |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
         |  FROM orders GROUP BY 1)
         |SELECT o_custkey, CAST(cents AS DOUBLE) / 100.0 AS revenue,
         |  CAST(ntile(10) OVER w AS INT) AS decile,
         |  percent_rank() OVER w AS pct_rank,
         |  cume_dist() OVER w AS cume
         |FROM rev
         |WINDOW w AS (ORDER BY cents DESC, o_custkey ASC)
         |ORDER BY o_custkey NULLS FIRST""".stripMargin,

    // Rank key is the floor-scaled integer score (micro-units), term as
    // tiebreak — identical to the Spark side, so 1-ulp ln() divergence
    // cannot flip the ordering of mathematically-equal scores.,
    "q71_eventgen_agg" ->
      s"""WITH g AS (SELECT i AS event_id,
         |    ${h32("CAST(i AS VARCHAR)")} AS h
         |  FROM range(20000, 80000) t(i)),
         |e AS (SELECT event_id,
         |    TIMESTAMP '2024-01-01 00:00:00'
         |      + event_id * INTERVAL 1 SECOND AS ts,
         |    h % 500 AS user_id,
         |    ['view','cart','purchase','refund','support']
         |      [CAST((h // 500) % 5 AS INT) + 1] AS event_type,
         |    CAST(h % 10000 AS DOUBLE) / 100.0 AS value
         |  FROM g)
         |SELECT event_type, COUNT(*) AS n_events,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  ${sum2("value")} AS total_value,
         |  min(ts) AS first_ts
         |FROM e GROUP BY 1
         |ORDER BY event_type NULLS FIRST""".stripMargin,

    // The oracle is DuckDB's NATIVE ASOF JOIN (inclusive >=); the Spark
    // side's union-sort with the probe-flag tiebreak must match it.,
    "q72_asof_union" ->
      """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.ts AS purchase_ts, v.ts AS last_view_ts,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.user_id NULLS FIRST, purchase_ts NULLS FIRST""".stripMargin,

    // Incremental refresh must be indistinguishable from full
    // recompute — the oracle is the from-scratch aggregate.,
    "q73_incremental_agg" ->
      s"""SELECT c_mktsegment, ${sum2("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY c_mktsegment NULLS FIRST""".stripMargin,

    // q311: exact Shapley channel attribution — users collapse to a
    // 4-bit touched-channel mask, v(S) = conversions with mask ⊆ S,
    // weights carried as exact 24ths (k = 4); floats only at the
    // output boundary.,
    "q311_shapley_attribution" ->
      s"""WITH u AS (SELECT user_id,
         |    BIT_OR(CASE event_type WHEN 'click' THEN 1
         |      WHEN 'error' THEN 2 WHEN 'signup' THEN 4
         |      WHEN 'view' THEN 8 ELSE 0 END) AS mask,
         |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS conv
         |  FROM events GROUP BY 1),
         |m AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS mask_users,
         |    CAST(SUM(conv) AS BIGINT) AS mask_conv FROM u GROUP BY 1),
         |ss AS (SELECT CAST(i AS INT) AS s FROM range(16) t(i)),
         |v AS (SELECT s,
         |    CAST(COALESCE(SUM(m.mask_conv), 0) AS BIGINT) AS v
         |  FROM ss LEFT JOIN m ON (ss.s & m.mask) = m.mask GROUP BY 1),
         |ch(channel, bit) AS (VALUES ('click', 1), ('error', 2),
         |  ('signup', 4), ('view', 8)),
         |t AS (SELECT ch.channel,
         |    CASE bit_count(ss.s) WHEN 0 THEN 6 WHEN 1 THEN 2
         |      WHEN 2 THEN 2 ELSE 6 END AS w24,
         |    v2.v - v1.v AS marg
         |  FROM ch JOIN ss ON (ss.s & ch.bit) = 0
         |  JOIN v v1 ON v1.s = ss.s
         |  JOIN v v2 ON v2.s = (ss.s | ch.bit)),
         |phi AS (SELECT channel, CAST(SUM(w24 * marg) AS BIGINT)
         |    AS phi24 FROM t GROUP BY 1),
         |tu AS (SELECT ch.channel,
         |    CAST(COALESCE(SUM(m.mask_users), 0) AS BIGINT) AS n_users
         |  FROM ch LEFT JOIN m ON (m.mask & ch.bit) <> 0 GROUP BY 1),
         |tot AS (SELECT CAST(SUM(phi24) AS BIGINT) AS t24 FROM phi)
         |SELECT phi.channel, tu.n_users, phi.phi24,
         |  ${val6("CAST(phi24 AS DOUBLE) / 24.0")} AS phi,
         |  ${val6("CAST(phi24 AS DOUBLE) / CAST(t24 AS DOUBLE)")}
         |    AS share
         |FROM phi JOIN tu USING (channel) CROSS JOIN tot
         |ORDER BY channel NULLS FIRST""".stripMargin,

    // q317: the q71 generator arithmetic replayed under AGGREGATE
    // pushdown — counts and user_id sums exact longs, min/max doubles
    // order-free, so partial pre-aggregation in the readers cannot
    // change a single value.,
    "q317_eventgen_agg_pushdown" ->
      s"""WITH g AS (SELECT i AS event_id,
         |    ${h32("CAST(i AS VARCHAR)")} AS h
         |  FROM range(20000, 80000) t(i)),
         |e AS (SELECT event_id,
         |    h % 500 AS user_id,
         |    ['view','cart','purchase','refund','support']
         |      [CAST((h // 500) % 5 AS INT) + 1] AS event_type,
         |    CAST(h % 10000 AS DOUBLE) / 100.0 AS value
         |  FROM g)
         |SELECT event_type, COUNT(event_id) AS n_events,
         |  CAST(SUM(user_id) AS BIGINT) AS sum_uid,
         |  MIN(value) AS min_value, MAX(value) AS max_value
         |FROM e GROUP BY 1
         |ORDER BY event_type NULLS FIRST""".stripMargin,

    // q326: top-N pushdown — the top 50 descending ids of the pushed
    // range are a closed-form sub-range; the oracle regenerates
    // exactly those rows.,
    "q326_eventgen_topn_pushdown" ->
      s"""WITH g AS (SELECT i AS event_id,
         |    ${h32("CAST(i AS VARCHAR)")} AS h
         |  FROM range(79950, 80000) t(i))
         |SELECT event_id,
         |  TIMESTAMP '2024-01-01 00:00:00'
         |    + event_id * INTERVAL 1 SECOND AS ts,
         |  h % 500 AS user_id,
         |  ['view','cart','purchase','refund','support']
         |    [CAST((h // 500) % 5 AS INT) + 1] AS event_type,
         |  CAST(h % 10000 AS DOUBLE) / 100.0 AS value
         |FROM g ORDER BY event_id DESC""".stripMargin,

    // Stream-drain of the DSv2 micro-batch surface must equal batch
    // generation over the full id range (5 admission-controlled
    // triggers x 10k ids).,
    "q245_attribution" ->
      """WITH p0 AS (SELECT user_id, ts AS p_ts, event_id AS p_id,
        |    CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v_cents
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT *, LAG(p_ts) OVER (PARTITION BY user_id
        |    ORDER BY p_ts, p_id) AS prev_ts FROM p0),
        |t AS (SELECT user_id, event_type, ts AS t_ts, event_id AS t_id
        |  FROM events WHERE event_type IN ('view', 'click')),
        |j AS (SELECT p.p_id, p.v_cents, t.event_type, t.t_ts, t.t_id
        |  FROM p JOIN t ON p.user_id = t.user_id
        |  WHERE t.t_ts < p.p_ts
        |    AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
        |    AND (p.prev_ts IS NULL OR t.t_ts > p.prev_ts)),
        |c AS (SELECT p_id, v_cents, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY p_id
        |      ORDER BY t_ts, t_id) AS pos,
        |    COUNT(*) OVER (PARTITION BY p_id) AS n
        |  FROM j),
        |cr AS (SELECT p_id, event_type,
        |    CASE WHEN n = 1 THEN v_cents
        |      WHEN pos = 1 OR pos = n THEN (v_cents * 2) // 5
        |      ELSE (v_cents // 5) // (n - 2) END AS credit_cents
        |  FROM c)
        |SELECT event_type AS channel,
        |  CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_conversions,
        |  CAST(SUM(credit_cents) AS BIGINT) AS attributed_cents,
        |  CAST(SUM(credit_cents) AS DOUBLE) / 100.0 AS attributed
        |FROM cr GROUP BY 1
        |ORDER BY channel NULLS FIRST""".stripMargin,

    // q244: PRF/RM3-lite — BM25 pass 1, top-3 feedback docs, the 3
    // heaviest non-query terms (Σtf, ties lexicographic) appended,
    // re-scored with the identical nano-scaled contribution formula.,
    "q220_bot_score" ->
      s"""WITH g AS (SELECT user_id,
         |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS gap
         |  FROM events),
         |g2 AS (SELECT user_id, gap // 1000000 AS gs FROM g
         |  WHERE gap IS NOT NULL),
         |u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(gs) AS BIGINT) AS s1,
         |    CAST(SUM(gs * gs) AS BIGINT) AS s2
         |  FROM g2 GROUP BY 1 HAVING COUNT(*) >= 2),
         |c AS (SELECT user_id, n + 1 AS n_events, n, s1,
         |    CASE WHEN s1 > 0 THEN
         |      sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
         |        / CAST(s1 AS DOUBLE)
         |    ELSE 0.0 END AS cv
         |  FROM u)
         |SELECT user_id, n_events,
         |  ${val6("CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)")}
         |    AS mean_gap_s,
         |  ${val6("cv")} AS gap_cv, cv < 0.85 AS suspicious
         |FROM c ORDER BY user_id NULLS FIRST""".stripMargin,

    // Spark session_window semantics: an event exactly `gap` after the
    // previous STARTS a new session (strict containment in [ts, ts+gap)),
    // and window end = last_ts + gap. Integer epoch-µs gap test.,
    "q77_session_window" -> sessionWindowOracle,

    // q106: the SAME sessions, computed by the streaming engine in
    // append mode (sentinel-flushed bounded replay) — one oracle.,
    "q79_unpivot" ->
      """WITH w AS (
        |  SELECT user_id,
        |    COUNT(*) FILTER (event_type = 'signup') AS n_signup,
        |    COUNT(*) FILTER (event_type = 'view') AS n_view,
        |    COUNT(*) FILTER (event_type = 'click') AS n_click,
        |    COUNT(*) FILTER (event_type = 'purchase') AS n_purchase
        |  FROM events GROUP BY user_id),
        |l AS (
        |  SELECT user_id, 'signup' AS stage, n_signup AS n_events FROM w
        |  UNION ALL SELECT user_id, 'view', n_view FROM w
        |  UNION ALL SELECT user_id, 'click', n_click FROM w
        |  UNION ALL SELECT user_id, 'purchase', n_purchase FROM w)
        |SELECT user_id, stage, n_events FROM l WHERE n_events > 0
        |ORDER BY user_id NULLS FIRST, stage NULLS FIRST""".stripMargin,

    // The bloom prefilter is result-transparent (exact IN-join removes
    // false positives), so the oracle is the plain semi join.,
    "q81_bloom_prune" ->
      s"""WITH keys AS (
         |  SELECT s_suppkey FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3')
         |SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         |  ${sum4("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |WHERE l_suppkey IN (SELECT s_suppkey FROM keys)
         |GROUP BY 1 ORDER BY 1 ASC NULLS FIRST""".stripMargin,

    // percentile_disc returns ACTUAL data values — exact quantiles with
    // no cross-engine interpolation hazard.,
    "q80_percentile_disc" ->
      """SELECT p_brand,
        |  quantile_disc(p_retailprice, 0.25) AS p25,
        |  quantile_disc(p_retailprice, 0.5) AS p50,
        |  quantile_disc(p_retailprice, 0.9) AS p90,
        |  COUNT(*) AS n
        |FROM part GROUP BY p_brand
        |ORDER BY p_brand ASC NULLS FIRST""".stripMargin,

    // Second moments from exact integer power sums: the float formula
    // runs once per group on exactly-known operands, so the IEEE op
    // sequence (and the result) is identical in both engines.,
    "q82_moments" -> {
      val nD = "CAST(n AS DOUBLE)"
      val varx = s"$nD * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
      val vary = s"$nD * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
      val covNum = s"$nD * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
      s"""WITH s AS (
         |  SELECT l_linestatus, COUNT(*) AS n,
         |    SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS sx,
         |    SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS sy,
         |    SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)
         |      * CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS sxx,
         |    SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)
         |      * CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS syy,
         |    SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)
         |      * CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS sxy
         |  FROM lineitem GROUP BY 1)
         |SELECT l_linestatus, n,
         |  ${val6(s"SQRT($varx) / $nD / 100.0")} AS stddev_qty,
         |  ${val6(s"SQRT($vary) / $nD")} AS stddev_price,
         |  ${val6(s"($covNum) / (SQRT($varx) * SQRT($vary))")} AS corr_qty_price
         |FROM s ORDER BY l_linestatus ASC NULLS FIRST""".stripMargin
    },

    // Dedup-first + brand blocking: the quadratic runs over DISTINCT
    // names per brand. levenshtein is integer DP — exact in any engine.,
    "q83_fuzzy_names" ->
      """WITH names AS (SELECT DISTINCT p_brand, p_name FROM part)
        |SELECT a.p_brand, a.p_name AS name_a, b.p_name AS name_b,
        |  levenshtein(a.p_name, b.p_name) AS edit_dist
        |FROM names a JOIN names b
        |  ON a.p_brand = b.p_brand AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a.p_brand ASC NULLS FIRST, name_a ASC NULLS FIRST,
        |  name_b ASC NULLS FIRST""".stripMargin,

    // q323: the banded-Levenshtein serve of the same join — the oracle
    // states the BUILTIN full-matrix form; lev_bounded(a,b,k) <= k is
    // exactly levenshtein(a,b) <= k by construction.,
    "q323_fuzzy_names_banded" ->
      """WITH names AS (SELECT DISTINCT p_brand, p_name FROM part)
        |SELECT a.p_brand, a.p_name AS name_a, b.p_name AS name_b,
        |  levenshtein(a.p_name, b.p_name) AS edit_dist
        |FROM names a JOIN names b
        |  ON a.p_brand = b.p_brand AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a.p_brand ASC NULLS FIRST, name_a ASC NULLS FIRST,
        |  name_b ASC NULLS FIRST""".stripMargin,

    // RANGE frame over an integer epoch-day key: identical frame
    // boundaries in both engines; windowed sum over integer cents.,
    "q84_range_frame" ->
      """WITH daily AS (
        |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS order_date,
        |    SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS day_cents,
        |    DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num
        |  FROM orders GROUP BY 1, 2, 4)
        |SELECT o_orderpriority, order_date,
        |  CAST(day_cents AS DOUBLE) / 100.0 AS revenue,
        |  CAST(SUM(day_cents) OVER (PARTITION BY o_orderpriority
        |    ORDER BY day_num ASC
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
        |    AS revenue_7d
        |FROM daily
        |ORDER BY o_orderpriority ASC NULLS FIRST,
        |  order_date ASC NULLS FIRST""".stripMargin,

    // Bag semantics: EXCEPT ALL / INTERSECT ALL preserve multiplicity.,
    "q85_bag_ops" ->
      """WITH v AS (SELECT user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |exc AS (SELECT * FROM v EXCEPT ALL SELECT * FROM p),
        |ovl AS (SELECT * FROM v INTERSECT ALL SELECT * FROM p)
        |SELECT 'except_all' AS op, user_id, COUNT(*) AS n_rows
        |FROM exc GROUP BY 2
        |UNION ALL
        |SELECT 'intersect_all' AS op, user_id, COUNT(*) AS n_rows
        |FROM ovl GROUP BY 2
        |ORDER BY op ASC NULLS FIRST, user_id ASC NULLS FIRST""".stripMargin,

    // The Misra-Gries candidate phase is result-transparent (phase 2
    // recounts exactly), so the oracle is the plain group-filter.,
    "q94_heavy_hitters" ->
      s"""WITH t AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
         |s AS (SELECT CAST(SUM(c) AS BIGINT) AS total, COUNT(*) AS nd FROM t)
         |SELECT user_id, c AS n_events,
         |  ${val6("CAST(c AS DOUBLE) / total")} AS share
         |FROM t, s
         |WHERE CAST(c AS DOUBLE) * nd > 1.25 * total
         |ORDER BY user_id ASC NULLS FIRST""".stripMargin,

    "q101_string_funcs2" ->
      """SELECT c_custkey,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |  rpad(c_mktsegment, 12, '.') AS seg_padded,
        |  split_part(c_name, '#', 2) AS name_num,
        |  repeat(left(c_mktsegment, 1), 3) AS seg_echo,
        |  reverse(c_name) AS name_rev,
        |  CAST(ascii(c_mktsegment) AS BIGINT) AS seg_ascii,
        |  CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
        |  right(c_name, 4) AS key_tail,
        |  concat_ws('|', c_mktsegment, c_name) AS joined
        |FROM customer ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    // Same exact-integer-power-sums machinery as q82; the closed-form
    // slope/intercept evaluate once per group on exact operands.,
    "q102_regression" -> {
      val nD = "CAST(n AS DOUBLE)"
      val slope = s"($nD * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
        s" / ($nD * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
      s"""WITH s AS (
         |  SELECT o_orderpriority, COUNT(*) AS n,
         |    SUM(DATEDIFF('day', DATE '1970-01-01',
         |      CAST(o_orderdate AS DATE))) AS sx,
         |    SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS sy,
         |    SUM(DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |      * DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
         |      AS sxx,
         |    SUM(DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |      * CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS sxy
         |  FROM orders GROUP BY 1)
         |SELECT o_orderpriority, n,
         |  ${val6(slope)} AS slope_per_day,
         |  ${val6(s"(CAST(sy AS DOUBLE) - ($slope) * CAST(sx AS DOUBLE)) / $nD")}
         |    AS intercept
         |FROM s ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin
    },

    // Offset and keyset pagination must agree on the page contents.,
    "q108_pagination" ->
      """WITH ranked AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer
        |  ORDER BY c_custkey LIMIT 20 OFFSET 40),
        |boundary AS (
        |  SELECT MAX(c_custkey) AS b FROM (
        |    SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 40)),
        |keyset AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer, boundary
        |  WHERE c_custkey > b ORDER BY c_custkey LIMIT 20)
        |SELECT 'offset' AS method, c_custkey, c_name, c_acctbal FROM ranked
        |UNION ALL
        |SELECT 'keyset', c_custkey, c_name, c_acctbal FROM keyset
        |ORDER BY method ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,

    // The Morton ladder is five exact integer ops per dimension —
    // identical bit arithmetic in both engines.,
    "q107_zorder" -> {
      import graft.util.ZOrder
      val z = ZOrder.Sql.morton("x", "y")
      s"""WITH d AS (
         |  SELECT o_custkey % 65536 AS x,
         |    DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |      % 65536 AS y
         |  FROM orders)
         |SELECT ($z >> 16) AS z_bucket, COUNT(*) AS n_rows,
         |  MIN(x) AS min_cust, MAX(x) AS max_cust,
         |  MIN(y) AS min_day, MAX(y) AS max_day
         |FROM d GROUP BY 1
         |ORDER BY z_bucket ASC NULLS FIRST""".stripMargin
    },

    // Adjacent-pair generation: Spark sequence(0, n-2) over 1-based
    // element_at ≡ DuckDB range(1, len) over 1-based list index.,
    "q103_pivot_multi" ->
      s"""SELECT user_id,
         |  CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
         |    AS view_n,
         |  COALESCE(CAST(SUM(CASE WHEN event_type = 'view'
         |    THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) END)
         |    AS DOUBLE) / 100.0, 0.0) AS view_value,
         |  CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
         |    AS purchase_n,
         |  COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
         |    THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) END)
         |    AS DOUBLE) / 100.0, 0.0) AS purchase_value
         |FROM events GROUP BY user_id
         |ORDER BY user_id ASC NULLS FIRST""".stripMargin,

    // NULL FKs are orphans in both engines (null never equals a key).,
    "q98_ri_audit" -> {
      def e(name: String, child: String, fk: String,
          parent: String, pk: String) =
        s"""SELECT '$name' AS fk_edge,
           |  (SELECT COUNT(*) FROM $child) AS n_child,
           |  (SELECT COUNT(*) FROM $child c WHERE NOT EXISTS
           |    (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk)) AS n_orphans""".stripMargin
      Seq(
        e("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        e("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        e("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        e("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        e("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
        e("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        e("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge ASC NULLS FIRST")
    },

    // Exact integer-µs gaps until the final division; median/percentile
    // interpolate identically on integers (the q15-proven path).,
    "q100_topk_per_group" ->
      """SELECT p_brand, p_partkey, p_name, p_retailprice,
        |  CAST(rank AS BIGINT) AS rank
        |FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC NULLS LAST, p_partkey ASC
        |        NULLS FIRST) AS rank
        |  FROM part)
        |WHERE rank <= 3
        |ORDER BY p_brand ASC NULLS FIRST, rank ASC NULLS FIRST""".stripMargin,

    // Regenerates the synthetic media payloads (md5 chains) as hex
    // strings; Spark's binary ops land on the same values via
    // lower(hex(bytes)). First 2 bytes == first 4 hex chars.,
    "q96_kmv_setops" -> {
      val est = (n: String, kth: String) =>
        s"CAST(CASE WHEN $n < 64 THEN $n ELSE " +
          s"(63 * 4294967296) // GREATEST($kth, 1) END AS BIGINT)"
      s"""WITH a AS (SELECT DISTINCT ${h32("CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events WHERE event_type = 'view'),
         |b AS (SELECT DISTINCT ${h32("CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events WHERE event_type = 'purchase'),
         |ska AS (SELECT hv FROM a ORDER BY hv LIMIT 64),
         |skb AS (SELECT hv FROM b ORDER BY hv LIMIT 64),
         |sku AS (SELECT hv FROM (SELECT hv FROM ska UNION
         |  SELECT hv FROM skb) ORDER BY hv LIMIT 64),
         |raw AS (SELECT
         |  (SELECT COUNT(*) FROM a) AS nda,
         |  (SELECT COUNT(*) FROM b) AS ndb,
         |  (SELECT COUNT(*) FROM (SELECT hv FROM a UNION SELECT hv FROM b))
         |    AS ndu,
         |  (SELECT COUNT(*) FROM a JOIN b USING (hv)) AS ndi,
         |  (SELECT MAX(hv) FROM ska) AS ka_kth,
         |  (SELECT COUNT(*) FROM ska) AS ka_n,
         |  (SELECT MAX(hv) FROM skb) AS kb_kth,
         |  (SELECT COUNT(*) FROM skb) AS kb_n,
         |  (SELECT MAX(hv) FROM sku) AS ku_kth,
         |  (SELECT COUNT(*) FROM sku) AS ku_n,
         |  (SELECT COUNT(*) FROM sku WHERE hv IN (SELECT hv FROM ska)
         |     AND hv IN (SELECT hv FROM skb)) AS shared),
         |l1 AS (SELECT CAST(nda AS BIGINT) AS exact_view,
         |  ${est("ka_n", "ka_kth")} AS est_view,
         |  CAST(ndb AS BIGINT) AS exact_purchase,
         |  ${est("kb_n", "kb_kth")} AS est_purchase,
         |  CAST(ndu AS BIGINT) AS exact_union,
         |  ${est("ku_n", "ku_kth")} AS est_union,
         |  CAST(ndi AS BIGINT) AS exact_intersection,
         |  CAST(shared AS BIGINT) AS n_shared, ku_n FROM raw)
         |SELECT exact_view, est_view, exact_purchase, est_purchase,
         |  exact_union, est_union, exact_intersection,
         |  CAST((n_shared * est_union) // ku_n AS BIGINT)
         |    AS est_intersection,
         |  CAST(CAST(FLOOR(CAST(n_shared AS DOUBLE) / ku_n * 1000000.0
         |    + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS jaccard_est
         |FROM l1""".stripMargin
    },

    // Frames pinned explicitly: last_value's default frame stops at
    // CURRENT ROW in both engines — the full-frame form is spelled out.,
    "q95_window_nav" ->
      """SELECT user_id, ts, event_id, value,
        |  lag(value, 1, -1.0) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC) AS prev_value,
        |  lead(value, 1, -1.0) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC) AS next_value,
        |  first_value(value) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS first_value,
        |  nth_value(value, 2) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS second_value,
        |  last_value(value) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS final_value
        |FROM events WHERE user_id < 50
        |ORDER BY user_id ASC NULLS FIRST, ts ASC NULLS FIRST,
        |  event_id ASC NULLS FIRST""".stripMargin,

    "q91_full_outer" ->
      """WITH v AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n_views
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT COALESCE(v.user_id, p.user_id) AS user_id,
        |  COALESCE(v.day, p.day) AS day,
        |  COALESCE(v.n_views, 0) AS n_views,
        |  COALESCE(p.n_purchases, 0) AS n_purchases,
        |  CASE WHEN v.user_id IS NULL THEN 'purchase_only'
        |       WHEN p.user_id IS NULL THEN 'view_only'
        |       ELSE 'both' END AS presence
        |FROM v FULL OUTER JOIN p
        |  ON v.user_id = p.user_id AND v.day = p.day
        |ORDER BY user_id ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin,

    // Correlated scalar + EXISTS; both engines decorrelate to joins.
    // acctbal flows through raw (comparisons only — no arithmetic).,
    "q92_correlated" ->
      """SELECT c_custkey, c_acctbal,
        |  (SELECT MAX(c2.c_acctbal) FROM customer c2
        |   WHERE c2.c_nationkey = c.c_nationkey) AS nation_max
        |FROM customer c
        |WHERE c_acctbal > 9000.0
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    // Spark sequence(0, n-1, 40) ≡ DuckDB range(0, n, 40) for n ≥ 1
    // (split always yields ≥1 token); slice ends clamp identically.,
    "q89_date_funcs" ->
      """WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT d, quarter(d) AS qtr, dayofweek(d) + 1 AS dow,
        |  dayofyear(d) AS doy, weekofyear(d) AS iso_week,
        |  last_day(d) AS month_end,
        |  CAST(d + INTERVAL 1 MONTH AS DATE) AS next_month,
        |  CAST(date_trunc('month', d) AS DATE) AS month_start,
        |  d + 7 AS plus_week
        |FROM d ORDER BY d ASC NULLS FIRST""".stripMargin,

    "q90_cond_bitwise" ->
      s"""SELECT l_returnflag,
         |  ${sum2("GREATEST(l_extendedprice, l_quantity * 1000.0)")} AS sum_greatest,
         |  ${sum2("LEAST(l_extendedprice, l_quantity * 1000.0)")} AS sum_least,
         |  CAST(COUNT(NULLIF(l_linestatus, 'O')) AS BIGINT) AS n_not_open,
         |  bit_and(CAST(l_linenumber AS BIGINT)) AS mask_and,
         |  bit_or(CAST(l_linenumber AS BIGINT)) AS mask_or,
         |  bit_xor(CAST(l_linenumber AS BIGINT)) AS mask_xor,
         |  MAX(CASE WHEN l_discount > 0.05 THEN l_discount ELSE 0.0 END)
         |    AS max_hi_disc
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    // AvailableNow drains the bounded input, so the stream-stream join
    // must equal the batch range self-join.,
    "q87_jaro_winkler" -> {
      val jw = val6("jaro_winkler_similarity(a.p_name, b.p_name)")
      s"""WITH names AS (SELECT DISTINCT p_brand, p_name FROM part)
         |SELECT a.p_brand, a.p_name AS name_a, b.p_name AS name_b,
         |  $jw AS jw
         |FROM names a JOIN names b
         |  ON a.p_brand = b.p_brand AND a.p_name < b.p_name
         |WHERE $jw >= 0.9
         |ORDER BY a.p_brand ASC NULLS FIRST, name_a ASC NULLS FIRST,
         |  name_b ASC NULLS FIRST""".stripMargin
    },

    // Array sweep emitted as scalars (csv/counts/flags) — exercises the
    // list pipeline without parquet list-hashing concerns.,
    "q86_array_funcs" ->
      """WITH t AS (
        |  SELECT user_id, list_sort(list(DISTINCT event_type)) AS types
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1)
        |SELECT user_id, array_to_string(types, ',') AS types_csv,
        |  CAST(len(types) AS BIGINT) AS n_types,
        |  types[1] AS first_type,
        |  list_contains(types, 'purchase') AS has_purchase
        |FROM t ORDER BY user_id ASC NULLS FIRST""".stripMargin,

    // Rolling 7-day distinct users: the oracle materializes the same
    // contribution fan-out (pair visible in 7 window-end days) — the
    // only scalable form of sliding-window COUNT(DISTINCT).,
    "q109_rolling_distinct" ->
      """WITH pairs AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d AS day FROM pairs),
        |contrib AS (
        |  SELECT p.d, p.user_id, p.d + CAST(i.i AS INT) AS day
        |  FROM pairs p CROSS JOIN (SELECT unnest(range(0, 7)) AS i) i)
        |SELECT c.day, COUNT(DISTINCT c.user_id) AS wau,
        |  COUNT(DISTINCT CASE WHEN c.day = c.d THEN c.user_id END) AS dau
        |FROM contrib c JOIN days USING (day)
        |GROUP BY c.day ORDER BY day NULLS FIRST""".stripMargin,

    // Entropy via H = ln N − (Σ c·ln c)/N: one ln per distinct term,
    // floor-scaled to integer millionths before the (exact, BIGINT)
    // cross-row sum — float ops happen in identical order in both
    // engines regardless of parallelism.,
    "q115_lateral_topk" ->
      """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.top_price
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice AS top_price
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC
        |  LIMIT 2) t ON TRUE
        |ORDER BY c.c_custkey NULLS FIRST, top_price DESC NULLS LAST,
        |  o_orderkey NULLS FIRST""".stripMargin,

    // Map surface emitted as scalars/JSON text; the sorted entry array
    // pins Spark's map iteration order so counts_json is canonical.,
    "q116_map_funcs" ->
      """WITH c AS (
        |  SELECT user_id, event_type, COUNT(*) AS n FROM events
        |  WHERE event_type IS NOT NULL GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_keys,
        |  string_agg(event_type, ',' ORDER BY event_type) AS keys_csv,
        |  CAST(SUM(n) AS BIGINT) AS total_events,
        |  CAST(COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN n END), 0)
        |    AS BIGINT) AS n_purchase,
        |  '{' || string_agg('"' || event_type || '":' || n, ','
        |    ORDER BY event_type) || '}' AS counts_json
        |FROM c GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    // JSON round trip: the oracle REBUILDS Spark's canonical to_json
    // text by string aggregation (integer fields only — float text
    // rendering is not engine-portable), then derives the aggregates
    // from the raw columns.,
    "q117_json_roundtrip" ->
      """WITH it AS (
        |  SELECT l_orderkey AS order_id, l_linenumber AS ln,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem WHERE l_orderkey < 500)
        |SELECT order_id,
        |  '{"order_id":' || order_id || ',"items":[' ||
        |    string_agg('{"ln":' || ln || ',"qty":' || qty || '}', ','
        |      ORDER BY ln, qty) || ']}' AS doc,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(qty) AS BIGINT) AS qty_sum
        |FROM it GROUP BY order_id ORDER BY order_id NULLS FIRST""".stripMargin,

    // Sketch envelope gates: the Spark side emits the exact value plus
    // within-bound booleans; the oracle recomputes the exact value and
    // asserts the verdicts TRUE, so an estimator drifting out of its
    // published error bound fails the hash gate.,
    "q118_hll_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
        |  TRUE AS direct_within_5pct, TRUE AS merged_within_5pct
        |FROM events GROUP BY event_type
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    "q119_approx_quantiles" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  TRUE AS p50_within_1pct, TRUE AS p99_within_1pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    // DPP query: the oracle is the plain predicate form — partition
    // pruning must not change results, only the partitions scanned.,
    "q114_dpp_revenue" ->
      s"""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         |  ${sum4(netExpr)} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |WHERE year(l_shipdate) = 1996 AND quarter(l_shipdate) = 1
         |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,

    "q120_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |anch AS (
        |  SELECT user_id, d,
        |    d - CAST(ROW_NUMBER() OVER (
        |      PARTITION BY user_id ORDER BY d NULLS FIRST) AS INT) AS anchor
        |  FROM days),
        |runs AS (
        |  SELECT user_id, anchor, COUNT(*) AS len, MIN(d) AS run_start
        |  FROM anch GROUP BY user_id, anchor)
        |SELECT user_id, MAX(len) AS max_streak, COUNT(*) AS n_streaks,
        |  MIN(run_start) AS first_active
        |FROM runs GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    // BFS over the basket co-occurrence graph, recursive-CTE form on
    // BOTH engines; bounded at 3 hops with MIN(hop) folding the walk
    // multiplicity back to exact distances.,
    "q122_activity_bitmap" ->
      """WITH b AS (
        |  SELECT user_id,
        |    bit_or(1::BIGINT <<
        |      (CAST(CAST(ts AS DATE) - DATE '1995-01-01' AS INT) % 64))
        |      AS bitmap
        |  FROM events GROUP BY user_id)
        |SELECT user_id, bitmap, CAST(bit_count(bitmap) AS INT) AS active_slots
        |FROM b ORDER BY user_id NULLS FIRST""".stripMargin,

    // q299: Markov absorption over q123's matrix, purchase absorbing —
    // micro-unit transition probabilities, per-edge floor before each
    // integer sum, 4 unrolled value-iteration rounds (correlated
    // scalar sums over the ≤|types|² matrix).,
    "q299_funnel_absorption" -> {
      val rounds = (1 to 4).map { t =>
        s"""v$t AS (SELECT s.state,
           |    CASE WHEN s.state = 'purchase' THEN CAST(1000000 AS BIGINT)
           |    ELSE COALESCE((SELECT CAST(SUM((p.p6 * w.v) // 1000000)
           |        AS BIGINT)
           |      FROM p JOIN v${t - 1} w ON w.state = p.to_type
           |      WHERE p.from_type = s.state), 0) END AS v
           |  FROM st s)""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (
         |  SELECT user_id, event_type, lead(event_type) OVER (
         |    PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS next_type
         |  FROM events),
         |c AS (
         |  SELECT event_type AS from_type, next_type AS to_type,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
         |outd AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS out_n
         |  FROM c GROUP BY 1),
         |p AS (SELECT from_type, to_type, (n * 1000000) // out_n AS p6
         |  FROM c JOIN outd USING (from_type)),
         |st AS (SELECT from_type AS state FROM p
         |  UNION SELECT to_type FROM p),
         |v0 AS (SELECT state, CASE WHEN state = 'purchase'
         |    THEN CAST(1000000 AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS v FROM st),
         |$rounds
         |SELECT st.state, v1.v AS r1, v2.v AS r2, v3.v AS r3, v4.v AS r4,
         |  CAST(v4.v AS DOUBLE) / 1000000.0 AS p_within_4
         |FROM st JOIN v1 USING (state) JOIN v2 USING (state)
         |  JOIN v3 USING (state) JOIN v4 USING (state)
         |ORDER BY state NULLS FIRST""".stripMargin
    },

    // q300: Markov removal-effect attribution — the q299 machinery
    // plus a channel-keyed removed-chain value iteration (CROSS JOIN
    // over the ≤|types| channel set) and a first-event start
    // distribution; removal effect = 10⁶ − (p_rem·10⁶ // p_base).,
    "q300_markov_attribution" -> {
      val baseRounds = (1 to 4).map { t =>
        s"""v$t AS (SELECT s.state,
           |    CASE WHEN s.state = 'purchase' THEN CAST(1000000 AS BIGINT)
           |    ELSE COALESCE((SELECT CAST(SUM((p.p6 * w.v) // 1000000)
           |        AS BIGINT)
           |      FROM p JOIN v${t - 1} w ON w.state = p.to_type
           |      WHERE p.from_type = s.state), 0) END AS v
           |  FROM st s)""".stripMargin
      }.mkString(",\n")
      val chanRounds = (1 to 4).map { t =>
        s"""w$t AS (SELECT c.channel, s.state,
           |    CASE WHEN s.state = 'purchase' THEN CAST(1000000 AS BIGINT)
           |    ELSE COALESCE((SELECT CAST(SUM((p.p6 * w.v) // 1000000)
           |        AS BIGINT)
           |      FROM p JOIN w${t - 1} w ON w.channel = c.channel
           |        AND w.state = p.to_type
           |      WHERE p.from_type = s.state AND p.from_type <> c.channel
           |        AND p.to_type <> c.channel), 0) END AS v
           |  FROM ch c CROSS JOIN st s)""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (
         |  SELECT user_id, event_type, lead(event_type) OVER (
         |    PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS next_type
         |  FROM events),
         |c AS (
         |  SELECT event_type AS from_type, next_type AS to_type,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
         |outd AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS out_n
         |  FROM c GROUP BY 1),
         |p AS (SELECT from_type, to_type, (n * 1000000) // out_n AS p6
         |  FROM c JOIN outd USING (from_type)),
         |st AS (SELECT from_type AS state FROM p
         |  UNION SELECT to_type FROM p),
         |ch AS (SELECT state AS channel FROM st
         |  WHERE state <> 'purchase'),
         |v0 AS (SELECT state, CASE WHEN state = 'purchase'
         |    THEN CAST(1000000 AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS v FROM st),
         |$baseRounds,
         |w0 AS (SELECT c.channel, s.state, CASE WHEN s.state = 'purchase'
         |    THEN CAST(1000000 AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS v
         |  FROM ch c CROSS JOIN st s),
         |$chanRounds,
         |fe AS (SELECT event_type AS state FROM (
         |    SELECT event_type, ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS rn
         |    FROM events) WHERE rn = 1),
         |pi AS (SELECT state, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM fe GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS users FROM pi),
         |pi6 AS (SELECT state, (cnt * 1000000) // users AS pi6
         |  FROM pi CROSS JOIN tot),
         |pb AS (SELECT CAST(SUM((pi6.pi6 * v4.v) // 1000000) AS BIGINT)
         |    AS p_base6
         |  FROM pi6 JOIN v4 USING (state)),
         |pr AS (SELECT channel,
         |    CAST(SUM((pi6.pi6 * w4.v) // 1000000) AS BIGINT) AS p_rem6
         |  FROM w4 JOIN pi6 USING (state) GROUP BY 1)
         |SELECT channel, p_base6, p_rem6,
         |  1000000 - (p_rem6 * 1000000) // p_base6 AS re6,
         |  CAST(1000000 - (p_rem6 * 1000000) // p_base6 AS DOUBLE)
         |    / 1000000.0 AS removal_effect
         |FROM pr CROSS JOIN pb ORDER BY channel NULLS FIRST""".stripMargin
    },

    "q123_markov_transitions" ->
      s"""WITH seq AS (
         |  SELECT user_id, event_type, lead(event_type) OVER (
         |    PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS next_type
         |  FROM events),
         |c AS (
         |  SELECT event_type AS from_type, next_type AS to_type,
         |    COUNT(*) AS n
         |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
         |SELECT from_type, to_type, n,
         |  ${val4("CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type)")} AS p
         |FROM c ORDER BY from_type NULLS FIRST, to_type NULLS FIRST""".stripMargin,

    // The oracle states the SEMANTICS (quadratic NOT EXISTS dominance);
    // the engine runs the O(n log n) running-max frontier form.,
    "q124_skyline" ->
      """SELECT p_partkey, p_brand, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p_retailprice NULLS FIRST, p_partkey NULLS FIRST""".stripMargin,

    // Bucketed-layout join: results must equal the plain-table join —
    // the layout only removes the exchanges.,
    "q125_bucketed_join" ->
      s"""SELECT o_orderpriority,
         |  ${sum4(netExpr)} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST""".stripMargin,

    // transformWithState drain: the last per-key snapshot equals the
    // batch aggregate (state folds exact integer cents).,
    "q128_cdc_apply" ->
      s"""WITH o AS (SELECT * FROM orders WHERE o_orderkey < 2000),
         |log AS (
         |  SELECT o_orderkey AS order_id, 'I' AS op, o_orderdate AS op_ts,
         |    o_totalprice AS price, o_orderstatus AS status FROM o
         |  UNION ALL
         |  SELECT o_orderkey, 'U', o_orderdate + INTERVAL 30 DAY,
         |    ${val2("o_totalprice * CAST(1.1 AS DOUBLE)")}, o_orderstatus
         |  FROM o WHERE o_orderstatus = 'F'
         |  UNION ALL
         |  SELECT o_orderkey, 'D', o_orderdate + INTERVAL 60 DAY,
         |    NULL, NULL FROM o WHERE o_custkey % 97 = 0),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY order_id
         |    ORDER BY op_ts DESC,
         |      CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 ELSE 1 END DESC)
         |    AS rn
         |  FROM log)
         |SELECT order_id, op AS last_op, ${val2("price")} AS final_price,
         |  status
         |FROM r WHERE rn = 1 AND op <> 'D'
         |ORDER BY order_id NULLS FIRST""".stripMargin,

    "q129_recent_views" ->
      """SELECT user_id, event_id, ts, recent_views FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts)
        |      RANGE BETWEEN 1800000000 PRECEDING AND 1 PRECEDING),
        |      0) AS BIGINT) AS recent_views
        |  FROM events)
        |WHERE event_type = 'purchase'
        |ORDER BY user_id NULLS FIRST, ts NULLS FIRST,
        |  event_id NULLS FIRST""".stripMargin,

    // SQL UDFs inline at analysis time — the oracle states the math.,
    "q130_sql_udf" ->
      s"""SELECT l_returnflag,
         |  ${sum4(netExpr)} AS net_revenue,
         |  ${val4("AVG(l_quantity)")} AS avg_qty,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag NULLS FIRST""".stripMargin,

    "q131_listagg" ->
      """SELECT r_name AS region,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name NULLS FIRST""".stripMargin,

    "q132_variant_props" ->
      """SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    "q133_try_arith" ->
      s"""WITH s AS (
         |  SELECT user_id, COUNT(*) AS n_events,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purchases,
         |    SUM(CASE WHEN event_type = 'purchase'
         |      THEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
         |      ELSE 0 END) AS cents
         |  FROM events GROUP BY user_id)
         |SELECT user_id, n_events, n_purchases,
         |  CAST(cents AS DOUBLE) / 100.0 AS purchase_value,
         |  ${val4("CASE WHEN n_purchases = 0 THEN NULL " +
             "ELSE CAST(cents AS DOUBLE) / 100.0 / n_purchases END")}
         |    AS avg_purchase
         |FROM s ORDER BY user_id NULLS FIRST""".stripMargin,

    "q134_decimal_money" ->
      s"""WITH c AS (
         |  SELECT o_orderstatus,
         |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM orders)
         |SELECT o_orderstatus,
         |  CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_revenue,
         |  ${val4("CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*)")}
         |    AS avg_revenue,
         |  COUNT(*) AS n_orders
         |FROM c GROUP BY o_orderstatus
         |ORDER BY o_orderstatus NULLS FIRST""".stripMargin,

    // foreachBatch merge: the accumulated target must equal the batch
    // aggregate.,
    "q151_merge_upsert_delete" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 6 = 0 THEN 'M' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  o_totalprice
        |FROM orders
        |WHERE o_orderkey % 3 = 0 AND o_orderkey % 9 <> 0
        |ORDER BY o_orderkey NULLS FIRST""".stripMargin,

    // both snapshot derivations are deterministic, so the oracle's
    // FULL OUTER fingerprint compare rebuilds the identical diff,
    "q260_session_trigrams" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
         |sess AS (
         |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM flagged),
         |tri AS (
         |  SELECT session_id, event_type AS step1,
         |    lead(event_type, 1) OVER w2 AS step2,
         |    lead(event_type, 2) OVER w2 AS step3,
         |    lead(session_id, 2) OVER w2 AS s3
         |  FROM sess
         |  WINDOW w2 AS (PARTITION BY user_id
         |    ORDER BY ts NULLS FIRST, event_id NULLS FIRST)),
         |c AS (SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tri WHERE s3 IS NOT NULL AND s3 = session_id
         |  GROUP BY 1, 2, 3),
         |r AS (SELECT *,
         |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC,
         |      step1 NULLS FIRST, step2 NULLS FIRST, step3 NULLS FIRST)
         |      AS BIGINT) AS rank,
         |    CAST(SUM(n) OVER () AS BIGINT) AS tot
         |  FROM c)
         |SELECT rank, step1, step2, step3, n,
         |  ${val6("CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)")} AS share
         |FROM r WHERE rank <= 20 ORDER BY rank NULLS FIRST""".stripMargin,

    // q261: grouped exact quartiles off the per-brand cents histogram;
    // Tukey fences scaled by 2 to stay integral.,
    "q276_ordered_funnel" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type
         |  FROM events),
         |t1 AS (SELECT user_id, MIN(us) AS t FROM e
         |  WHERE event_type = 'signup' GROUP BY 1),
         |t2 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t1) p USING (user_id)
         |  WHERE event_type = 'view' AND us > tp GROUP BY 1),
         |t3 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t2) p USING (user_id)
         |  WHERE event_type = 'click' AND us > tp GROUP BY 1),
         |t4 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t3) p USING (user_id)
         |  WHERE event_type = 'purchase' AND us > tp GROUP BY 1),
         |c AS (
         |  SELECT 'signup' AS stage, 1 AS stage_rank,
         |    CAST(COUNT(*) AS BIGINT) AS n_reached FROM t1
         |  UNION ALL SELECT 'view', 2, CAST(COUNT(*) AS BIGINT) FROM t2
         |  UNION ALL SELECT 'click', 3, CAST(COUNT(*) AS BIGINT)
         |    FROM t3
         |  UNION ALL SELECT 'purchase', 4, CAST(COUNT(*) AS BIGINT)
         |    FROM t4),
         |w AS (SELECT *,
         |    lag(n_reached) OVER (ORDER BY stage_rank NULLS FIRST)
         |      AS prev,
         |    CAST(SUM(CASE WHEN stage_rank = 1 THEN n_reached ELSE 0
         |      END) OVER () AS BIGINT) AS n_first
         |  FROM c)
         |SELECT stage, stage_rank, n_reached,
         |  CASE WHEN prev IS NOT NULL THEN
         |    ${val6("CAST(n_reached AS DOUBLE) / CAST(prev AS DOUBLE)")}
         |  END AS conv_from_prev,
         |  ${val6("CAST(n_reached AS DOUBLE)" +
             " / CAST(n_first AS DOUBLE)")} AS share_of_first
         |FROM w ORDER BY stage_rank NULLS FIRST""".stripMargin,

    // q277: q276 with the 72h conversion-window residual on each
    // chained join.,
    "q277_windowed_funnel" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type
         |  FROM events),
         |t1 AS (SELECT user_id, MIN(us) AS t FROM e
         |  WHERE event_type = 'signup' GROUP BY 1),
         |t2 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t1) p USING (user_id)
         |  WHERE event_type = 'view' AND us > tp
         |    AND us <= tp + 259200000000 GROUP BY 1),
         |t3 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t2) p USING (user_id)
         |  WHERE event_type = 'click' AND us > tp
         |    AND us <= tp + 259200000000 GROUP BY 1),
         |t4 AS (SELECT e.user_id, MIN(us) AS t FROM e
         |  JOIN (SELECT user_id, t AS tp FROM t3) p USING (user_id)
         |  WHERE event_type = 'purchase' AND us > tp
         |    AND us <= tp + 259200000000 GROUP BY 1),
         |c AS (
         |  SELECT 'signup' AS stage, 1 AS stage_rank,
         |    CAST(COUNT(*) AS BIGINT) AS n_reached FROM t1
         |  UNION ALL SELECT 'view', 2, CAST(COUNT(*) AS BIGINT) FROM t2
         |  UNION ALL SELECT 'click', 3, CAST(COUNT(*) AS BIGINT)
         |    FROM t3
         |  UNION ALL SELECT 'purchase', 4, CAST(COUNT(*) AS BIGINT)
         |    FROM t4),
         |w AS (SELECT *,
         |    lag(n_reached) OVER (ORDER BY stage_rank NULLS FIRST)
         |      AS prev,
         |    CAST(SUM(CASE WHEN stage_rank = 1 THEN n_reached ELSE 0
         |      END) OVER () AS BIGINT) AS n_first
         |  FROM c)
         |SELECT stage, stage_rank, n_reached,
         |  CASE WHEN prev IS NOT NULL THEN
         |    ${val6("CAST(n_reached AS DOUBLE) / CAST(prev AS DOUBLE)")}
         |  END AS conv_from_prev,
         |  ${val6("CAST(n_reached AS DOUBLE)" +
             " / CAST(n_first AS DOUBLE)")} AS share_of_first
         |FROM w ORDER BY stage_rank NULLS FIRST""".stripMargin,

    // q278: 7×24 heatmap — dow stated 0=Sunday on both engines.,
    "q278_traffic_heatmap" ->
      s"""WITH g AS (SELECT CAST(date_part('dow', ts) AS INT) AS dow,
         |    CAST(date_part('hour', ts) AS INT) AS hour,
         |    CAST(COUNT(*) AS BIGINT) AS n_events
         |  FROM events GROUP BY 1, 2),
         |w AS (SELECT *, CAST(SUM(n_events) OVER () AS BIGINT) AS tot,
         |    CAST(ROW_NUMBER() OVER (ORDER BY n_events DESC,
         |      dow NULLS FIRST, hour NULLS FIRST) AS BIGINT) AS rank
         |  FROM g)
         |SELECT dow, hour, n_events,
         |  ${val6("CAST(n_events AS DOUBLE) / CAST(tot AS DOUBLE)")}
         |    AS share,
         |  rank
         |FROM w ORDER BY dow NULLS FIRST, hour NULLS FIRST""".stripMargin,

    // q279: 3-itemsets — the oracle proves the in-row triple expansion
    // against a relational 3-way self-join on the distinct basket.,
  )
}
