package graft

/** DuckDB oracle SQL for every entry in [[Queries]]. Column names, types
  * (as far as both engines allow) and row order match the Spark side —
  * the driver sorts columns by name and hash-compares values, so every
  * computed column is aliased identically in both places (SURVEY §7
  * rounding notes: Spark `bround` ≈ numpy HALF_EVEN; DuckDB `round`
  * validated empirically against it on this data).
  */
object Oracles {

  val sql: Map[String, String] = Map(
    "q01_dim_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |  CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        |  count(DISTINCT l_orderkey) AS n_distinct,
        |  sign(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(l_quantity)) * (floor(abs(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(l_quantity)) * 10000.0 + 0.5) / 10000.0) AS avg_qty,
        |  sign(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / count(l_extendedprice)) * (floor(abs(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / count(l_extendedprice)) * 10000.0 + 0.5) / 10000.0) AS avg_price,
        |  sign(CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / count(l_discount)) * (floor(abs(CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / count(l_discount)) * 10000.0 + 0.5) / 10000.0) AS avg_disc,
        |  sign(CAST(sum(CAST(l_tax AS DECIMAL(25,6))) AS DOUBLE) / count(l_tax)) * (floor(abs(CAST(sum(CAST(l_tax AS DECIMAL(25,6))) AS DOUBLE) / count(l_tax)) * 10000.0 + 0.5) / 10000.0) AS avg_tax
        |FROM lineitem
        |GROUP BY 1, 2, 3, 4
        |ORDER BY 1, 2, 3, 4""".stripMargin,
    "q02_dedup" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE value IS NOT NULL
        |) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q03_nan_profile" ->
      """SELECT column_name, nan_pct FROM (
        |  SELECT 'o_orderkey' AS column_name, round(100.0 * sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) / count(*), 1) AS nan_pct FROM orders
        |  UNION ALL SELECT 'o_custkey', round(100.0 * sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) / count(*), 1) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', round(100.0 * sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) / count(*), 1) FROM orders
        |  UNION ALL SELECT 'o_totalprice', round(100.0 * sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) / count(*), 1) FROM orders
        |  UNION ALL SELECT 'o_orderdate', round(100.0 * sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) / count(*), 1) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', round(100.0 * sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) / count(*), 1) FROM orders
        |) ORDER BY column_name""".stripMargin,
    "q04_value_counts" ->
      """SELECT event_type AS value, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY cnt DESC, value""".stripMargin,
    "q05_nan_pivot" ->
      """SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        |  CAST(dayofmonth(l_shipdate) AS INTEGER) AS ship_day,
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 1995 THEN l_orderkey END) AS "1995",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 1996 THEN l_orderkey END) AS "1996",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 1997 THEN l_orderkey END) AS "1997",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 1998 THEN l_orderkey END) AS "1998",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 1999 THEN l_orderkey END) AS "1999",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 2000 THEN l_orderkey END) AS "2000",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 2001 THEN l_orderkey END) AS "2001"
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q06_windowed_ingest" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month_start,
        |  count(*) AS n_orders,
        |  sign(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)) * (floor(abs(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0) AS total_price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '2002-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_union_chunks" ->
      """SELECT src, count(*) AS n, count(DISTINCT k) AS n_keys,
        |  sign(CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE) / count(v)) * (floor(abs(CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE) / count(v)) * 10000.0 + 0.5) / 10000.0) AS avg_v FROM (
        |  SELECT o_orderkey AS k, o_totalprice AS v, 'orders' AS src FROM orders
        |  UNION ALL
        |  SELECT l_orderkey AS k, l_extendedprice AS v, 'lineitem' AS src FROM lineitem
        |) GROUP BY src ORDER BY src""".stripMargin,
    "q08_project_rename" ->
      """SELECT c_custkey AS custkey, c_acctbal AS acctbal, c_mktsegment AS segment
        |FROM customer ORDER BY custkey""".stripMargin,
    "q09_filters" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderdate IS NOT NULL AND o_orderstatus = 'O'
        |  AND o_totalprice >= 200000.0
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY o_orderkey""".stripMargin,
    "q10_semi_join" ->
      """SELECT user_id, count(*) AS n_events,
        |  sign(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)) * (floor(abs(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0) AS sum_value
        |FROM events
        |WHERE user_id IN (SELECT user_id FROM events GROUP BY user_id HAVING count(*) >= 70)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q11_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  sign(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / count(o_totalprice)) * (floor(abs(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / count(o_totalprice)) * 100.0 + 0.5) / 100.0) AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_join_left" ->
      """SELECT n_name, count(c_custkey) AS n_customers,
        |  sign(CAST(sum(CAST(COALESCE(c_acctbal, 0.0) AS DECIMAL(25,6))) AS DOUBLE)) * (floor(abs(CAST(sum(CAST(COALESCE(c_acctbal, 0.0) AS DECIMAL(25,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0) AS total_bal
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "q14_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
    "q15_date_parts" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_orderdate_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS o_orderdate_month,
        |  CAST(dayofmonth(o_orderdate) AS INTEGER) AS o_orderdate_day,
        |  CAST(hour(o_orderdate) AS INTEGER) AS o_orderdate_hour
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q16_timedelta" ->
      """SELECT l_orderkey, l_linenumber,
        |  round((epoch(l_shipdate) - epoch(o_orderdate)) / 60.0, 2) AS ship_delay_min
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q17_parse_timestamp" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS parsed
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q18_concat_key" ->
      """SELECT event_id, concat(user_id, ', ', event_id) AS enum_ind
        |FROM events ORDER BY event_id""".stripMargin,
    "q19_cast_coerce" ->
      """SELECT event_id, TRY_CAST(event_type AS INTEGER) AS et_as_int,
        |  TRY_CAST(CAST(event_id AS VARCHAR) AS INTEGER) AS eid_roundtrip
        |FROM events ORDER BY event_id""".stripMargin,
    "q20_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
        |FROM orders ORDER BY o_custkey, order_seq""".stripMargin
  )
}
