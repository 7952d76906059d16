package graft

/** DuckDB oracle SQL, one entry per Oracle=yes query id (SURVEY.md §2).
  *
  * Rules (SURVEY §7.5): identical column names/aliases as the Spark side,
  * total ORDER BY with unique tiebreaker, money math in DECIMAL (or per-row
  * DOUBLE then per-row decimal cast before SUM) so both engines produce
  * bit-identical values regardless of aggregation order.
  */
object Oracle {

  val relational: Map[String, String] = Map(
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(18,6)) AS sum_charge,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS avg_qty,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS avg_price,
        | CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "join_inner_equi" ->
      """SELECT o_orderkey, c_custkey, c_name, c_mktsegment,
        | CAST(o_totalprice AS DECIMAL(18,2)) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, c_name, o_orderkey,
        | CAST(o_totalprice AS DECIMAL(18,2)) AS total_price
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin,

    "join_full_outer" ->
      """WITH c AS (SELECT * FROM customer WHERE c_custkey >= 200),
        | o AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |       WHERE o_custkey < 500 GROUP BY o_custkey)
        |SELECT c_custkey, c_name, o_custkey, n_orders
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC NULLS FIRST, o_custkey ASC NULLS FIRST""".stripMargin,

    "join_left_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "join_cross_theta" ->
      """SELECT p_partkey, s_suppkey
        |FROM (SELECT p_partkey, p_retailprice FROM part WHERE p_size = 1) p
        |JOIN supplier s ON p_retailprice > s_acctbal
        |ORDER BY p_partkey, s_suppkey""".stripMargin,

    "join_range" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, p_size,
        | CAST(l_quantity AS DECIMAL(18,2)) AS quantity
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        | AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
        |ORDER BY l_orderkey, l_linenumber, p_partkey, p_size, quantity""".stripMargin,

    "join_self" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber, l_partkey
        |  FROM lineitem WHERE l_orderkey % 100 = 0)
        |SELECT a.l_orderkey AS orderkey,
        |  a.l_linenumber AS line_a, b.l_linenumber AS line_b,
        |  a.l_partkey AS part_a, b.l_partkey AS part_b
        |FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  AND a.l_linenumber < b.l_linenumber AND a.l_partkey <> b.l_partkey
        |ORDER BY orderkey, line_a, line_b, part_a, part_b""".stripMargin,

    "join_asof" ->
      """WITH latest AS (
        |  SELECT o_custkey, o_orderkey AS asof_orderkey, o_orderdate AS asof_orderdate
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |  WHERE rn = 1)
        |SELECT event_id, user_id, asof_orderkey,
        |  strftime(asof_orderdate, '%Y-%m-%d') AS asof_date
        |FROM events LEFT OUTER JOIN latest ON user_id = o_custkey
        |ORDER BY event_id""".stripMargin,

    "agg_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 3
        |ORDER BY o_custkey""".stripMargin,

    "agg_count_distinct" ->
      """SELECT l_returnflag,
        | COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps,
        | COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_minmax_first" ->
      """SELECT o_orderpriority,
        | CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS min_price,
        | CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS max_price,
        | MIN(o_orderkey) AS min_key,
        | MAX_BY(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 100000000 + o_orderkey) AS key_of_max_price,
        | MIN_BY(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 100000000 + o_orderkey) AS key_of_min_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "agg_conditional" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        | CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        | CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |   THEN CAST(o_totalprice AS DECIMAL(18,2))
        |   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS urgent_price,
        | COUNT(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' THEN 1 END) AS n_recent
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "agg_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_bal
        |FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "agg_cube" ->
      """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderstatus)
        |ORDER BY c_mktsegment ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT c_mktsegment, o_orderpriority,
        | CAST(GROUPING(c_mktsegment, o_orderpriority) AS BIGINT) AS gid,
        | COUNT(1) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        |ORDER BY gid, c_mktsegment ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "sort_multi_null" ->
      """SELECT c_custkey,
        | CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS segment,
        | CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
        |FROM customer
        |ORDER BY segment ASC NULLS LAST, acctbal DESC, c_custkey""".stripMargin,

    "topk_global" ->
      """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS total_price
        |FROM orders ORDER BY total_price DESC, o_orderkey LIMIT 25""".stripMargin,

    "set_union_all" ->
      """SELECT * FROM (
        | SELECT c_custkey AS key, 'lo' AS src FROM customer WHERE c_custkey < 100
        | UNION ALL
        | SELECT c_custkey AS key, 'hi' AS src FROM customer WHERE c_custkey < 150)
        |ORDER BY key, src""".stripMargin,

    "set_union_distinct" ->
      """SELECT * FROM (
        | SELECT o_custkey AS key FROM orders WHERE o_custkey < 300
        | UNION
        | SELECT c_custkey AS key FROM customer WHERE c_custkey < 400)
        |ORDER BY key""".stripMargin,

    "set_intersect" ->
      """SELECT * FROM (
        | SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
        | INTERSECT
        | SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY key""".stripMargin,

    "set_except" ->
      """SELECT * FROM (
        | SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
        | EXCEPT
        | SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY key""".stripMargin,
  )

  def all: Map[String, String] = relational
}
