package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a pure (SparkSession, sfDir) => DataFrame
  * ending in a total deterministic ORDER BY; [[oracleSql]] carries the
  * DuckDB-equivalent ANSI SQL with identical column aliases (the driver
  * sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"  -> Relational.q01PricingSummary,
    "q02_revenue_by_nation" -> Relational.q02RevenueByNation,
    "q03_top_orders"       -> Relational.q03TopOrders,
    "q04_window_rank"      -> Relational.q04TopOrdersPerCustomer,
    "q05_distinct"         -> Relational.q05DistinctSegments,
    "q06_except"           -> Relational.q06ExceptCustomers,
    "q07_rollup"           -> Relational.q07RollupQuantity,
    "q08_semi_join"        -> Relational.q08SemiJoin,
    "q09_anti_join"        -> Relational.q09AntiJoin,
    "q10_monthly_orders"   -> Relational.q10MonthlyOrders,
    "q18_value_counts"     -> Relational.q18BrandCounts,
  )

  /** DuckDB-runnable ANSI SQL twins of [[queries]], same aliases. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 4) AS sum_qty,
         round(sum(l_extendedprice), 4) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE year(o_orderdate) = 1997
         GROUP BY r_name, n_name
         ORDER BY r_name, n_name""",
    "q03_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC
         LIMIT 10""",
    "q04_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders)
         WHERE rn <= 3
         ORDER BY o_custkey, rn""",
    "q05_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
         ORDER BY c_mktsegment, c_nationkey""",
    "q06_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
         EXCEPT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
         ORDER BY o_custkey""",
    "q07_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 4) AS sum_qty, count(*) AS cnt
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q08_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
         ORDER BY c_custkey""",
    "q09_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND year(o_orderdate) = 1998)
         ORDER BY c_custkey""",
    "q10_monthly_orders" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
         count(*) AS n_orders, round(sum(o_totalprice), 4) AS total
         FROM orders
         GROUP BY 1
         ORDER BY month""",
    "q18_value_counts" ->
      """SELECT p_brand, count(*) AS cnt FROM part
         GROUP BY p_brand ORDER BY p_brand""",
  )
}
