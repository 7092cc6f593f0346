package graft.queries

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Relational/analytical core (SURVEY.md §2b): scan, filter, aggregate,
  * join (broadcast where small), window, set ops, subqueries, rollup.
  * Each query has a DuckDB oracle twin in [[oracles]].
  */
object Relational {

  /** TPC-H Q1-style pricing summary: hash aggregate with multiple
    * exact-decimal measures. One shuffle on the (tiny) group key. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
        Exact.dsum2(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
        Exact.dsum3(col("l_extendedprice"), lit(1) - col("l_discount"),
          lit(1) + col("l_tax")).as("sum_charge"),
        Exact.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Filter + 2-column projection: both the predicate and the column
    * pruning must reach the parquet scan (PushedFilters / ReadSchema). */
  def q2FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_quantity") < 5)
      .select("l_orderkey", "l_linenumber", "l_quantity")

  /** Fact-dim-dim join + agg; customer is broadcast (no shuffle of
    * lineitem for the dim side). */
  def q3JoinAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .groupBy("c_mktsegment")
      .agg(
        Exact.dsum2(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Top-N by sort: deterministic via full tiebreak on the key. */
  def q4SortLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Distinct + count-distinct per group. */
  def q5Distinct(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))

  /** Window rank per group (top-3 orders per customer). */
  def q6Window(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "rnk")
  }

  /** Union + distinct across heterogeneous sources. */
  def q7Union(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d).select(col("c_nationkey").cast(LongType).as("k"))
    val b = Tables.supplier(s, d).select(col("s_nationkey").cast(LongType).as("k"))
    a.union(b).distinct().groupBy().agg(
      count(lit(1)).as("n_distinct_keys"),
      sum(col("k")).as("key_sum"))
  }

  /** Anti join: customers with no orders (NOT EXISTS). */
  def q8AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** 5-table join: revenue by supplier nation within one region.
    * Dims chain-broadcast; lineitem⋈orders is the only big shuffle. */
  def q9MultiJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .groupBy("r_name", "n_name")
      .agg(Exact.dsum2(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))

  /** Conditional aggregation (CASE WHEN pivot by order status). */
  def q10CaseAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
        Exact.dsum(col("o_totalprice")).as("total"))

  /** Aggregate + HAVING. */
  def q11Having(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), Exact.dsum(col("o_totalprice")).as("spend"))
      .filter(col("n_orders") >= 15)

  /** Scalar subquery: items priced > 1.9 × global average (the average
    * is computed exactly in decimal, so the threshold is deterministic). */
  def q12Subquery(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val thresh = li.agg(Exact.davg(col("l_extendedprice")).as("a"))
    li.crossJoin(broadcast(thresh))
      .filter(col("l_extendedprice") > col("a") * 1.9)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_expensive"),
        Exact.dsum(col("l_extendedprice")).as("sum_price"))
  }

  /** ROLLUP grouping sets; subtotal rows are labelled via grouping()
    * (not coalesce) so a genuine NULL group value stays distinguishable
    * from the rollup's own subtotal rows. */
  def q13Rollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(Exact.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(
        when(col("g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag")).as("rf"),
        when(col("g_ls") === 1, lit("ALL")).otherwise(col("l_linestatus")).as("ls"),
        col("sum_qty"), col("n"))

  /** Semi join (EXISTS): customers with at least one high-value order. */
  def q14SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))

  /** CUBE grouping sets over two dims with grouping() labels. */
  def q15Cube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), Exact.dsum(col("o_totalprice")).as("total"),
        grouping(col("o_orderstatus")).as("g_s"),
        grouping(col("o_orderpriority")).as("g_p"))
      .select(
        when(col("g_s") === 1, lit("ALL")).otherwise(col("o_orderstatus")).as("status"),
        when(col("g_p") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("priority"),
        col("n"), col("total"))

  /** Pivot (dynamic columns from a dimension): order counts by priority
    * pivoted over status. Fixed pivot values keep the schema static —
    * the scale-safe form (a dynamic pivot would need a driver-side
    * distinct pass first). */
  def q16Pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("n_f"),
        col("O").as("n_o"), col("P").as("n_p"))

  /** Exact percentiles (median / p90) per group — linear interpolation,
    * the same formula DuckDB's quantile_cont uses. */
  def q17Percentile(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        count(lit(1)).as("n"))

  /** Numeric range join: quantities bucketed against a band dimension.
    * Broadcast nested-loop on the tiny band table — map-side at any
    * scale (same pattern as the as-of interval join). */
  def q18RangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = Seq(("small", 0, 10), ("mid", 10, 25), ("big", 25, 100))
      .toDF("band", "lo", "hi")
    Tables.lineitem(s, d)
      .join(broadcast(bands),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), Exact.dsum(col("l_quantity")).as("sum_qty"))
  }

  /** Running total per customer (window frame ROWS UNBOUNDED PRECEDING,
    * decimal-exact then surfaced as double). */
  def q19RunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w).cast(DoubleType).as("running_spend"))
  }

  /** Left outer join keeping empty dims (count(col) skips the nulls the
    * outer side introduces). */
  def q20OuterJoin(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(Tables.customer(s, d),
        col("n_nationkey") === col("c_nationkey"), "left_outer")
      .groupBy("n_name")
      .agg(count(col("c_custkey")).as("n_customers"))

  /** Null-safe equality join (<=> / IS NOT DISTINCT FROM): nulls are
    * synthesized deterministically on both sides so NULL<=>NULL matches
    * are exercised.
    *
    * Aggregate-BEFORE-join: on a 5-value key every pair in a key group
    * survives the join, so joining first materializes
    * |customer|×|supplier|/5 rows (quadratic — 12.9 s at sf1) only to
    * collapse them again. Each side instead folds to ≤5 rows keyed on
    * the nullable key, and the null-safe join multiplies tiny
    * aggregates: n_pairs = na×nb, and the per-side distinct counts ARE
    * the joined distinct counts (every key-group member appears in the
    * join output). The DuckDB oracle keeps the literal pair-join
    * formulation, pinning the rewrite's equivalence. */
  def q21NullSafeJoin(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d)
      .select(col("c_custkey"),
        nullif(col("c_nationkey") % 5, lit(0)).as("ka"))
      .groupBy("ka")
      .agg(count(lit(1)).as("na"),
        countDistinct(col("c_custkey")).as("n_customers"))
    val b = Tables.supplier(s, d)
      .select(col("s_suppkey"),
        nullif(col("s_nationkey") % 5, lit(0)).as("kb"))
      .groupBy("kb")
      .agg(count(lit(1)).as("nb"),
        countDistinct(col("s_suppkey")).as("n_suppliers"))
    a.join(b, col("ka") <=> col("kb"))
      .select(coalesce(col("ka"), lit(-1)).as("k"),
        (col("na") * col("nb")).as("n_pairs"),
        col("n_customers"), col("n_suppliers"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_join_agg" -> (q3JoinAgg _),
    "q4_sort_limit" -> (q4SortLimit _),
    "q5_distinct" -> (q5Distinct _),
    "q6_window" -> (q6Window _),
    "q7_union" -> (q7Union _),
    "q8_anti_join" -> (q8AntiJoin _),
    "q9_multi_join" -> (q9MultiJoin _),
    "q10_case_agg" -> (q10CaseAgg _),
    "q11_having" -> (q11Having _),
    "q12_subquery" -> (q12Subquery _),
    "q13_rollup" -> (q13Rollup _),
    "q14_semi_join" -> (q14SemiJoin _),
    "q15_cube" -> (q15Cube _),
    "q16_pivot" -> (q16Pivot _),
    "q17_percentile" -> (q17Percentile _),
    "q18_range_join" -> (q18RangeJoin _),
    "q19_running_sum" -> (q19RunningSum _),
    "q20_outer_join" -> (q20OuterJoin _),
    "q21_null_safe_join" -> (q21NullSafeJoin _))

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,4)) * CAST(1 + l_tax AS DECIMAL(8,4))), 4) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 5""".stripMargin,
    "q3_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY c_mktsegment""".stripMargin,
    "q4_sort_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10",
    "q5_distinct" ->
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q6_window" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) t WHERE rnk <= 3""".stripMargin,
    "q7_union" ->
      """SELECT COUNT(*) AS n_distinct_keys, CAST(SUM(k) AS BIGINT) AS key_sum FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
        |  UNION
        |  SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier) t""".stripMargin,
    "q8_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q9_multi_join" ->
      """SELECT r_name, n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY r_name, n_name""".stripMargin,
    "q10_case_agg" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q11_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15""".stripMargin,
    "q12_subquery" ->
      """SELECT l_returnflag, COUNT(*) AS n_expensive,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_extendedprice > (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) FROM lineitem) * 1.9
        |GROUP BY l_returnflag""".stripMargin,
    "q13_rollup" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q14_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY 1""".stripMargin,
    "q15_cube" ->
      """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q16_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1""".stripMargin,
    "q17_percentile" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "q18_range_join" ->
      """SELECT b.band, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN (VALUES
        |  ('small', 0, 10), ('mid', 10, 25), ('big', 25, 100))
        |  AS b(band, lo, hi)
        |ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
        |GROUP BY 1""".stripMargin,
    "q19_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders""".stripMargin,
    "q20_outer_join" ->
      """SELECT n_name, COUNT(c_custkey) AS n_customers
        |FROM nation LEFT OUTER JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY 1""".stripMargin,
    "q21_null_safe_join" ->
      """SELECT COALESCE(ka, -1) AS k, COUNT(*) AS n_pairs,
        |  COUNT(DISTINCT c_custkey) AS n_customers,
        |  COUNT(DISTINCT s_suppkey) AS n_suppliers
        |FROM (SELECT c_custkey, nullif(c_nationkey % 5, 0) AS ka FROM customer) a
        |JOIN (SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS kb FROM supplier) b
        |  ON a.ka IS NOT DISTINCT FROM b.kb
        |GROUP BY 1""".stripMargin)
}
