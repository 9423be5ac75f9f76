package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-ish star schema.
  *
  * The reference (ajzo90/go-integ) has no relational operators — see
  * SURVEY.md §2.6 — so these are the engine-side analytics extension,
  * expressed entirely with Catalyst built-ins so predicate pushdown, column
  * pruning, partial aggregation and join re-ordering come for free.
  *
  * Scale notes (100 TB design intent):
  *  - dimension tables (region/nation/supplier/part at TPC-H proportions)
  *    are explicitly `broadcast()` — no shuffle of the fact table for those
  *    joins;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once; group
  *    keys are chosen to reuse that partitioning where possible;
  *  - all aggregates are algebraic (sum/count/avg/min/max) → map-side
  *    partial aggregation halves shuffle volume;
  *  - filters are applied before joins so they push into the parquet scan.
  */
object RelationalQueries extends QueryPack {

  // -- q1: full-scan aggregation (TPC-H Q1 shape) ---------------------------
  private def q1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-12-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity),2) AS sum_qty,
       round(sum(l_extendedprice),2) AS sum_base_price,
       round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
       round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
       round(avg(l_quantity),2) AS avg_qty,
       round(avg(l_extendedprice),2) AS avg_price,
       round(avg(l_discount),4) AS avg_disc,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-12-01'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  // -- q3: selective join + top-k (TPC-H Q3 shape) --------------------------
  private def q3(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === lit("BUILDING"))
    val o = t(s, dir, "orders").filter(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
    broadcast(c)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate").cast("date").as("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey,
       round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
       CAST(o_orderdate AS DATE) AS o_orderdate
       FROM customer JOIN orders ON c_custkey=o_custkey
       JOIN lineitem ON o_orderkey=l_orderkey
       WHERE c_mktsegment='BUILDING'
         AND o_orderdate < TIMESTAMP '1998-01-01'
         AND l_shipdate > TIMESTAMP '1998-01-01'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  // -- q6: forecast revenue change (TPC-H Q6 shape) -------------------------
  // Pure scan-side query: every predicate pushes into the parquet scan,
  // the aggregate is a single map-side-combined global sum — the query
  // whose entire cost at 100 TB is I/O, which is exactly the point.
  private def q6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  private val q6Sql =
    """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue, count(*) AS n_items
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24"""

  // -- q10: returned-item reporting (TPC-H Q10 shape) -----------------------
  // Fact-fact join on orderkey (one shuffle), customer dimension joined
  // AFTER the aggregation has shrunk the fact side to one row per customer.
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-10-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === lit("R"))
    val revenue = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    revenue
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    """SELECT c_custkey, c_name,
       round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, c_acctbal
       FROM customer JOIN orders ON c_custkey=o_custkey
       JOIN lineitem ON l_orderkey=o_orderkey
       WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         AND l_returnflag='R'
       GROUP BY c_custkey, c_name, c_acctbal
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  // -- q5: star-schema multi-join (TPC-H Q5 shape) --------------------------
  private def q5(s: SparkSession, dir: String): DataFrame = {
    val region = broadcast(t(s, dir, "region").filter(col("r_name") === lit("ASIA")))
    val nation = broadcast(t(s, dir, "nation"))
    val supplier = broadcast(t(s, dir, "supplier"))
    val orders = t(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
    t(s, dir, "customer")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql =
    """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
       FROM customer
       JOIN orders ON c_custkey=o_custkey
       JOIN lineitem ON l_orderkey=o_orderkey
       JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
       JOIN nation ON s_nationkey=n_nationkey
       JOIN region ON n_regionkey=r_regionkey
       WHERE r_name='ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY n_name ORDER BY revenue DESC, n_name"""

  // -- broadcast dimension join ---------------------------------------------
  private def qBroadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_type") === lit("PROMO"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("p_brand")

  private val qBroadcastSql =
    """SELECT p_brand, round(sum(l_extendedprice),2) AS sum_price,
       round(avg(l_quantity),2) AS avg_qty, count(*) AS cnt
       FROM lineitem JOIN part ON l_partkey=p_partkey
       WHERE p_type='PROMO' GROUP BY p_brand ORDER BY p_brand"""

  // -- semi / anti / outer joins --------------------------------------------
  private def qSemi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderpriority") === lit("1-URGENT")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  private val qSemiSql =
    """SELECT c_custkey, c_name FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_orderpriority='1-URGENT')
       ORDER BY c_custkey"""

  // anti join against the *filtered* orders side so the result is non-empty
  // (in this data every customer has at least one order — an anti join on
  // the raw table would be a vacuous 0-row check)
  private def qAnti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_totalprice") > lit(300000.0)),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  private val qAntiSql =
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey AND o_totalprice > 300000)
       ORDER BY c_custkey"""

  private def qOuter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spent"))
      .orderBy("c_custkey")

  private val qOuterSql =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice),0),2) AS total_spent
       FROM customer LEFT JOIN orders ON c_custkey=o_custkey
       GROUP BY c_custkey ORDER BY c_custkey"""

  // -- set operations ---------------------------------------------------------
  private def qUnion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_mktsegment") === lit("BUILDING")).select(col("c_custkey"))
      .union(t(s, dir, "orders").filter(col("o_totalprice") > lit(400000.0)).select(col("o_custkey")))
      .distinct()
      .orderBy("c_custkey")

  private val qUnionSql =
    """SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING'
       UNION SELECT o_custkey FROM orders WHERE o_totalprice > 400000
       ORDER BY c_custkey"""

  private def qIntersect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_mktsegment") === lit("MACHINERY")).select(col("c_custkey"))
      .intersect(t(s, dir, "orders").filter(col("o_orderpriority") === lit("5-LOW")).select(col("o_custkey")))
      .orderBy("c_custkey")

  private val qIntersectSql =
    """SELECT c_custkey FROM customer WHERE c_mktsegment='MACHINERY'
       INTERSECT SELECT o_custkey FROM orders WHERE o_orderpriority='5-LOW'
       ORDER BY c_custkey"""

  private def qExcept(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey"))
      .except(t(s, dir, "orders").filter(col("o_orderstatus") === lit("F")).select(col("o_custkey")))
      .orderBy("c_custkey")

  private val qExceptSql =
    """SELECT c_custkey FROM customer
       EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus='F'
       ORDER BY c_custkey"""

  // -- distinct aggregation ----------------------------------------------------
  private def qDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  private val qDistinctSql =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs, count(*) AS n_orders
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // -- rollup / cube -----------------------------------------------------------
  private def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("sum_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_cust"), col("sum_bal"))
      .orderBy("region_name", "nation_name")

  private val qRollupSql =
    """SELECT coalesce(r_name,'ALL') AS region_name, coalesce(n_name,'ALL') AS nation_name,
       count(*) AS n_cust, round(sum(c_acctbal),2) AS sum_bal
       FROM customer JOIN nation ON c_nationkey=n_nationkey
       JOIN region ON n_regionkey=r_regionkey
       GROUP BY ROLLUP(r_name, n_name)
       ORDER BY region_name, nation_name"""

  private def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("segment", "priority")

  private val qCubeSql =
    """SELECT coalesce(c_mktsegment,'ALL') AS segment, coalesce(o_orderpriority,'ALL') AS priority,
       count(*) AS n, round(sum(o_totalprice),2) AS total
       FROM customer JOIN orders ON c_custkey=o_custkey
       GROUP BY CUBE(c_mktsegment, o_orderpriority)
       ORDER BY segment, priority"""

  // -- sort / limit -------------------------------------------------------------
  private def qSortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate").cast("date").as("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  private val qSortLimitSql =
    """SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_orderdate
       FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""

  // -- scalar functions -----------------------------------------------------------
  private def qString(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      substring(col("p_name"), 1, 8).as("name_pfx"),
      length(col("p_name")).as("name_len"),
      concat(col("p_type"), lit("/"), col("p_brand")).as("type_brand"),
      regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_us"))
      .orderBy("p_partkey")

  private val qStringSql =
    """SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name,1,8) AS name_pfx,
       CAST(length(p_name) AS INT) AS name_len, concat(p_type,'/',p_brand) AS type_brand,
       replace(p_name,' ','_') AS name_us
       FROM part ORDER BY p_partkey"""

  private def qDate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dy"),
      quarter(col("o_orderdate")).as("qtr"),
      date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
      .orderBy("o_orderkey")

  private val qDateSql =
    """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo, CAST(day(o_orderdate) AS INT) AS dy,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
       FROM orders ORDER BY o_orderkey"""

  private def qMath(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < lit(100L))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_quantity")), 4).as("qty_sqrt"),
        round(log(col("l_extendedprice")), 4).as("price_ln"),
        ceil(col("l_discount") * lit(100)).as("disc_pct_ceil"),
        floor(col("l_tax") * lit(100)).as("tax_pct_floor"),
        abs(col("l_quantity") - lit(25)).as("qty_dev"),
        round(pow(lit(1) + col("l_discount"), 2), 6).as("disc_sq"))
      .orderBy("l_orderkey", "l_linenumber")

  private val qMathSql =
    """SELECT l_orderkey, l_linenumber, round(sqrt(l_quantity),4) AS qty_sqrt,
       round(ln(l_extendedprice),4) AS price_ln,
       CAST(ceil(l_discount*100) AS BIGINT) AS disc_pct_ceil,
       CAST(floor(l_tax*100) AS BIGINT) AS tax_pct_floor,
       abs(l_quantity-25) AS qty_dev,
       round(pow(1+l_discount,2),6) AS disc_sq
       FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber"""

  private def qCase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        when(col("o_totalprice") > 300000, lit("high"))
          .when(col("o_totalprice") > 150000, lit("mid"))
          .otherwise(lit("low")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  private val qCaseSql =
    """SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                   WHEN o_totalprice > 150000 THEN 'mid'
                   ELSE 'low' END AS bucket, count(*) AS n
       FROM orders GROUP BY 1 ORDER BY bucket"""

  // -- JSON extraction --------------------------------------------------------------
  private def qJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select((get_json_object(col("props"), "$.k").cast("int") % 10).as("k_mod"), col("value"))
      .groupBy(col("k_mod"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("k_mod")

  private val qJsonSql =
    """SELECT CAST(json_extract_string(props,'$.k') AS INTEGER) % 10 AS k_mod,
       count(*) AS n, round(sum(value),2) AS sum_value
       FROM events GROUP BY 1 ORDER BY k_mod"""

  // -- scalar array functions (sort/distinct/slice/contains/join) -------------------
  private def qArray(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(s, dir, "documents").select(
      col("doc_id"),
      array_join(slice(array_sort(array_distinct(toks)), 1, 3), ",").as("top3_toks"),
      array_contains(toks, "the").cast("int").as("has_the"),
      size(toks).as("n_toks"))
      .orderBy("doc_id")
  }

  private val qArraySql =
    """SELECT doc_id,
       array_to_string(list_sort(list_distinct(string_split(text,' ')))[1:3], ',') AS top3_toks,
       CAST(list_contains(string_split(text,' '), 'the') AS INT) AS has_the,
       CAST(len(string_split(text,' ')) AS INT) AS n_toks
       FROM documents ORDER BY doc_id"""

  // -- scalar map functions (construction, lookup, keys) ----------------------------
  private def qMap(s: SparkSession, dir: String): DataFrame = {
    val m = org.apache.spark.sql.functions.map(
      lit("q"), col("l_quantity").cast("double"),
      lit("t"), col("l_tax").cast("double"))
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        element_at(m, "q").as("q_val"),
        array_join(map_keys(m), ",").as("ks"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val qMapSql =
    """SELECT l_orderkey, l_linenumber,
       (MAP {'q': CAST(l_quantity AS DOUBLE), 't': CAST(l_tax AS DOUBLE)})['q'][1] AS q_val,
       array_to_string(map_keys(MAP {'q': CAST(l_quantity AS DOUBLE), 't': CAST(l_tax AS DOUBLE)}), ',') AS ks
       FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber"""

  // -- ordered set-string aggregation (listagg) -------------------------------------
  private def qStringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
        countDistinct(col("l_linestatus")).as("n_status"))
      .orderBy("l_returnflag")

  private val qStringAggSql =
    """SELECT l_returnflag,
       string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
       count(DISTINCT l_linestatus) AS n_status
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // -- correlated NOT EXISTS subquery (Catalyst decorrelates to an anti join):
  // -- customers with no high-value order (threshold keeps the set non-vacuous) ------
  private def qExists(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer_ex")
    t(s, dir, "orders").createOrReplaceTempView("orders_ex")
    s.sql(
      """SELECT c_nationkey, count(*) AS n_inactive
         FROM customer_ex c
         WHERE NOT EXISTS (SELECT 1 FROM orders_ex o
                           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
         GROUP BY c_nationkey ORDER BY c_nationkey""")
  }

  private val qExistsSql =
    """SELECT c_nationkey, count(*) AS n_inactive
       FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
       GROUP BY c_nationkey ORDER BY c_nationkey"""

  // -- incremental cursor read (reference S8: shopify.go:39-64 time-window scan) ----
  private def qIncr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("ts") > to_timestamp(lit("2024-01-15 00:00:00")))
      .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_id"))

  private val qIncrSql =
    """SELECT count(*) AS n, max(event_id) AS max_id
       FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'"""

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1 _),
    "q3_top_revenue" -> (q3 _),
    "q5_local_supplier" -> (q5 _),
    "q6_forecast_revenue" -> (q6 _),
    "q10_returned_items" -> (q10 _),
    "q_broadcast_part_agg" -> (qBroadcast _),
    "q_semi_join" -> (qSemi _),
    "q_anti_join" -> (qAnti _),
    "q_outer_join_count" -> (qOuter _),
    "q_set_union" -> (qUnion _),
    "q_set_intersect" -> (qIntersect _),
    "q_set_except" -> (qExcept _),
    "q_distinct_agg" -> (qDistinct _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_sort_limit" -> (qSortLimit _),
    "q_scalar_string" -> (qString _),
    "q_scalar_date" -> (qDate _),
    "q_scalar_math" -> (qMath _),
    "q_case_when" -> (qCase _),
    "q_json_extract" -> (qJson _),
    "q_scalar_array" -> (qArray _),
    "q_scalar_map" -> (qMap _),
    "q_string_agg" -> (qStringAgg _),
    "q_exists_subquery" -> (qExists _),
    "q_incremental_cursor" -> (qIncr _))

  override val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q3_top_revenue" -> q3Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q10_returned_items" -> q10Sql,
    "q5_local_supplier" -> q5Sql,
    "q_broadcast_part_agg" -> qBroadcastSql,
    "q_semi_join" -> qSemiSql,
    "q_anti_join" -> qAntiSql,
    "q_outer_join_count" -> qOuterSql,
    "q_set_union" -> qUnionSql,
    "q_set_intersect" -> qIntersectSql,
    "q_set_except" -> qExceptSql,
    "q_distinct_agg" -> qDistinctSql,
    "q_rollup" -> qRollupSql,
    "q_cube" -> qCubeSql,
    "q_sort_limit" -> qSortLimitSql,
    "q_scalar_string" -> qStringSql,
    "q_scalar_date" -> qDateSql,
    "q_scalar_math" -> qMathSql,
    "q_case_when" -> qCaseSql,
    "q_json_extract" -> qJsonSql,
    "q_scalar_array" -> qArraySql,
    "q_scalar_map" -> qMapSql,
    "q_string_agg" -> qStringAggSql,
    "q_exists_subquery" -> qExistsSql,
    "q_incremental_cursor" -> qIncrSql)
}
