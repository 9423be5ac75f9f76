package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Additional TPC-H plan shapes (Q2/Q12/Q14/Q18/Q22 adapted to the driver's
  * schema), each exercising a distinct physical pattern the engine must get
  * right at 100 TB:
  *
  *  - q2_min_cost:    decorrelated scalar subquery — per-group min then
  *                    equi-join back (Catalyst's plan for Q2's correlated
  *                    MIN subquery)
  *  - q12_priority:   fact-fact join + conditional aggregation (Q12's
  *                    CASE-count by group after a selective date filter)
  *  - q14_promo:      conditional-sum ratio over a broadcast dimension join,
  *                    single-row output (Q14's promo revenue share)
  *  - q4_late:        EXISTS with a cross-side inequality residual — left
  *                    semi join keyed on the equi part, the non-equi kept
  *                    on the join (Q4's late-lineitem order priorities)
  *  - q16_supplier:   distinct-count after an anti join (Q16's supplier
  *                    count with excluded-supplier NOT IN)
  *  - q18_large:      aggregate-then-semi-join — the HAVING subquery
  *                    collapses the fact side before any wide join touches
  *                    it (Q18's large-volume customers)
  *  - q19_disjunctive: OR-of-ANDs predicate across both join sides — the
  *                    per-side disjunctions must reach the scans, the
  *                    cross-side residual stays on the join (Q19)
  *  - q22_inactive:   scalar aggregate subquery as a join-free broadcast +
  *                    anti join (Q22's wealthy-but-inactive customers)
  *  - q7_nation_volume: two dim chains + cross-chain OR pair predicate (Q7)
  *  - q8_market_share: conditional ratio whose CASE branches on a different
  *                    dimension chain than the group key (Q8)
  *  - q9_product_profit: multi-table arithmetic after a 4-way join (Q9; a
  *                    10%-of-retail unit cost stands in for ps_supplycost)
  *  - q11_important_stock: same measure aggregated per-group AND globally,
  *                    global side broadcast into the HAVING (Q11, with a
  *                    scale-invariant 1.5×-mean threshold)
  *  - q13_order_dist: double aggregation over a left OUTER join with the
  *                    filter pushed below the join so zero-groups survive
  *  - q15_top_supplier: aggregate compared against the max over itself (Q15)
  *  - q17_small_qty:  per-group avg joined back with an inequality (Q17)
  *  - q20_excess_supply: stacked aggregates feeding a semi join; the 0.25
  *                    threshold is exact in binary (Q20)
  *  - q21_waiting_suppliers: semi + anti SELF-joins on the fact with a
  *                    key-inequality residual (Q21)
  *
  * With Q1/Q3/Q5/Q6/Q10 living in RelationalQueries, all 22 TPC-H query
  * shapes are covered. All oracle-checked; filters are chosen so every
  * output is non-empty at sf0.001.
  */
object TpchShapes extends QueryPack {

  // -- Q2 shape: cheapest supplier per part (decorrelated min subquery) --------
  // The per-part minimum is computed once (one shuffle on partkey, partial
  // aggregation map-side) and joined back on (partkey, price=min). The
  // double equality is safe: both sides derive the value from the identical
  // IEEE division, and min() selects an exact element of that set.
  private def q2(s: SparkSession, dir: String): DataFrame = {
    val pl = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_size") < 5)),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
    val mins = pl.groupBy(col("l_partkey")).agg(min(col("unit_price")).as("min_price"))
      .withColumnRenamed("l_partkey", "mk")
    // min_price is emitted UNROUNDED: it is an exact element of the quotient
    // set (min is order-independent, IEEE division is deterministic), so
    // both engines produce the identical double — whereas round(x, 4) at a
    // half-up boundary diverges (Spark rounds the shortest decimal repr,
    // DuckDB the binary value; bit this at sf0.1).
    pl.join(mins, col("l_partkey") === col("mk") && col("unit_price") === col("min_price"))
      .select(col("l_partkey").as("p_partkey"), col("l_suppkey").as("s_suppkey"),
        col("min_price").as("unit_price"))
      .distinct()
      .orderBy("p_partkey", "s_suppkey")
  }

  private val q2Sql =
    """WITH pl AS (
         SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
         FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_size < 5),
       mins AS (SELECT l_partkey, min(unit_price) AS min_price FROM pl GROUP BY 1)
       SELECT DISTINCT pl.l_partkey AS p_partkey, pl.l_suppkey AS s_suppkey,
         min_price AS unit_price
       FROM pl JOIN mins ON pl.l_partkey = mins.l_partkey AND pl.unit_price = mins.min_price
       ORDER BY p_partkey, s_suppkey"""

  // -- Q4 shape: semi join with a non-equi residual ----------------------------
  // EXISTS with an inequality ACROSS the two tables (shipdate vs orderdate):
  // decorrelates to a LEFT SEMI join whose condition is key equality plus a
  // cross-side residual — the residual cannot push to either scan, so the
  // planner must keep it on the join while still using the equi part for
  // the hash/merge key.
  private def q4(s: SparkSession, dir: String): DataFrame = {
    val late = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    t(s, dir, "orders")
      .join(late, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, count(*) AS n_late
       FROM orders WHERE EXISTS (SELECT 1 FROM lineitem
         WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       GROUP BY 1 ORDER BY 1"""

  // -- Q16 shape: distinct-count after an anti join ----------------------------
  // Suppliers with negative balance are excluded by NOT EXISTS (a broadcast
  // anti join on the tiny supplier dimension), then the count is DISTINCT
  // per group — the expand+two-phase-aggregate plan, fed only by surviving
  // rows.
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_size") < 8)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy("p_brand")
  }

  private val q16Sql =
    """SELECT p_brand, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_size < 8 AND NOT EXISTS
         (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
       GROUP BY 1 ORDER BY 1"""

  // -- Q12 shape: priority shipping report (fact-fact join + CASE counts) ------
  // The selective shipdate filter lands in the parquet scan (PushedFilters);
  // one shuffle joins the two facts on orderkey; the conditional counts are
  // map-side partial aggregates.
  private def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("n_urgent"),
        sum(when(col("o_orderpriority") =!= "1-URGENT", 1L).otherwise(0L)).as("n_other"))
      .orderBy("l_returnflag")

  private val q12Sql =
    """SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
       CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_other
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
       GROUP BY l_returnflag ORDER BY l_returnflag"""

  // -- Q14 shape: promo revenue share (conditional-sum ratio, scalar output) ---
  // Unlike q_broadcast_part_agg (which filters PROMO before the join), the
  // ratio needs BOTH promo and non-promo revenue, so the full part dimension
  // broadcasts and the CASE splits inside the aggregate.
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-06-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-09-01")))
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) / sum(rev), 4)
        .as("promo_share"))

  }

  private val q14Sql =
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0 END)
         / sum(l_extendedprice*(1-l_discount)), 4) AS promo_share
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1996-06-01' AND l_shipdate < TIMESTAMP '1996-09-01'"""

  // -- Q18 shape: large-volume orders (aggregate-then-join) --------------------
  // The lineitem aggregate + HAVING collapses the fact side to a handful of
  // orderkeys BEFORE any join: the shrunken side then broadcasts through
  // orders and customer — neither big table shuffles for the joins.
  // Deliberately NO broadcast() hints: the aggregate's size is
  // data-dependent (the HAVING is selective, but the planner can't bound
  // it statically), and a forced hint on an unbounded side is how a 100×
  // run OOMs the driver. AQE observes the aggregate's RUNTIME size and
  // converts the sort-merge joins to broadcast joins itself — asserted
  // with a negative control in TpchShapesSpec.
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 300)
    val ob = t(s, dir, "orders").join(big, col("o_orderkey") === col("l_orderkey"))
    t(s, dir, "customer").join(ob, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  private val q18Sql =
    """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
         FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
       SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice, total_qty
       FROM big JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""

  // -- Q19 shape: disjunctive predicate pushdown (OR-of-ANDs join filter) ------
  // The classic optimizer test: three brand/size/quantity conjunctions
  // OR-ed across BOTH join sides. Catalyst must extract the common
  // per-side disjunctions (p_brand IN..., l_quantity >= 20) into the scans
  // while keeping the cross-side residual on the join — a plan that ships
  // only candidate rows into the broadcast probe.
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val branch1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
      col("l_quantity") >= 20
    val branch2 = col("p_brand") === "Brand#3" && col("p_size").between(10, 30) &&
      col("l_quantity") >= 30
    val branch3 = col("p_brand") === "Brand#5" && col("p_size").between(20, 40) &&
      col("l_quantity") >= 40
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  private val q19Sql =
    """SELECT count(*) AS n_items,
       round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand='Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20)
          OR (p_brand='Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 30)
          OR (p_brand='Brand#5' AND p_size BETWEEN 20 AND 40 AND l_quantity >= 40)"""

  // -- Q22 shape: wealthy-but-inactive customers (scalar subquery + anti) ------
  // The global average is one tiny aggregate broadcast as a cross join (the
  // decorrelation of Q22's scalar subquery); recent orders anti-join away
  // active customers; the survivors aggregate by segment.
  private def q22(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val cutoff = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("cut"))
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-06-01")))
    cust.crossJoin(broadcast(cutoff))
      .filter(col("c_acctbal") > col("cut"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"), round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  private val q22Sql =
    """WITH cutoff AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
       SELECT c_mktsegment, count(*) AS n_custs, round(sum(c_acctbal), 2) AS total_bal
       FROM customer, cutoff
       WHERE c_acctbal > cutoff.a
         AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND o_orderdate >= TIMESTAMP '1997-06-01')
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // -- Q7 shape: nation-pair shipping volume -----------------------------------
  // Two independent dimension chains (supplier→nation→region and
  // customer→nation→region) hang off one fact-fact join; the pair predicate
  // is an OR across BOTH chains, so neither disjunct can push into a single
  // scan — the planner keeps it above the joins while the per-chain region
  // columns arrive via broadcast. The supplier chain broadcasts (tiny); the
  // customer join is left unhinted — customer is a large dimension at scale
  // and AQE picks the strategy from runtime sizes.
  private def q7(s: SparkSession, dir: String): DataFrame = {
    val nr = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
    val sup = t(s, dir, "supplier")
      .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"), col("r_name").as("supp_region"))
    val cust = t(s, dir, "customer")
      .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"), col("r_name").as("cust_region"))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_region") === "ASIA" && col("cust_region") === "EUROPE") ||
        (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      // q9's integer-cents device: per-row floor(rev*100+0.5) is identical on
      // both engines; summing longs is order-independent, so the revenue is
      // immune to the half-cent partial-agg-order instability that
      // round(sum(double), 2) carries (see the q9 comment).
      .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * lit(100)
        + lit(0.5)).cast("long")) / 100.0).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql =
    """WITH sup AS (SELECT s_suppkey, n_name AS supp_nation, r_name AS supp_region
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey),
       cust AS (SELECT c_custkey, n_name AS cust_nation, r_name AS cust_region
         FROM customer JOIN nation ON c_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey)
       SELECT supp_nation, cust_nation, CAST(year(l_shipdate) AS INT) AS l_year,
         sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) / 100.0 AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN sup ON l_suppkey = s_suppkey
         JOIN cust ON o_custkey = c_custkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         AND ((supp_region = 'ASIA' AND cust_region = 'EUROPE')
           OR (supp_region = 'EUROPE' AND cust_region = 'ASIA'))
       GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  // -- Q8 shape: market share (conditional ratio inside a grouped agg) ---------
  // The numerator condition (supplier region) and the group key (order year)
  // come from DIFFERENT dimension chains than the market filter (customer
  // region) — the aggregate must see all rows of the market and split them
  // by supplier origin inside the sum, so nothing about the numerator can
  // prefilter the fact.
  private def q8(s: SparkSession, dir: String): DataFrame = {
    val nr = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
    val sup = t(s, dir, "supplier")
      .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("r_name").as("supp_region"))
    val asiaCust = t(s, dir, "customer")
      .join(broadcast(nr.filter(col("r_name") === "ASIA")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    // Integer-cents numerator/denominator (q9's device): both sums are exact
    // long sums, so the ratio — and its 4-dp rounding — is bit-identical
    // across engines regardless of aggregation order.
    val revCents = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * lit(100)
      + lit(0.5)).cast("long")
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_region") === "EUROPE", revCents).otherwise(lit(0L)))
          .cast("double") / sum(revCents), 4)
        .as("mkt_share"))
      .orderBy("o_year")
  }

  private val q8Sql =
    """WITH sup AS (SELECT s_suppkey, r_name AS supp_region
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey)
       SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         round(CAST(sum(CASE WHEN supp_region = 'EUROPE'
               THEN CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)
               ELSE 0 END) AS DOUBLE)
           / sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)), 4) AS mkt_share
       FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN sup ON l_suppkey = s_suppkey
       WHERE p_type = 'ECONOMY'
         AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         AND EXISTS (SELECT 1 FROM customer JOIN nation ON c_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
                     WHERE c_custkey = o_custkey AND r_name = 'ASIA')
       GROUP BY 1 ORDER BY 1"""

  // -- Q9 shape: product-type profit by nation and year ------------------------
  // Profit needs columns from three tables at once (price/discount from
  // lineitem, retail price from part, year from orders) — the arithmetic
  // can only happen after the joins, so the test is whether the name filter
  // reaches the part scan and the small sides broadcast. The reference
  // cost ps_supplycost has no table here; a fixed 10% of retail per unit
  // stands in (exact same expression on both sides).
  //
  // The per-group sum is an integer-cents sum, not round(sum(double), 2):
  // with ~175 groups the double sum lands within an ulp of a half-cent
  // often enough that Spark's partial-agg addition order and DuckDB's
  // sequential order round to different cents (bit this at sf0.001, 2 of
  // 175 groups). Per-row `floor(profit*100 + 0.5)` is computed from
  // IDENTICAL ieee inputs on both sides — bit-equal even at boundaries —
  // and the BIGINT sum is order-independent.
  private def q9(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      lit(0.1) * col("p_retailprice") * col("l_quantity")
    val cents = floor(profit * lit(100) + lit(0.5)).cast("long")
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_name").like("%widget%"))),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("supp_nation"), year(col("o_orderdate")).as("o_year"))
      .agg((sum(cents) / 100.0).as("profit"))
      .orderBy(col("supp_nation"), col("o_year").desc)
  }

  private val q9Sql =
    """SELECT n_name AS supp_nation, CAST(year(o_orderdate) AS INT) AS o_year,
         sum(CAST(floor((l_extendedprice*(1-l_discount) - 0.1*p_retailprice*l_quantity)*100 + 0.5)
             AS BIGINT)) / 100.0 AS profit
       FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
       WHERE p_name LIKE '%widget%'
       GROUP BY 1, 2 ORDER BY supp_nation, o_year DESC"""

  // -- Q11 shape: important inventory value (HAVING vs scalar subquery) --------
  // The same measure is aggregated twice — once per part, once globally —
  // and the global value returns as a one-row broadcast compared against
  // every group (Q11's decorrelated HAVING). The reference's fixed
  // 0.0001/SF fraction bakes the scale factor into the query; a
  // scale-invariant threshold (1.5× the mean per-part value) keeps the
  // shape and stays non-empty at every SF.
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val scope = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "AFRICA")),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    // Integer-cents group sums (q9's device): `v_cents` is an exact long on
    // both engines, so the per-part values AND the 1.5×mean cut derive from
    // the same exact integers — no group can flip membership on a 1-ulp
    // difference between independently recomputed double sums.
    val vals = t(s, dir, "lineitem")
      .join(broadcast(scope), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_extendedprice") * lit(100) + lit(0.5)).cast("long")).as("v_cents"))
    val cut = vals.agg((lit(1.5) * sum(col("v_cents")) / count(lit(1))).as("cut"))
    vals.crossJoin(broadcast(cut))
      .filter(col("v_cents") > col("cut"))
      .select(col("l_partkey"), (col("v_cents") / 100.0).as("inv_value"))
      .orderBy(col("inv_value").desc, col("l_partkey"))
  }

  private val q11Sql =
    """WITH scope AS (SELECT s_suppkey FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'AFRICA'),
       vals AS (SELECT l_partkey,
           sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS v
         FROM lineitem WHERE EXISTS (SELECT 1 FROM scope WHERE s_suppkey = l_suppkey)
         GROUP BY 1),
       cut AS (SELECT 1.5 * sum(v) / count(*) AS c FROM vals)
       SELECT l_partkey, v / 100.0 AS inv_value
       FROM vals, cut WHERE v > c
       ORDER BY inv_value DESC, l_partkey"""

  // -- Q13 shape: customer order-count distribution ----------------------------
  // The canonical double aggregation over an OUTER join: zero-order
  // customers must survive (count(o_orderkey) = 0, not a dropped row), then
  // the per-customer counts are themselves grouped into a histogram. The
  // join-side filter (order priority, standing in for Q13's comment
  // anti-pattern) must apply BEFORE the outer join, not as a WHERE after it
  // — pushing it below the join is exactly what preserves the zero groups.
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val ords = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_orderkey"), col("o_custkey"))
    t(s, dir, "customer")
      .join(ords, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql =
    """SELECT c_count, count(*) AS custdist FROM (
         SELECT c_custkey, count(o_orderkey) AS c_count
         FROM customer LEFT OUTER JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
         GROUP BY c_custkey)
       GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  // -- Q15 shape: top supplier by revenue (agg vs its own max) -----------------
  // The revenue aggregate is compared against the max over ITSELF — Q15's
  // view-plus-scalar-subquery. The max arrives as a one-row broadcast.
  // The grouped revenue is an integer-cents sum (q9's device): Spark
  // instantiates `rev` in BOTH subtrees of the self-comparison and merges
  // partial aggregates in shuffle-fetch order, so a double sum could differ
  // in the last ulp between the two copies and empty the result; exact long
  // sums are order-independent, making the equality deterministic within
  // AND across engines.
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      .groupBy(col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * lit(100)
        + lit(0.5)).cast("long")).as("rev_cents"))
    val top = rev.agg(max(col("rev_cents")).as("max_cents"))
    t(s, dir, "supplier")
      .join(rev.crossJoin(broadcast(top)).filter(col("rev_cents") === col("max_cents")),
        col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), (col("rev_cents") / 100.0).as("total_rev"))
      .orderBy("s_suppkey")
  }

  private val q15Sql =
    """WITH rev AS (SELECT l_suppkey,
           sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS rev_cents
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
         GROUP BY 1)
       SELECT s_suppkey, s_name, rev_cents / 100.0 AS total_rev
       FROM supplier JOIN rev ON s_suppkey = l_suppkey
       WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
       ORDER BY s_suppkey"""

  // -- Q17 shape: small-quantity revenue (per-group avg joined back) -----------
  // Q17's correlated avg subquery decorrelates to a per-part aggregate
  // joined back with an INEQUALITY on the averaged value (q2 does the same
  // with min and equality). The brand filter shrinks the part side enough
  // to broadcast both the dimension and the per-part averages.
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_brand") === "Brand#2")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgs = li.groupBy(col("l_partkey")).agg(avg(col("l_quantity")).as("avg_qty"))
      .withColumnRenamed("l_partkey", "ak")
    li.join(broadcast(avgs), col("l_partkey") === col("ak") &&
        col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  private val q17Sql =
    """WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice
         FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_brand = 'Brand#2'),
       avgs AS (SELECT l_partkey, avg(l_quantity) AS avg_qty FROM li GROUP BY 1)
       SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
       FROM li JOIN avgs ON li.l_partkey = avgs.l_partkey
       WHERE l_quantity < 0.2 * avg_qty"""

  // -- Q20 shape: excess-volume suppliers (nested agg feeding a semi join) -----
  // Two stacked aggregates over the same filtered fact — per (supplier,
  // part) and per part — joined to flag suppliers holding > 1/4 of a
  // part's annual volume, then the flagged keys semi-join the supplier
  // dimension. The 0.25 threshold is a power of two and quantities are
  // small integers, so the comparison is EXACT in binary on both engines
  // (no epsilon at any scale).
  private def q20(s: SparkSession, dir: String): DataFrame = {
    val joint = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")))
      .join(broadcast(t(s, dir, "part").filter(col("p_name").like("small%"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("supp_qty"))
    val ptot = joint.groupBy(col("l_partkey")).agg(sum(col("supp_qty")).as("part_qty"))
      .withColumnRenamed("l_partkey", "pk")
    val excess = joint.join(ptot, col("l_partkey") === col("pk"))
      .filter(col("supp_qty") > lit(0.25) * col("part_qty"))
      .select(col("l_suppkey")).distinct()
    t(s, dir, "supplier")
      .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  private val q20Sql =
    """WITH joint AS (SELECT l_suppkey, l_partkey, sum(l_quantity) AS supp_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_name LIKE 'small%'
           AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY 1, 2),
       ptot AS (SELECT l_partkey, sum(supp_qty) AS part_qty FROM joint GROUP BY 1)
       SELECT s_suppkey, s_name FROM supplier
       WHERE EXISTS (SELECT 1 FROM joint JOIN ptot ON joint.l_partkey = ptot.l_partkey
                     WHERE joint.l_suppkey = s_suppkey AND supp_qty > 0.25 * part_qty)
       ORDER BY s_suppkey"""

  // -- Q21 shape: suppliers who kept orders waiting (sole-late-supplier) -------
  // EXISTS ("someone else shipped in this order") and NOT EXISTS ("no one
  // else was late") are per-ORDER facts, so instead of the literal
  // semi + anti SELF-joins on the fact table (three consultations of
  // lineitem, each a wide (orderkey, suppkey)-pair shuffle — the r10 bench
  // had this at 15 s on 100× data, the slowest relational gate), fold both
  // quantifiers into two per-order aggregates:
  //   cnt_all(o)  = distinct suppliers in order o         (EXISTS other ⟺ >1)
  //   cnt_late(o) = distinct LATE suppliers, + min = THE supplier when 1
  //                                           (NOT EXISTS other late ⟺ ==1)
  // A late supplier qualifies iff cnt_late(o)==1 ∧ cnt_all(o)>1 — one
  // orderkey-partitioned join of two aggregates replaces the pair-set
  // semi/anti joins; the count stays per order because the sole row IS one
  // order. Output order (numwait DESC, s_name) is total because s_name is
  // the group key — the LIMIT is deterministic. Oracle keeps the literal
  // EXISTS/NOT-EXISTS formulation, so the equivalence itself is
  // hash-checked.
  private def q21(s: SparkSession, dir: String): DataFrame = {
    // ONE pass over the fact: join F-orders once, then a TWO-LEVEL
    // aggregation — (orderkey, suppkey) first (map-side combine collapses
    // the fact to distinct pairs; lateness folds into a per-pair flag),
    // then per-order counts over the already-collapsed pairs. The previous
    // shape aggregated lineitem TWICE (the late-join agg + a full-table
    // countDistinct) and joined the two aggregates — a second fact-scale
    // scan+shuffle this fuses away. Restricting the "all suppliers" count
    // to F-orders changes nothing: only F-orders survive the late filter.
    // Two-level beats two countDistinct in one groupBy, which would Expand
    // (duplicate) every fact row per distinct aggregate.
    val perPair = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"), 1)
        .otherwise(0)).as("is_late"))
    perPair
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("cnt_all"),
        sum(col("is_late")).as("cnt_late"),
        min(when(col("is_late") === 1, col("l_suppkey"))).as("sole_supp"))
      .filter(col("cnt_late") === 1 && col("cnt_all") > 1)
      .groupBy(col("sole_supp").as("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  private val q21Sql =
    """WITH late AS (SELECT DISTINCT l_orderkey, l_suppkey
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F'
           AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       SELECT s_name, count(*) AS numwait
       FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
       WHERE EXISTS (SELECT 1 FROM lineitem l2
               WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM late l3
               WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
       GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost" -> (q2 _),
    "q4_late_exists" -> (q4 _),
    "q7_nation_volume" -> (q7 _),
    "q8_market_share" -> (q8 _),
    "q9_product_profit" -> (q9 _),
    "q11_important_stock" -> (q11 _),
    "q13_order_dist" -> (q13 _),
    "q15_top_supplier" -> (q15 _),
    "q16_supplier_count" -> (q16 _),
    "q17_small_qty" -> (q17 _),
    "q12_priority" -> (q12 _),
    "q14_promo" -> (q14 _),
    "q18_large_orders" -> (q18 _),
    "q19_disjunctive" -> (q19 _),
    "q20_excess_supply" -> (q20 _),
    "q21_waiting_suppliers" -> (q21 _),
    "q22_inactive" -> (q22 _))

  override val oracles: Map[String, String] = Map(
    "q2_min_cost" -> q2Sql,
    "q4_late_exists" -> q4Sql,
    "q7_nation_volume" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "q9_product_profit" -> q9Sql,
    "q11_important_stock" -> q11Sql,
    "q13_order_dist" -> q13Sql,
    "q15_top_supplier" -> q15Sql,
    "q16_supplier_count" -> q16Sql,
    "q17_small_qty" -> q17Sql,
    "q12_priority" -> q12Sql,
    "q14_promo" -> q14Sql,
    "q18_large_orders" -> q18Sql,
    "q19_disjunctive" -> q19Sql,
    "q20_excess_supply" -> q20Sql,
    "q21_waiting_suppliers" -> q21Sql,
    "q22_inactive" -> q22Sql)
}
