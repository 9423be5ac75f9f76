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
  *
  * All oracle-checked; date filters are chosen so every output is non-empty
  * at sf0.001.
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

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost" -> (q2 _),
    "q4_late_exists" -> (q4 _),
    "q16_supplier_count" -> (q16 _),
    "q12_priority" -> (q12 _),
    "q14_promo" -> (q14 _),
    "q18_large_orders" -> (q18 _),
    "q19_disjunctive" -> (q19 _),
    "q22_inactive" -> (q22 _))

  override val oracles: Map[String, String] = Map(
    "q2_min_cost" -> q2Sql,
    "q4_late_exists" -> q4Sql,
    "q16_supplier_count" -> q16Sql,
    "q12_priority" -> q12Sql,
    "q14_promo" -> q14Sql,
    "q18_large_orders" -> q18Sql,
    "q19_disjunctive" -> q19Sql,
    "q22_inactive" -> q22Sql)
}
