package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Window functions (ranking, lag, frames) and the as-of join.
  *
  * Scale notes: each query shuffles exactly once on the window partition key;
  * the per-key sort is Tungsten's external sorter (spills, no OOM). Top-k per
  * group filters `row_number <= k` immediately after the window so nothing
  * beyond k rows per key survives the stage.
  */
object WindowQueries extends QueryPack {

  // -- top-k per group -------------------------------------------------------
  private def qTopk(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders")
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("c_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
      .orderBy("c_custkey", "rn")
  }

  private val qTopkSql =
    """SELECT c_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
         SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 3 ORDER BY c_custkey, rn"""

  // -- running total (unbounded preceding frame) ------------------------------
  private def qRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qRunningSql =
    """SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_total
       FROM orders ORDER BY o_custkey, o_orderkey"""

  // -- lag / delta -------------------------------------------------------------
  private def qLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        round(col("value") - coalesce(lag(col("value"), 1).over(w), lit(0.0)), 2).as("delta"))
      .orderBy("event_id")
  }

  private val qLagSql =
    """SELECT event_id, user_id, value,
       lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       round(value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0),2) AS delta
       FROM events ORDER BY event_id"""

  // -- bounded frame (moving average) --------------------------------------------
  // avg over a double frame differs between engines at round() tie
  // boundaries (Spark's round(double) half-ups the shortest decimal repr,
  // DuckDB rounds the binary value — 72.085 → 72.09 vs 72.08). Make the
  // rounding decision in exact integer arithmetic instead: sum micro-units
  // (value at 6 decimals × 1e6, exact), then HALF_UP to cents via
  // floor((2S + 1e4·n) / (2e4·n)). All intermediates < 2^53, so the double
  // math is exact and bit-identical in both engines.
  private def qMovingAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    val s6 = sum((col("value").cast("decimal(18,6)") * 1000000).cast("long")).over(w)
    val n = count(lit(1)).over(w)
    t(s, dir, "events")
      .select(col("event_id"),
        (floor((s6 * 2 + n * 10000).cast("double") / (n * 20000)) / 100).as("mavg"))
      .orderBy("event_id")
  }

  private val qMovingAvgSql =
    """WITH f AS (
         SELECT event_id,
                sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) OVER w AS s6,
                count(*) OVER w AS n
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
       SELECT event_id, floor((s6*2 + n*10000) / (n*20000.0)) / 100 AS mavg
       FROM f ORDER BY event_id"""

  // -- first_value / last_value / nth_value over an explicit full frame -------------
  private def qFirstLast(s: SparkSession, dir: String): DataFrame = {
    val full = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "events")
      .select(col("user_id"),
        first(col("event_id")).over(full).as("first_event"),
        last(col("event_id")).over(full).as("last_event"),
        nth_value(col("event_id"), 2).over(full).as("second_event"))
      .distinct()
      .orderBy("user_id")
  }

  private val qFirstLastSql =
    """SELECT DISTINCT user_id,
       first_value(event_id) OVER w AS first_event,
       last_value(event_id) OVER w AS last_event,
       nth_value(event_id, 2) OVER w AS second_event
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY user_id"""

  // -- rank / dense_rank / ntile ---------------------------------------------------
  private def qRanks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy("c_custkey")
  }

  private val qRanksSql =
    """SELECT c_custkey, c_nationkey,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       CAST(ntile(4) OVER w AS INT) AS quartile
       FROM customer
       WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
       ORDER BY c_custkey"""

  // -- as-of join (custom operator; oracle = DuckDB's native ASOF JOIN) -----------
  private def qAsof(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === lit("purchase"))
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === lit("signup"))
      .select(col("user_id"), col("ts"), col("event_id").as("signup_event_id"))
    AsOfJoin(purchases, signups,
      keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      rightCols = Seq("signup_event_id"))
      .select(col("event_id"), col("user_id"), col("signup_event_id"))
      .orderBy("event_id")
  }

  private val qAsofSql =
    """SELECT p.event_id, p.user_id, s.event_id AS signup_event_id
       FROM (SELECT * FROM events WHERE event_type='purchase') p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='signup') s
       ON p.user_id = s.user_id AND p.ts >= s.ts
       ORDER BY p.event_id"""

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_per_group" -> (qTopk _),
    "q_window_running" -> (qRunning _),
    "q_window_lag" -> (qLag _),
    "q_window_moving_avg" -> (qMovingAvg _),
    "q_window_ranks" -> (qRanks _),
    "q_window_first_last" -> (qFirstLast _),
    "q_asof_join" -> (qAsof _))

  override val oracles: Map[String, String] = Map(
    "q_topk_per_group" -> qTopkSql,
    "q_window_running" -> qRunningSql,
    "q_window_lag" -> qLagSql,
    "q_window_moving_avg" -> qMovingAvgSql,
    "q_window_ranks" -> qRanksSql,
    "q_window_first_last" -> qFirstLastSql,
    "q_asof_join" -> qAsofSql)
}
