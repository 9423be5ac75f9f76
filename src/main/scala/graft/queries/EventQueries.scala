package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` table: tumbling windows and
  * gap-based sessionization. These are the batch duals of the Structured
  * Streaming pipelines in `graft.streaming` (same logic, same results on
  * bounded input).
  *
  * Outputs use epoch seconds (BIGINT) rather than raw timestamps so the
  * DuckDB comparison is representation-independent.
  */
object EventQueries extends QueryPack {

  // -- tumbling window aggregation ---------------------------------------------
  private def qTumbling(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2).as("sum_value"))
      .orderBy("hour_start", "event_type")

  private val qTumblingSql =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start, event_type,
       count(*) AS n, round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE),2) AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""

  // -- sliding window (1h window, 30m slide), expressed as dual tumbling halves --
  private def qSliding(s: SparkSession, dir: String): DataFrame = {
    // window(ts, '1 hour', '30 minutes') assigns each row to 2 slides; the
    // SQL-expressible dual: explode the two slide starts per row.
    // Sum in DECIMAL so the value is exact (double summation is
    // grouping-order-dependent and diverges from the oracle at round()
    // tie boundaries); DuckDB's epoch() must be floor()ed — its
    // double→BIGINT cast rounds, Spark's unix_timestamp truncates.
    val ev = t(s, dir, "events")
      .withColumn("slot", (unix_timestamp(col("ts")) / 1800).cast("long") * 1800)
    ev.select(col("slot").as("win_start"), col("value"))
      .union(ev.select((col("slot") - 1800).as("win_start"), col("value")))
      .groupBy(col("win_start"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2).as("sum_value"))
      .orderBy("win_start")
  }

  private val qSlidingSql =
    """WITH slotted AS (
         SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 AS slot, value FROM events),
       ex AS (
         SELECT slot AS win_start, value FROM slotted
         UNION ALL SELECT slot - 1800 AS win_start, value FROM slotted)
       SELECT win_start, count(*) AS n,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE),2) AS sum_value
       FROM ex GROUP BY win_start ORDER BY win_start"""

  // -- gap-based sessionization ----------------------------------------------------
  private def qSessions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_ms", unix_millis(lag(col("ts"), 1).over(w)))
      .withColumn("is_new",
        when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > lit(1800000L), 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  private val qSessionsSql =
    """WITH e AS (
         SELECT user_id, ts, epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS prev_ms
         FROM events)
       SELECT user_id,
         CAST(sum(CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
         count(*) AS n_events
       FROM e GROUP BY user_id ORDER BY user_id"""

  // -- per-session stats (session id assignment via running sum of boundaries) ------
  private def qSessionStats(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("prev_ms", unix_millis(lag(col("ts"), 1).over(w)))
      .withColumn("is_new",
        when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > lit(1800000L), 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        ((unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))) / lit(1000L)).cast("long").as("duration_s"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  private val qSessionStatsSql =
    """WITH e AS (
         SELECT user_id, ts, value, event_id,
                epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS prev_ms
         FROM events),
       s AS (
         SELECT user_id, ts, value,
                sum(CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM e)
       SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
              CAST((epoch_ms(max(ts)) - epoch_ms(min(ts))) // 1000 AS BIGINT) AS duration_s,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE),2) AS sum_value
       FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id"""

  // -- cohort retention: users grouped by first-seen week × activity week ---------
  // Integer-exact (counts of distinct users) so the hash gate is stable; the
  // first-seen window reuses the same user_id partitioning as the activity
  // aggregation — one shuffle feeds both.
  private def qCohort(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("ts"))
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), weekofyear(col("first_ts")).as("cohort_week"))
    ev.select(col("user_id"), weekofyear(col("ts")).as("active_week"))
      .distinct()
      .join(firstSeen, "user_id")
      .groupBy(col("cohort_week"), col("active_week"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "active_week")
  }

  private val qCohortSql =
    """WITH f AS (
         SELECT user_id, CAST(weekofyear(min(ts)) AS INT) AS cohort_week FROM events GROUP BY user_id),
       a AS (
         SELECT DISTINCT user_id, CAST(weekofyear(ts) AS INT) AS active_week FROM events)
       SELECT cohort_week, active_week, count(DISTINCT user_id) AS n_users
       FROM a JOIN f USING (user_id)
       GROUP BY cohort_week, active_week ORDER BY cohort_week, active_week"""

  // -- ordered funnel analysis -----------------------------------------------------
  /** Classic product-analytics funnel: per user, did the FIRST view precede
    * the FIRST click precede the FIRST purchase? One conditional-min
    * aggregate per user (single shuffle on user_id, map-side partials — the
    * same profile as any per-user rollup at 100 TB), then a broadcast-sized
    * count rollup; no self-joins, no per-step passes over the events.
    * Output is one row of stage counts — epoch math only, no raw
    * timestamps (pack convention).
    */
  private def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val firsts = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", unix_timestamp(col("ts")))).as("t_view"),
        min(when(col("event_type") === "click", unix_timestamp(col("ts")))).as("t_click"),
        min(when(col("event_type") === "purchase", unix_timestamp(col("ts")))).as("t_buy"))
    firsts.agg(
      count(lit(1)).as("n_users"),
      count(col("t_view")).as("n_view"),
      count(when(col("t_view") < col("t_click"), 1)).as("n_view_click"),
      count(when(col("t_view") < col("t_click") && col("t_click") < col("t_buy"), 1))
        .as("n_full_funnel"))
  }

  private val qFunnelSql =
    """WITH firsts AS (
         SELECT user_id,
           min(CASE WHEN event_type='view' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_view,
           min(CASE WHEN event_type='click' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_click,
           min(CASE WHEN event_type='purchase' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_buy
         FROM events GROUP BY user_id)
       SELECT count(*) AS n_users,
              count(t_view) AS n_view,
              count(CASE WHEN t_view < t_click THEN 1 END) AS n_view_click,
              count(CASE WHEN t_view < t_click AND t_click < t_buy THEN 1 END) AS n_full_funnel
       FROM firsts"""

  // -- event-path transition mining -------------------------------------------------
  /** Markov transition counts over per-user event paths: order each user's
    * events by (ts, event_id), lag the event type, count (prev → next)
    * pairs, keep the top 10. The per-user window shuffles once on user_id
    * (each user's path sorts within its partition — no global sort), the
    * transition rollup is a ≤|types|² aggregate, and the final ranking is a
    * bounded TakeOrdered. The standard "what do users do next"
    * product-analytics query, scale-safe because path state never leaves
    * its user partition.
    */
  private def qTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("prev_type"), col("next_type"))
      .limit(10)
  }

  private val qTransitionsSql =
    """WITH p AS (
         SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
         FROM events)
       SELECT prev_type, event_type AS next_type, count(*) AS n
       FROM p WHERE prev_type IS NOT NULL
       GROUP BY 1, 2 ORDER BY n DESC, prev_type, next_type LIMIT 10"""

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_transitions" -> (qTransitions _),
    "q_funnel_steps" -> (qFunnel _),
    "q_tumbling_hourly" -> (qTumbling _),
    "q_sliding_window" -> (qSliding _),
    "q_session_count" -> (qSessions _),
    "q_session_stats" -> (qSessionStats _),
    "q_cohort_retention" -> (qCohort _))

  override val oracles: Map[String, String] = Map(
    "q_event_transitions" -> qTransitionsSql,
    "q_funnel_steps" -> qFunnelSql,
    "q_tumbling_hourly" -> qTumblingSql,
    "q_sliding_window" -> qSlidingSql,
    "q_session_count" -> qSessionsSql,
    "q_session_stats" -> qSessionStatsSql,
    "q_cohort_retention" -> qCohortSql)
}
