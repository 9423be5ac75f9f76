package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus (where ANSI-SQL-expressible) DuckDB oracle
  * SQL for the driver's correctness gate.
  *
  * Conventions (required for the oracle hash-compare to be meaningful):
  *  - every query's output is deterministically and totally ordered;
  *  - every floating-point aggregate is rounded identically on both sides;
  *  - output column types are aligned (the oracle SQL casts DuckDB's wider
  *    defaults — BIGINT year(), HUGEINT sum(int) — down to Spark's types);
  *  - no raw TIMESTAMP columns in output (epoch seconds or DATE instead),
  *    sidestepping timezone/precision representation differences.
  */
trait QueryPack {
  /** name -> (session, sfDir) -> result DataFrame. */
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB-runnable SQL for the subset of `queries` that is expressible;
    * keys are a subset of `queries.keySet`. Unlisted queries get the
    * driver's weaker rows-only check.
    */
  def oracles: Map[String, String]

  /** Load one of the driver-generated parquet tables.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp; read it as a raw long (legacy conf) and truncate to
    * microseconds with integer division (a double division would lose
    * precision at 1e18 nanos — beyond the 53-bit mantissa). DuckDB performs
    * the same floor-truncation to its native micros, so results align.
    */
  protected def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
