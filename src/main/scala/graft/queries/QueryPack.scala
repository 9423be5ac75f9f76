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
    * `events.ts` has drifted across fixture generations: TIMESTAMP(NANOS)
    * (which Spark 4 only reads as a raw long under the legacy conf) vs
    * TIMESTAMP(MICROS) `isAdjustedToUTC=false` (which Spark reads natively
    * as TIMESTAMP_NTZ). Branch on the dtype Spark actually infers so either
    * vintage of fixture yields the same session-TZ (UTC) TimestampType
    * column:
    *  - LongType → nanos-as-long: floor-truncate to micros with integer
    *    division (double division would lose precision at 1e18 nanos —
    *    beyond the 53-bit mantissa); DuckDB floor-truncates identically.
    *  - TimestampNTZType → reinterpret the wall-clock as session TZ (UTC),
    *    matching DuckDB's naive-timestamp reading of the same file.
    *  - TimestampType → already aligned; pass through.
    * Any other dtype fails loudly so fixture drift is one visible error,
    * not N silently-broken gates.
    */
  protected def t(s: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // NTZ→Timestamp cast interprets the wall-clock in the session TZ,
        // which LocalSession/Verify/Bench all pin to UTC.
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts read as unexpected type $other (fixture drift? " +
            "expected LongType nanos, TIMESTAMP_NTZ micros, or TIMESTAMP)")
    }
  }
}
