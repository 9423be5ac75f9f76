package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass hybrid column profiler — the data-profiling primitive a curation
  * job points at a 100 TB fact table first.
  *
  * Design constraint: the profile of N columns must cost ONE scan and ONE
  * map-side-combinable aggregation, never an Expand. Spark's multi-distinct
  * rewrite (`countDistinct(a), countDistinct(b), ...` in one aggregate)
  * plans an Expand that multiplies every input row by the distinct-column
  * count and carries each key column's full value stream into the shuffle —
  * measured at 6.6 s/sf0.1 (9% of the whole 146-gate suite) in the round-9
  * audit, and the one scale-killer-shaped plan in the green set. The hybrid
  * sidesteps it:
  *
  *  - `ExactLowCard` columns use `size(collect_set(c))`: CollectSet is a
  *    map-side-combinable TypedImperativeAggregate whose buffer is bounded
  *    by the column's true cardinality, so a flag/status/date column costs
  *    a few-KB set per task and the shuffle moves one small set per
  *    partition. The caller DECLARES the column low-cardinality; that is
  *    the contract (a mis-declared key column degrades to a giant set —
  *    use `Approx` for keys).
  *  - `Approx(rsd)` columns use HLL++ (`approx_count_distinct`): fixed
  *    ~KB buffer regardless of cardinality, merged map-side. The estimate
  *    is engine-specific, so gates that hash-compare against an oracle
  *    must project it through an error-bound flag (see
  *    `AdvancedQueries.qProfile`) rather than emit the raw estimate.
  *
  * Null counts, min/max and row count ride in the same aggregate. All
  * aggregates are partial-aggregable, so the only shuffle is the 1-row
  * final merge — the profile costs one scan at any table size.
  */
object ColumnProfiler {

  /** How to count distinct values for a profiled column. */
  sealed trait DistinctMode
  /** Exact count via a bounded collect_set — ONLY for columns the caller
    * can prove low-cardinality (flags, enums, dates, small codes).
    */
  case object ExactLowCard extends DistinctMode
  /** HLL++ estimate with the given relative standard deviation — the
    * default for keys and other unbounded-cardinality columns.
    */
  final case class Approx(rsd: Double = 0.02) extends DistinctMode

  /** One profiled column: its name, the distinct strategy, and how to
    * render min/max into a cross-engine-stable string (dates through
    * date_format, doubles through floor, strings as-is).
    */
  final case class ColSpec(
      name: String,
      distinct: DistinctMode,
      render: Column => Column = _.cast("string"))

  /** Long-format profile: one row per profiled column with columns
    * (col_name, n_rows, n_nulls, n_distinct, nd_exact, min_s, max_s),
    * ordered by col_name. `n_distinct` is the exact cardinality for
    * `ExactLowCard` columns and the HLL estimate for `Approx` columns;
    * `nd_exact` says which. ONE scan, ONE map-side-combinable aggregate,
    * no Expand (asserted by AnalyticsQueriesSpec).
    */
  def profile(df: DataFrame, specs: Seq[ColSpec]): DataFrame = {
    require(specs.nonEmpty, "profile of zero columns")
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: specs.flatMap { sp =>
      val c = col(sp.name)
      val nd = sp.distinct match {
        case ExactLowCard => size(collect_set(c)).cast("bigint")
        case Approx(rsd) => approx_count_distinct(c, rsd)
      }
      Seq(
        count(when(c.isNull, 1)).as(s"null_${sp.name}"),
        nd.as(s"nd_${sp.name}"),
        sp.render(min(c)).as(s"min_${sp.name}"),
        sp.render(max(c)).as(s"max_${sp.name}"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = specs.map { sp =>
      val isExact = sp.distinct == ExactLowCard
      s"'${sp.name}', null_${sp.name}, nd_${sp.name}, $isExact, min_${sp.name}, max_${sp.name}"
    }.mkString(", ")
    wide
      .selectExpr("n_rows",
        s"stack(${specs.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, nd_exact, min_s, max_s)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        col("nd_exact"), col("min_s"), col("max_s"))
      .orderBy("col_name")
  }
}
