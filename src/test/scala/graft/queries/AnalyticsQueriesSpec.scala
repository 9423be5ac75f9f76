package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Invariants of the funnel and column-profiler gates (values are
  * hash-checked against DuckDB by the driver; these pin the structural
  * properties that must survive refactors).
  */
class AnalyticsQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("funnel: stages are monotonically non-increasing and bounded by users") {
    val r = EventQueries.queries("q_funnel_steps")(spark, dir).head()
    val (users, view, viewClick, full) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users > 0)
    assert(view <= users && viewClick <= view && full <= viewClick,
      s"funnel not monotone: $users >= $view >= $viewClick >= $full")
    assert(view > 0, "fixture has view events; stage 1 cannot be empty")
  }

  test("profiler: one row per column; exact stats for low-card, bound-checked HLL for keys") {
    val rows = AdvancedQueries.queries("q_profile_columns")(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("l_linestatus", "l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val n = li.count()
    assert(rows.forall(_.getLong(1) == n), "n_rows must equal the table count on every row")
    assert(rows.forall(_.getLong(2) == 0), "driver fixture has no nulls")
    val rfRow = rows.find(_.getString(0) == "l_returnflag").get
    assert(rfRow.getLong(3) == li.select("l_returnflag").distinct().count(),
      "low-card column must profile the EXACT distinct count")
    val okRow = rows.find(_.getString(0) == "l_orderkey").get
    assert(okRow.isNullAt(3), "HLL column emits NULL n_distinct (estimate is engine-specific)")
    assert(rows.forall(_.getBoolean(4)), "every nd_ok flag (HLL within 5% of exact) must hold")
  }

  test("profiler core plans ONE scan and NO Expand (the r9 scale fix)") {
    import graft.operators.ColumnProfiler
    import graft.operators.ColumnProfiler.{Approx, ColSpec, ExactLowCard}
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val plan = ColumnProfiler.profile(li, Seq(
      ColSpec("l_returnflag", ExactLowCard),
      ColSpec("l_orderkey", Approx(0.02)),
      ColSpec("l_quantity", Approx(0.02))))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected a single lineitem scan, plan has $scans")
    assert(!plan.contains("Expand"),
      "hybrid profile must NOT plan the multi-distinct Expand — that was the 5x scale killer")
  }

  test("profiler gate: 3 pruned scans (profile + two exact HLL validators), still no Expand") {
    val plan = AdvancedQueries.queries("q_profile_columns")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 3, s"profile scan + 2 single-column exact validators, got $scans")
    assert(!plan.contains("Expand"), "no multi-distinct Expand anywhere in the gate plan")
  }
}
