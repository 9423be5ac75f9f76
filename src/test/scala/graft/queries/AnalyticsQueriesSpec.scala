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

  test("profiler: one row per profiled column, exact stats vs direct queries") {
    import spark.implicits._
    val rows = AdvancedQueries.queries("q_profile_columns")(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("l_linestatus", "l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val n = li.count()
    assert(rows.forall(_.getLong(1) == n), "n_rows must equal the table count on every row")
    assert(rows.forall(_.getLong(2) == 0), "driver fixture has no nulls")
    val ndOrderkey = li.select("l_orderkey").distinct().count()
    val profiled = rows.find(_.getString(0) == "l_orderkey").get.getLong(3)
    assert(profiled == ndOrderkey, s"exact distinct mismatch: $profiled vs $ndOrderkey")
  }

  test("profiler plans ONE scan of lineitem (Expand, not per-column passes)") {
    val plan = AdvancedQueries.queries("q_profile_columns")(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected a single lineitem scan, plan has $scans")
    assert(plan.contains("Expand"), "multi-distinct profile should plan an Expand")
  }
}
