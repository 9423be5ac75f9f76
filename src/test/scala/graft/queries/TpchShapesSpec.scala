package graft.queries

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** q18's aggregate-then-join must get its broadcasts ADAPTIVELY: the
  * HAVING-filtered aggregate's size is data-dependent, so the query carries
  * no broadcast() hint — AQE observes the runtime size of the shuffle stage
  * and converts the joins itself. The negative control (adaptive join
  * conversion off) proves the broadcast comes from AQE's runtime decision,
  * not from static file statistics or a leftover hint.
  */
class TpchShapesSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def q18FinalPlan(): String = {
    val df = TpchShapes.queries("q18_large_orders")(spark, dir)
    df.collect() // materialize so AQE finalizes its re-planning
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("q18: AQE converts the unbounded-aggregate joins to broadcast at runtime") {
    val plan = q18FinalPlan()
    assert(plan.contains("BroadcastHashJoin"),
      s"expected AQE to broadcast the HAVING-collapsed side:\n$plan")
    // and the result itself stays correct (driver gate covers values; this
    // pins non-emptiness so the plan assertion can't pass vacuously)
    assert(TpchShapes.queries("q18_large_orders")(spark, dir).count() > 0)
  }

  test("q13: every customer lands in exactly one histogram bucket (outer join keeps zero-groups)") {
    import org.apache.spark.sql.functions.sum
    val hist = TpchShapes.queries("q13_order_dist")(spark, dir)
    val total = hist.agg(sum("custdist")).head.getLong(0)
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(total == nCust,
      s"histogram covers $total customers but the table has $nCust — the outer join dropped rows")
  }

  test("q15: all returned suppliers share the single maximum revenue") {
    val rows = TpchShapes.queries("q15_top_supplier")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_rev")).distinct.length == 1,
      "q15 returned rows with differing revenue — the max-over-self compare is broken")
  }

  test("q13: the priority filter is pushed below the outer join into the orders scan") {
    val plan = TpchShapes.queries("q13_order_dist")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("4-NOT SPECIFIED"),
      s"expected the o_orderpriority predicate in the orders scan's PushedFilters:\n$plan")
  }

  test("q18 negative control: static planner alone (no AQE conversion) keeps SMJ") {
    val prevJoin = spark.conf.get("spark.sql.adaptive.enabled")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // static threshold can't see through the aggregate either way, but
      // pin it off for the aggregate side to make the control airtight
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = TpchShapes.queries("q18_large_orders")(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") && plan.contains("SortMergeJoin"),
        s"negative control failed — without AQE the unhinted joins must be SMJ:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevJoin)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }
}
