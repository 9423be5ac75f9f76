package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistics-driven join planning: the explicit broadcast() hints in the
  * query packs are documentation of intent, not a crutch — Catalyst's
  * size-based statistics pick the broadcast side for a small dimension on
  * their own. Asserted with its negative control (threshold off → the same
  * join degrades to sort-merge), so the test proves the STATISTICS drive
  * the choice, not a default.
  */
class AutoBroadcastSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(threshold: String): String = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val customer = spark.read.parquet(s"$dir/customer.parquet")
      // no broadcast() hint anywhere: the planner must decide from stats
      orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("file-size statistics auto-broadcast a small dimension; threshold off → SMJ") {
    val auto = plan("10MB")
    assert(auto.contains("BroadcastHashJoin"), s"expected stats-driven broadcast:\n$auto")
    val off = plan("-1")
    assert(!off.contains("BroadcastHashJoin") && off.contains("SortMergeJoin"),
      s"negative control failed — threshold off must fall back to SMJ:\n$off")
  }
}
