package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located join: writing both sides bucketed by the join
  * key lets Spark sort-merge-join WITHOUT a shuffle exchange on either side
  * — the pre-partitioning strategy for repeated fact-fact joins at 100 TB
  * (pay the shuffle once at write time, never again at read time).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    // default warehouse dir (spark-warehouse/ under cwd); tables dropped below
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")

    val orders = spark.range(0, 1000).select(col("id").as("okey"),
      (col("id") % 7).cast("double").as("total"))
    val lines = spark.range(0, 5000).select((col("id") % 1000).as("okey"),
      (col("id") % 13).cast("double").as("qty"))
    orders.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_orders")
    lines.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_lines")

    // disable broadcast so the join strategy is SMJ, the case bucketing serves
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lines"), "okey")
      joined.collect() // materialize through AQE
      val plan = joined.queryExecution.executedPlan
      val finalPlan = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = finalPlan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"expected shuffle-free bucketed join, got:\n$finalPlan")
      assert(joined.count() == 5000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}
