package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located join: writing both sides bucketed by the join
  * key lets Spark sort-merge-join WITHOUT a shuffle exchange on either side
  * — the pre-partitioning strategy for repeated fact-fact joins at 100 TB
  * (pay the shuffle once at write time, never again at read time).
  *
  * Assertion rigor: the executed plan must be unwrapped from
  * AdaptiveSparkPlanExec (it is a leaf — collecting over it finds nothing,
  * making a shuffle assertion vacuously pass), and broadcast joins must be
  * disabled (a broadcast join is shuffle-free regardless of bucketing and
  * would also make the assertion prove nothing).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  private def unwrapped(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // materialize through AQE to reach the final plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Count shuffle exchanges in the RENDERED plan: under AQE an Exchange is
    * wrapped in a ShuffleQueryStage, which is a leaf from `collect`'s view —
    * node-collecting ShuffleExchangeExec silently misses every stage-wrapped
    * exchange (and would make a zero-shuffle assertion vacuous).
    */
  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r.findAllIn(unwrapped(df).toString).length

  test("join over same-bucketed tables plans with zero exchanges, same answer") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    val orders = (1L to 1000L).map(i => (i, s"status${i % 3}")).toDF("okey", "status")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, i * 1.5)).toDF("okey", "price")
    Bucketing.writeBucketed(orders, "b_orders", buckets = 4, keys = Seq("okey"))
    Bucketing.writeBucketed(items, "b_items", buckets = 4, keys = Seq("okey"))
    // force SMJ — the strategy bucketing serves; a broadcast join would be
    // shuffle-free for the wrong reason
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pureJoin = Bucketing.coLocatedJoin(spark, "b_orders", "b_items", Seq("okey"))
      val joinPlan = unwrapped(pureJoin)
      assert(joinPlan.toString.contains("SortMergeJoin"), s"expected SMJ:\n$joinPlan")
      assert(shuffleCount(pureJoin) == 0, s"bucketed join must not shuffle:\n$joinPlan")
      // sanity that the counter sees stage-wrapped exchanges at all: an agg
      // on a DIFFERENT key pays exactly its own exchange — and ONLY that one
      val agged = Bucketing.coLocatedJoin(spark, "b_orders", "b_items", Seq("okey"))
        .groupBy("status").count()
      assert(shuffleCount(agged) == 1, s"expected only the agg exchange:\n${unwrapped(agged)}")
      // negative control: the UNBUCKETED join shuffles both sides
      val unbucketed = orders.join(items, "okey")
      assert(shuffleCount(unbucketed) == 2, s"unbucketed dual should shuffle twice:\n${unwrapped(unbucketed)}")
      // correctness: equals the plain (unbucketed) join
      assert(pureJoin.count() == unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
