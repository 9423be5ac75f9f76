package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: the join over two same-bucketed tables must
  * plan with ZERO shuffle exchanges (the write-time bucketing IS the
  * shuffle), and results must equal the plain-join answer.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  test("join over same-bucketed tables plans with zero exchanges, same answer") {
    val orders = (1L to 1000L).map(i => (i, s"status${i % 3}")).toDF("okey", "status")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, i * 1.5)).toDF("okey", "price")
    Bucketing.writeBucketed(orders, "b_orders", buckets = 4, keys = Seq("okey"))
    Bucketing.writeBucketed(items, "b_items", buckets = 4, keys = Seq("okey"))
    try {
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_items", Seq("okey"))
        .groupBy("status").count()
      joined.collect() // force final (adaptive) plan
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // one shuffle allowed for the AGGREGATION on `status`; the JOIN itself
      // must not shuffle — so strictly fewer exchanges than the unbucketed
      // dual (which needs one per join side + one for the agg)
      assert(shuffles.size <= 1, s"expected at most the agg exchange, got ${shuffles.size}:\n" +
        joined.queryExecution.executedPlan)
      // and the pure join plans with ZERO exchanges
      val pureJoin = Bucketing.coLocatedJoin(spark, "b_orders", "b_items", Seq("okey"))
      pureJoin.collect()
      val joinShuffles = pureJoin.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(joinShuffles.isEmpty, s"bucketed join must not shuffle:\n${pureJoin.queryExecution.executedPlan}")
      // correctness: equals the plain join
      val expected = orders.join(items, "okey").count()
      assert(pureJoin.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
