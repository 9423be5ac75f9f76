package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join demonstration — the AUTOMATIC complement to the manual
  * salting of SkewJoin/q_salted_join: with adaptive skew handling on, a
  * sort-merge join whose one key dominates gets its oversized partition
  * split at runtime (the SMJ node reports `skew=true`), with identical
  * results. At 100 TB this is the first line of defense; explicit salting
  * remains for the cases AQE can't see (aggregations, broadcast-ineligible
  * plans with extreme single-key skew).
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  test("AQE splits a skewed SMJ partition at runtime (skew=true), same answer") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    // tiny thresholds so test-sized data triggers the same runtime re-plan
    // a 100 TB shuffle hits with the defaults; coalescing off so the small
    // non-skewed partitions aren't merged before the skew check
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // key 1 carries 200k of 201k rows — one shuffle partition dwarfs the rest
      val left = ((1 to 200000).map(_ => 1L) ++ (2L to 1001L)).toDF("k")
      val right = (1L to 1001L).map(i => (i, i * 2)).toDF("k", "v")
      val joined = left.join(right, "k")
      // materialize THIS plan (count() would execute a separate agg plan
      // whose adaptive state doesn't reflect back into `joined`)
      val rows = joined.collect()
      assert(rows.length == 200000 + 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew split in plan:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
