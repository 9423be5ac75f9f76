package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime semi-join reduction — the two techniques that keep fact-fact
  * joins affordable at 100 TB, demonstrated on real plans with negative
  * controls:
  *
  *  - runtime BLOOM FILTER injection: a selective filter on one join side
  *    becomes a bloom-filtered scan of the other side, so most of the big
  *    side dies at the scan instead of travelling through the shuffle;
  *  - DYNAMIC PARTITION PRUNING: a dimension filter prunes the fact side's
  *    partition directories at runtime via a reused subquery — entire
  *    partitions are never read.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def withConf(pairs: (String, String)*)(body: => String): String = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter: selective orders filter reduces the lineitem scan") {
    def plan(enabled: Boolean): String = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> enabled.toString,
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // production default (10GB) says "don't bother under 10GB" — this IS
      // the knob that gates the technique to big scans; zero it so the
      // sf0.001 fact qualifies and the injection machinery is exercised
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false",
      // broadcast would bypass shuffle-side filtering — force the SMJ shape
      // the technique exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_totalprice") > 400000.0) // selective creation side
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
        .queryExecution.executedPlan.toString
    }
    val on = plan(enabled = true)
    assert(on.toLowerCase.contains("bloomfilter"),
      s"expected an injected bloom filter on the lineitem scan:\n$on")
    val off = plan(enabled = false)
    assert(!off.toLowerCase.contains("bloomfilter"),
      "negative control: filter injected with the feature disabled")
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val tmp = java.nio.file.Files.createTempDirectory("dpp").toString
    // a partitioned fact layout (what a 100 TB table looks like on disk)
    spark.read.parquet(s"$dir/orders.parquet")
      .write.partitionBy("o_orderpriority").mode("overwrite").parquet(s"$tmp/orders")
    // the dim filter is on a DIFFERENT column than the join key: a literal
    // filter on the key itself would constant-propagate through the join
    // into a STATIC partition filter (no runtime pruning needed — verified:
    // that plan shows the literal directly in PartitionFilters)
    val prio = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority").as("p"), col("o_orderstatus").as("st")).distinct()
      .filter(col("st") === "F")
    def plan(enabled: Boolean): String = withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> enabled.toString,
      // at sf0.001 the stats-based benefit estimate rejects pruning a
      // kilobyte-scale scan; disable it so the decision uses the fallback
      // ratio, as a real partitioned fact table would pass on size alone
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false") {
      spark.read.parquet(s"$tmp/orders")
        .join(prio, col("o_orderpriority") === col("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
    }
    val on = plan(enabled = true)
    assert(on.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in the partitioned scan:\n$on")
    val off = plan(enabled = false)
    assert(!off.contains("dynamicpruning"),
      "negative control: pruning subquery present with the feature disabled")
  }
}
