package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout capability: writing a table partitioned by a column and
  * proving a filtered read scans ONLY the matching partition directories —
  * at 100 TB the partition column is the first and cheapest pruning lever
  * (no file even opens for excluded partitions).
  */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark

  test("hive-partitioned write prunes non-matching partitions at scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts is TIMESTAMP(NANOS)
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val types = events.select("event_type").distinct().count()
    assert(types > 1, "fixture must have multiple event types")

    val filtered = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    // plan-level proof: the scan's partitionFilters carry the predicate and
    // the selected partition count is exactly 1
    val scan = filtered.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.nonEmpty, "partition filter must reach the scan")
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size == 1,
      "exactly one partition directory must survive pruning")

    // value-level proof: counts agree with the unpartitioned source
    val expected = events.filter(col("event_type") === "purchase").count()
    assert(filtered.count() == expected)
  }
}
