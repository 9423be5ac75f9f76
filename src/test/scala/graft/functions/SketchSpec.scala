package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable-sketch aggregates — the at-scale path for distinct counts and
  * quantiles (exact countDistinct shuffles every key; an HLL sketch ships a
  * fixed-size buffer per partition and merges associatively, which is what
  * makes per-shard → global rollups cheap at 100 TB).
  *
  * Sketch estimates are engine-specific (no DuckDB oracle) so the gate
  * queries use exact formulations; these specs pin the properties the scale
  * path relies on: merge-consistency and bounded error.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("HLL: estimate(union of per-group sketches) == estimate(global sketch)") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    // partial per-priority sketches, merged — the map-side/reduce-side split
    val merged = orders
      .groupBy(col("o_orderpriority"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val global = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .head().getLong(0)
    assert(merged == global, "sketch merge must be associative")
  }

  test("HLL estimate within 5% of exact distinct count") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val est = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey")))).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est $est vs exact $exact")
  }

  test("approx quantiles bracket the exact median") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val approx = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.01).head
    val exact = li.select(percentile(col("l_extendedprice"), lit(0.5))).head().getDouble(0)
    // 1% relative-rank error on a ~6k-row table stays within a tight band
    assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
  }
}
