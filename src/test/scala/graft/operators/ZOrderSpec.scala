package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: correctness of the interleaved key, and the EFFECT —
  * a selective predicate on the second dimension prunes most files (via
  * parquet min/max statistics) from the z-clustered layout while reading
  * everything from a single-column-sorted layout. The effect is measured
  * from the scan's own numOutputRows metric, i.e. rows that survived
  * row-group/file pruning, not the post-filter result (identical in both).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  test("zorder interleaves bits (matches reference implementation)") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1L), (777L, 1023L))
    val out = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Compaction.zorder(col("x"), col("y"), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) => assert(z == ref(x, y, 10), s"($x,$y)") }
    // z-adjacency: the four cells of a 2x2 block are z-contiguous
    assert(ref(0, 0, 10) == 0 && ref(1, 0, 10) == 1 && ref(0, 1, 10) == 2 && ref(1, 1, 10) == 3)
  }

  test("zorder rejects out-of-range inputs instead of silently aliasing high bits") {
    val bad = Seq((70000L, 1L)).toDF("x", "y")
      .select(Compaction.zorder(col("x"), col("y"), 16))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage != null && e.toString.toLowerCase.contains("zorder"),
      s"expected the zorder range error, got $e")
  }

  test("narrow y-slice prunes most of the z layout, none of the x-sorted layout") {
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val n = 256
    val grid = spark.range(0, n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    // layout A: single-column clustering by x (the default best effort)
    grid.repartitionByRange(64, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$tmp/by_x")
    // layout B: z-order clustering
    Compaction.zorderWrite(grid, s"$tmp/by_z", "x", "y", nFiles = 64, bits = 8)

    def scannedRows(path: String): (Long, Long) = {
      val df = spark.read.parquet(path).filter(col("y").between(8, 15))
      // metrics must come from THIS QueryExecution — count() would plan and
      // run a separate one, leaving these metrics at zero
      val result = df.collect().length.toLong
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = plan.collectLeaves().collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, s"no file scan in plan for $path")
      (result, scans.map(_.metrics("numOutputRows").value).sum)
    }
    val (resA, readA) = scannedRows(s"$tmp/by_x")
    val (resB, readB) = scannedRows(s"$tmp/by_z")
    assert(resA == resB && resA == 8L * n) // same answer from both layouts
    // x-sorted layout: y stats span everything in every file → no pruning
    assert(readA == n.toLong * n, s"expected full read from x layout, got $readA")
    // z layout: ~square tiles → the 8-row slice touches a small stripe
    assert(readB <= readA / 3, s"z layout read $readB of $readA — no pruning?")
  }
}
