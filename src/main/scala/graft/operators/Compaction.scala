package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Small-files compaction — the hygiene pass every long-running 100 TB lake
  * needs: thousands of tiny files (streaming epochs, per-task outputs) are
  * re-materialized as files of a target size, optionally sorted within
  * files so downstream range scans benefit from parquet min/max pruning.
  *
  * Sizing: target rows per file are derived from the input's own observed
  * bytes-per-row (sampled from the files' footers via the relation size /
  * count), not guessed — `maxRecordsPerFile` then bounds every writer, and
  * `repartition(n)` keeps the task count proportional so no single writer
  * streams gigabytes.
  */
object Compaction {

  /** Estimate bytes per row given the already-computed row count. Uses the
    * relation's stats (parquet footer sizes) when they are trustworthy —
    * i.e. a scan-shaped plan; a Filter without CBO inherits its child's
    * sizeInBytes (bpr inflated by 1/selectivity) and RDD/local-backed plans
    * report defaultSizeInBytes (effectively infinite) — and falls back to
    * the schema's declared per-row size otherwise.
    */
  def estimateBytesPerRow(df: DataFrame, rows: Long): Double = {
    val schemaSize = math.max(1, df.schema.defaultSize).toDouble
    if (rows == 0) return schemaSize
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val bpr = (BigDecimal(bytes) / rows).toDouble
    // trust stats only within a plausible band around the schema estimate
    if (bpr >= 1.0 && bpr <= schemaSize * 64) bpr else schemaSize
  }

  /** Compact `df` to `outPath` targeting `targetFileBytes` per file.
    *
    * @param sortCols optional within-file sort: clusters values so parquet
    *                 row-group min/max statistics actually prune
    */
  def compact(df: DataFrame, outPath: String,
      targetFileBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): Unit = {
    val totalRows = df.count() // ONE job; sizing derives from this count
    val bpr = estimateBytesPerRow(df, totalRows)
    val rowsPerFile = math.max(1L, (targetFileBytes / bpr).toLong)
    val nFiles = math.max(1L, math.min(
      (totalRows + rowsPerFile - 1) / rowsPerFile, Int.MaxValue.toLong - 1)).toInt
    val repartitioned =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nFiles)
    repartitioned.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", rowsPerFile)
      .parquet(outPath)
  }

  /** Bit-interleaved Z-order value of two non-negative integer columns:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Rows close in
    * z are close in BOTH dimensions, so a z-clustered layout gives every
    * file/row group a narrow min/max range on every participating column —
    * single-column sort can only do that for the leading column. A static
    * shift/mask expression tree (the pHash convention): whole-stage
    * codegen'd by Spark and bit-for-bit re-derivable in plain SQL.
    */
  def zorder(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val lim = 1L << bits
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    // inputs beyond `bits` would silently ALIAS (high bits discarded):
    // distant rows share a z value, files keep wide min/max ranges, and the
    // pruning promise silently fails — fail loudly instead
    when(xl < 0 || xl >= lim || yl < 0 || yl >= lim,
      raise_error(concat(lit(s"zorder: inputs must be in [0, $lim): ("),
        xl.cast("string"), lit(", "), yl.cast("string"), lit(")"))).cast("long"))
      .otherwise(z)
  }

  /** Z-order clustered layout: range-partition on the interleaved key (file
    * boundaries become ~square tiles of the (x, y) space) and sort within
    * files, so a selective predicate on EITHER column prunes most files via
    * parquet min/max statistics — the multi-dimensional upgrade of
    * [[compact]]'s single-column sort. Asserted by ZOrderSpec: a narrow
    * y-slice reads a fraction of the rows from the z layout that it reads
    * from an x-sorted layout.
    */
  def zorderWrite(df: DataFrame, outPath: String, xCol: String, yCol: String,
      nFiles: Int, bits: Int = 16): Unit = {
    df.withColumn("__z", zorder(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(outPath)
  }
}
