package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
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
}
