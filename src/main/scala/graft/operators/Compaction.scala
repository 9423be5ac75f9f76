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

  /** Estimate bytes per row from the relation's stats (parquet footer
    * sizes / row count) — cheap: one count over footers-backed metadata.
    */
  def estimateBytesPerRow(df: DataFrame): Double = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes.toDouble
    val rows = df.count().toDouble
    if (rows == 0) 1.0 else math.max(1.0, bytes / rows)
  }

  /** Compact `df` to `outPath` targeting `targetFileBytes` per file.
    *
    * @param sortCols optional within-file sort: clusters values so parquet
    *                 row-group min/max statistics actually prune
    */
  def compact(df: DataFrame, outPath: String,
      targetFileBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): Unit = {
    val bpr = estimateBytesPerRow(df)
    val rowsPerFile = math.max(1L, (targetFileBytes / bpr).toLong)
    val totalRows = df.count()
    val nFiles = math.max(1, math.ceil(totalRows.toDouble / rowsPerFile).toInt)
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
