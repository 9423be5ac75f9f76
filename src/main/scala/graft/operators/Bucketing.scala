package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins — the 100 TB refinement the join/upsert
  * scaladocs point at: pre-shuffle both fact tables ONCE at write time
  * (`bucketBy` on the join key, sorted within buckets), and every
  * subsequent equi-join or aggregation on that key runs with ZERO
  * exchanges — Spark matches bucket specs and plans a SortMergeJoin
  * straight over the scans. For a table joined N times per day, this
  * trades one write-time shuffle for N read-time shuffles; on a 100 TB
  * fact table the shuffle is the dominant cost, so this is the single
  * biggest lever the storage layout offers.
  *
  * Uses the catalog writer (`saveAsTable`) because bucket metadata lives in
  * the table catalog — a plain parquet path write cannot carry it.
  * Bucket count guidance: total size / bucket ≈ 128-512 MB; both sides of
  * a co-located join must share the bucket count (or be integer multiples
  * with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket keys. The plan this
    * produces is the point: no Exchange on either side (asserted in
    * BucketingSpec by walking the physical plan).
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
