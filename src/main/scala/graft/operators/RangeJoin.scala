package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join.
  *
  * A naive `points JOIN intervals ON p BETWEEN lo AND hi` has no equality
  * key, so Spark plans a broadcast-nested-loop — O(|points|·|intervals|)
  * comparisons. The standard fix: overlay a fixed-width bucket grid; an
  * interval registers in every bucket it overlaps, a point lands in exactly
  * one bucket, and the join becomes an EQUI-join on bucket id (hash
  * partitionable, AQE-friendly) followed by the exact `between` filter on
  * the collisions only.
  *
  * Cost: |intervals| expands by avg interval width / bucketWidth; the fact
  * side never replicates. Pick bucketWidth ≈ median interval width so the
  * expansion stays O(1)× — at 100 TB the fact side dominates and it
  * shuffles exactly once, same as any equi-join.
  */
object RangeJoin {

  /** @param points      fact side with a numeric point column
    * @param pointCol    point column name
    * @param intervals   dimension side with [lo, hi] columns (inclusive)
    * @param bucketWidth grid width (same unit as the point column)
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    // 0 or negative width → Infinity/NaN buckets → an error or a silently
    // empty join; NaN width likewise
    require(bucketWidth > 0 && !bucketWidth.isNaN,
      s"bucketWidth must be positive, got $bucketWidth")
    val b = lit(bucketWidth)
    val expanded = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / b), floor(col(hiCol) / b))))
    val bucketed = points.withColumn("__bucket", floor(col(pointCol) / b))
    bucketed.join(expanded, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
