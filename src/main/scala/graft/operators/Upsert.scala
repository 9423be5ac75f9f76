package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC upsert: apply a batch of changes onto a base table with
  * last-write-wins per primary key — the warehouse-side materialization of
  * the reference's incremental sync (PrimaryKey = upsert key,
  * IterateByKey = the version/cursor column; schema.go:5-12, SURVEY §1).
  *
  * Both inputs union and one window picks the latest version per key, so a
  * change batch may itself contain several versions of one key (a day of
  * CDC) and the result is still single-pass: ONE shuffle on the key, no
  * iterative merge. At 100 TB the base side would be bucketed on the key so
  * the union's shuffle degenerates to the change batch only.
  */
object Upsert {

  /** Latest row per key by `version` (ties: all columns of the later-sorted
    * row win deterministically via the extra ordering columns).
    */
  def latestByKey(df: DataFrame, keys: Seq[String], version: Column,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((version.desc +: tieBreak.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply `changes` over `base`: rows in `changes` replace same-key rows in
    * `base` when their version is newer; new keys insert; base rows with no
    * change survive. Schemas must align (unionByName).
    */
  def apply(base: DataFrame, changes: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame =
    latestByKey(
      base.withColumn("__src", lit(0)).unionByName(changes.withColumn("__src", lit(1))),
      keys, col(versionCol), tieBreak = Seq(col("__src")))
      .drop("__src")
}
