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

  /** Broadcast-split CDC merge for a LARGE base — the 100 TB refinement the
    * window formulation's scaladoc points at. [[apply]]'s window over a
    * union re-shuffles the whole base every merge; here the base side is
    * split by broadcasting the (small) change-key set:
    *
    *   survivors = base ANTI-JOIN changed-keys   (broadcast: no base shuffle)
    *   contested = base SEMI-JOIN changed-keys   (broadcast: no base shuffle)
    *   result    = survivors ∪ latest(contested ∪ changes)
    *
    * The base is scanned twice but never shuffled (zero base-side
    * exchanges, asserted in UpsertSpec) — at scale a scan is bandwidth, a
    * shuffle is bandwidth + disk + skew risk. Only change-batch-sized data
    * enters the window. Pairs naturally with a bucketed base table: the
    * survivors retain the storage layout for an exchange-free bucketed
    * rewrite.
    *
    * Precondition (the invariant of an upsert-MAINTAINED table, which
    * [[apply]] itself establishes on its output): base keys are non-null
    * and unique. Under it the result equals [[apply]] exactly; outside it
    * they diverge — the join-based key split can neither match null keys
    * (SQL join semantics) nor collapse duplicate base rows the window
    * formulation would dedup.
    */
  def mergeLargeBase(base: DataFrame, changes: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    val changeKeys = changes.select(keys.map(col): _*).distinct()
    val survivors = base.join(broadcast(changeKeys), keys, "left_anti")
    val contested = base.join(broadcast(changeKeys), keys, "left_semi")
    survivors.unionByName(apply(contested, changes, keys, versionCol))
  }
}
