package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** CDC upsert semantics: last write per key wins across base ∪ changes, a
  * change batch may carry several versions of one key, new keys insert,
  * untouched base rows survive, and an out-of-date change never regresses a
  * newer base row.
  */
class UpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    .toDF("k", "v", "ver")

  test("changes replace, insert, and leave untouched keys alone") {
    val changes = Seq(
      (1L, "a2", 15L), // newer → replaces
      (4L, "d", 5L))   // new key → inserts
      .toDF("k", "v", "ver")
    val out = Upsert(base, changes, Seq("k"), "ver")
      .orderBy("k").collect().toList
    assert(out == List(
      Row(1L, "a2", 15L), Row(2L, "b", 20L), Row(3L, "c", 30L), Row(4L, "d", 5L)))
  }

  test("multi-version change batch: only the latest version of a key lands") {
    val changes = Seq((1L, "v1", 11L), (1L, "v2", 12L), (1L, "v3", 13L))
      .toDF("k", "v", "ver")
    val out = Upsert(base, changes, Seq("k"), "ver")
      .filter(col("k") === 1L).collect().toList
    assert(out == List(Row(1L, "v3", 13L)))
  }

  test("stale change (older version than base) does not regress the row") {
    val changes = Seq((2L, "stale", 19L)).toDF("k", "v", "ver")
    val out = Upsert(base, changes, Seq("k"), "ver")
      .filter(col("k") === 2L).collect().toList
    assert(out == List(Row(2L, "b", 20L)))
  }

  test("equal version: the change wins (deterministic source tie-break)") {
    val changes = Seq((3L, "c2", 30L)).toDF("k", "v", "ver")
    val out = Upsert(base, changes, Seq("k"), "ver")
      .filter(col("k") === 3L).collect().toList
    assert(out == List(Row(3L, "c2", 30L)))
  }
}
