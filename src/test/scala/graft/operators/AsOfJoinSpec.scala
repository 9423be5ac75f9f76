package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** As-of join semantics: latest right row at-or-before left time, carried as
  * ONE row — fields must never be spliced across different right rows, even
  * when the matched right row contains nulls (the null-splicing regression:
  * per-column last(ignoreNulls) would skip a newer row's null and carry an
  * older row's value, producing a row that never existed).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("latest right row at-or-before left time; null for no prior row") {
    val left = Seq((1, 10L, "a"), (1, 25L, "b"), (2, 5L, "c"))
      .toDF("k", "t", "lv")
    val right = Seq((1, 8L, "r8"), (1, 20L, "r20"), (2, 6L, "r6"))
      .toDF("k", "t", "rv")
      .withColumnRenamed("t", "rt")
    val out = AsOfJoin(left, right.select($"k", $"rt", $"rv"),
      keyCols = Seq("k"), leftTime = "t", rightTime = "rt", rightCols = Seq("rv"))
      .select("k", "t", "lv", "rv").orderBy("k", "t").collect().toList
    assert(out == List(
      Row(1, 10L, "a", "r8"),
      Row(1, 25L, "b", "r20"),
      Row(2, 5L, "c", null))) // right row at t=6 is after left t=5
  }

  test("matched right row with null fields is carried whole, not spliced with older rows") {
    // Right rows for key 1: (t=10, x="old", y="oldy"), (t=20, x=null, y="newy").
    // A left row at t=30 matches the t=20 row; its x must be null — carrying
    // per-column last(ignoreNulls) would resurrect x="old" from t=10.
    val left = Seq((1, 30L)).toDF("k", "t")
    val right = Seq(
      (1, 10L, Option("old"), Option("oldy")),
      (1, 20L, Option.empty[String], Option("newy")))
      .toDF("k", "rt", "x", "y")
    val out = AsOfJoin(left, right,
      keyCols = Seq("k"), leftTime = "t", rightTime = "rt", rightCols = Seq("x", "y"))
      .select("k", "t", "x", "y").collect().toList
    assert(out == List(Row(1, 30L, null, "newy")))
  }

  test("null right time / null keys never match (ASOF null semantics)") {
    // a right row with NULL time would sort NULLS FIRST ("before all time")
    // and its payload would be carried onto unmatched left rows; null keys
    // would meet in the same window partition though NULL = NULL never
    // matches in an equality join
    val left = Seq((Some(1), 10L, "a"), (None: Option[Int], 10L, "nk"))
      .toDF("k", "t", "lv")
    val right = Seq((Some(1), Some(99L), "late"), (Some(1), None: Option[Long], "nullts"),
      (None: Option[Int], Some(1L), "nullkey"))
      .toDF("k", "rt", "rv")
    val out = AsOfJoin(left, right, keyCols = Seq("k"), leftTime = "t", rightTime = "rt",
      rightCols = Seq("rv"))
      .select("lv", "rv").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // key-1 left row: only right rows are at t=99 (after) and null-ts → no match;
    // null-key left row: the null-key right row must NOT attach
    assert(out == Set(("a", null), ("nk", null)), s"got $out")
  }

  test("equal timestamps are inclusive (right row at left time matches)") {
    val left = Seq((1, 10L)).toDF("k", "t")
    val right = Seq((1, 10L, "exact")).toDF("k", "rt", "rv")
    val out = AsOfJoin(left, right,
      keyCols = Seq("k"), leftTime = "t", rightTime = "rt", rightCols = Seq("rv"))
      .select("rv").collect().toList
    assert(out == List(Row("exact")))
  }
}
