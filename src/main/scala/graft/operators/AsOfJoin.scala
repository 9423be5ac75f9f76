package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (point-in-time) join.
  *
  * Spark has no built-in as-of join; the naive formulation (inequality join +
  * per-key max) degenerates to a broadcast-nested-loop or a massive
  * range-join blowup. This implementation uses the union + ordered-window
  * trick instead:
  *
  *   1. tag right rows 0 and left rows 1, union them on (key, time) —
  *      ONE shuffle, no pairwise expansion;
  *   2. sort within each key partition by (time, tag) so the right row at
  *      equal time sorts before the left row (inclusive `right.time <=
  *      left.time` semantics);
  *   3. `last(rightCol, ignoreNulls)` over rows unboundedPreceding..current
  *      carries the most recent right-side values forward;
  *   4. keep only left rows.
  *
  * Cost: a single hash-partition on `key` + one sort — the same cost profile
  * as a sort-merge join, independent of time-proximity fan-out, so it holds
  * at 100 TB. Skewed keys are handled by AQE; there is no crossproduct to
  * skew.
  *
  * Semantics match DuckDB's `ASOF LEFT JOIN ... ON l.key = r.key AND
  * l.time >= r.time` (latest right row at-or-before the left time; nulls for
  * left rows with no prior right row).
  */
object AsOfJoin {

  /** @param left       probe side; every row is preserved (left-outer)
    * @param right      reference side
    * @param keyCols    equality key column names (present in both sides)
    * @param leftTime   event-time column name in `left`
    * @param rightTime  event-time column name in `right`
    * @param rightCols  columns of `right` to carry onto matching left rows
    *                   (emitted as-is; may be renamed by the caller first)
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightCols.exists(leftCols.contains),
      s"rightCols ${rightCols.filter(leftCols.contains)} collide with left columns; rename first")

    val ts = "__asof_ts"
    val tag = "__asof_tag"
    val payload = "__asof_payload"

    // The right row's carried columns travel as ONE struct, not as independent
    // last() streams: the struct is non-null for every right row (even when
    // its fields are null), so a newer right row with a null field correctly
    // shadows an older row's value — per-column carry would splice fields
    // from different right rows into one that never existed.
    val payloadType = org.apache.spark.sql.types.StructType(rightCols.map(c => right.schema(c)))

    val l = left
      .withColumn(ts, col(leftTime))
      .withColumn(tag, lit(1))
      .select((keyCols.map(col) :+ col(ts) :+ col(tag)) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(payloadType).as(payload): _*)

    // ASOF semantics: a right row with a NULL event time (or NULL key) can
    // never match anything — but under the union+window encoding a NULL ts
    // sorts NULLS FIRST, i.e. "before all time", and its payload would be
    // carried onto every left row with no earlier real match; NULL keys
    // would likewise meet in the same window partition though an equality
    // join never matches NULL = NULL. Drop such right rows up front.
    val rightUsable = keyCols.foldLeft(right.filter(col(rightTime).isNotNull)) {
      (df, k) => df.filter(col(k).isNotNull)
    }
    val r = rightUsable
      .withColumn(ts, col(rightTime))
      .withColumn(tag, lit(0))
      .select((keyCols.map(col) :+ col(ts) :+ col(tag)) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as(payload): _*)

    // Secondary sort on the payload struct makes the carried value
    // deterministic when the right side has duplicate (key, time) rows (the
    // max tuple wins — struct ordering is lexicographic over its fields).
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(ts).asc, col(tag).asc, col(payload).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .select(
        (keyCols.map(col) ++ leftCols.filterNot(keyCols.contains).map(col) :+ col(tag)) :+
          last(col(payload), ignoreNulls = true).over(w).as(payload): _*)

    carried.filter(col(tag) === lit(1))
      .select((keyCols.map(col) ++ leftCols.filterNot(keyCols.contains).map(col)) ++
        rightCols.map(c => col(s"$payload.$c").as(c)): _*)
  }
}
