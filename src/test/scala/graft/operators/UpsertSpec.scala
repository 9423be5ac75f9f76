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

  test("mergeLargeBase == window upsert; base side never shuffles") {
    val bigBase = (1L to 5000L).map(i => (i, s"v$i", 10L)).toDF("k", "v", "ver")
    val changes = Seq(
      (1L, "updated", 11L),   // newer: replaces
      (2L, "stale", 9L),      // older: base survives
      (1L, "mid", 10L),       // second version of same key in the batch
      (9999L, "insert", 1L))  // new key
      .toDF("k", "v", "ver")
    val merged = Upsert.mergeLargeBase(bigBase, changes, Seq("k"), "ver")
    val viaWindow = Upsert(bigBase, changes, Seq("k"), "ver")
    assert(merged.collect().toSet == viaWindow.collect().toSet)
    // All exchanges are CHANGE-batch-sized: 2 × the change-key distinct
    // (built once per broadcast side) + 1 window input. The base feeds only
    // the two BroadcastHashJoins — never shuffled (the window formulation
    // shuffles every base row). Unwrap AQE first: its toString prints
    // initial AND final plans, double-counting exchanges.
    merged.collect()
    val finalPlan = (merged.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    // ≤ 3: change-key distinct (AQE may reuse it across the two broadcast
    // sides) + window input. The window formulation would ALSO shuffle the
    // 5000-row base through the same key partitioning.
    assert(exchanges <= 3 && exchanges >= 1,
      s"expected only change-batch-sized exchanges, got $exchanges:\n$finalPlan")
    assert("BroadcastHashJoin".r.findAllIn(finalPlan).length == 2,
      s"expected the anti+semi broadcast key-split:\n$finalPlan")
  }

  test("mergeLargeBase over-bound fallback: window form, same answer (r14 VERDICT #5)") {
    val bigBase = (1L to 500L).map(i => (i, s"v$i", 10L)).toDF("k", "v", "ver")
    val changes = Seq(
      (1L, "updated", 11L), (2L, "stale", 9L), (7777L, "insert", 1L))
      .toDF("k", "v", "ver")
    // 3 distinct change keys > bound of 2 → must take the window fallback
    val merged = Upsert.mergeLargeBase(bigBase, changes, Seq("k"), "ver",
      maxBroadcastKeys = 2L)
    val viaWindow = Upsert(bigBase, changes, Seq("k"), "ver")
    assert(merged.collect().toSet == viaWindow.collect().toSet,
      "fallback must be answer-identical to the window formulation")
    val finalPlan = (merged.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // the plan actually SWITCHED: no broadcast key-split, and the window
    // runs over the union (base shuffles through the key partitioning)
    assert(!finalPlan.contains("BroadcastHashJoin"),
      s"fallback must not build the broadcast key-split:\n$finalPlan")
    assert(finalPlan.contains("Window"),
      s"fallback must be the window formulation:\n$finalPlan")
    // and just UNDER the bound the broadcast form is chosen (both sides of
    // the guard driven by the same tiny constant)
    val under = Upsert.mergeLargeBase(bigBase, changes, Seq("k"), "ver",
      maxBroadcastKeys = 3L)
    under.collect()
    val underPlan = (under.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert("BroadcastHashJoin".r.findAllIn(underPlan).length == 2,
      s"at-bound batch must keep the broadcast key-split:\n$underPlan")
  }

  test("keyCountHint: planning the merge runs ZERO Spark jobs (r15 VERDICT #5)") {
    val bigBase = (1L to 500L).map(i => (i, s"v$i", 10L)).toDF("k", "v", "ver")
    val changes = Seq(
      (1L, "updated", 11L), (2L, "stale", 9L), (7777L, "insert", 1L))
      .toDF("k", "v", "ver")
    // Count only THIS thread's jobs via a job group (sibling suites share
    // the session): any eager job inside mergeLargeBase would carry it.
    val group = s"upsert-hint-${System.nanoTime()}"
    val groupJobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (Option(js.properties)
            .exists(p => group == p.getProperty("spark.jobGroup.id"))) {
          groupJobs.incrementAndGet(); ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, "hint-path planning probe")
    try {
      val merged = Upsert.mergeLargeBase(bigBase, changes, Seq("k"), "ver",
        keyCountHint = Some(3L))
      // marker job: the listener bus is FIFO, so once it lands, any job the
      // merge call had submitted would already be counted. RDD action, not
      // a DataFrame one — AQE splits even range(1).count() into two jobs.
      spark.sparkContext.parallelize(Seq(1)).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (groupJobs.get() < 1 && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(groupJobs.get() == 1,
        s"building the hinted merge must run no job before the marker " +
          s"(saw ${groupJobs.get() - 1} extra)")
      // answers and plan are those of the broadcast key-split
      assert(merged.collect().toSet ==
        Upsert(bigBase, changes, Seq("k"), "ver").collect().toSet)
      val finalPlan = (merged.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert("BroadcastHashJoin".r.findAllIn(finalPlan).length == 2,
        s"hinted under-bound merge must keep the broadcast key-split:\n$finalPlan")
      // an over-bound hint routes to the window formulation, also jobless
      val over = Upsert.mergeLargeBase(bigBase, changes, Seq("k"), "ver",
        maxBroadcastKeys = 2L, keyCountHint = Some(3L))
      assert(over.collect().toSet ==
        Upsert(bigBase, changes, Seq("k"), "ver").collect().toSet)
      val overPlan = (over.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(!overPlan.contains("BroadcastHashJoin") && overPlan.contains("Window"),
        s"over-bound hint must take the window formulation:\n$overPlan")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("hint path: ONE broadcast materialization serves both joins (ADVICE r16)") {
    val bigBase = (1L to 300L).map(i => (i, s"v$i", 10L)).toDF("k", "v", "ver")
    val changes = Seq((1L, "u", 11L), (301L, "i", 1L)).toDF("k", "v", "ver")
    val merged = Upsert.mergeLargeBase(bigBase, changes, Seq("k"), "ver",
      keyCountHint = Some(2L))
    merged.collect()
    val finalPlan = merged.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // The jobless hint path relies on exchange reuse to evaluate the
    // change-key-set plan — the only place a nondeterministic source is
    // READ — exactly once for the anti and semi joins: the second join's
    // broadcast stage must be a ReusedExchange of the first's build, never
    // an independent second build (which would let a nondeterministic
    // source diverge between the joins — rows silently dropped/duplicated).
    assert("BroadcastHashJoin".r.findAllIn(finalPlan.toString).length == 2,
      s"hinted merge must keep the broadcast key-split:\n$finalPlan")
    // QueryStageExec nodes are leaves (their subtree hangs off .plan), so a
    // plain collect never reaches nested stages — flatten manually
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: kids.flatMap(flatten)
    }
    val all = flatten(finalPlan)
    val builds = all.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }
    val reused = all.collect {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }
    assert(builds.size == 1 && reused.size == 1,
      s"the key set must be BUILT once and REUSED by the second join " +
        s"(saw ${builds.size} builds, ${reused.size} reuses):\n$finalPlan")
  }

  test("hint path with exchange reuse disabled: checkpoint restores single materialization") {
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val changes = Seq((1L, "u", 99L), (77L, "i", 1L)).toDF("k", "v", "ver")
      val merged = Upsert.mergeLargeBase(base, changes, Seq("k"), "ver",
        keyCountHint = Some(2L))
      // the key set is snapshotted via localCheckpoint (a LogicalRDD leaf),
      // so both joins read one materialization even without reuse
      assert(merged.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
        "with reuse off the hint path must checkpoint the key set")
      assert(merged.collect().toSet ==
        Upsert(base, changes, Seq("k"), "ver").collect().toSet)
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("nested map types are excluded from the row-hash tiebreak (ADVICE r14)") {
    // a column whose type NESTS a map (array<map>, struct{map}) is just as
    // unhashable as a top-level map — latestByKey must exclude it rather
    // than throw AnalysisException at xxhash64
    val df = Seq(
      (1L, 5L, Seq(Map("a" -> 1)), (Map("x" -> 1L), "s"), "p1"),
      (1L, 5L, Seq(Map("a" -> 2)), (Map("x" -> 2L), "s"), "p1"),
      (2L, 1L, Seq(Map("b" -> 3)), (Map("y" -> 3L), "t"), "p2"))
      .toDF("k", "ver", "arr_of_map", "struct_with_map", "payload")
    val out = Upsert.latestByKey(df, Seq("k"), col("ver"))
    assert(out.count() == 2, "one survivor per key")
    // determinism is still provided by the hashable remainder (payload):
    // two rows differing only in nested-map columns tie harmlessly
    val k1 = out.filter(col("k") === 1L).select("payload").head().getString(0)
    assert(k1 == "p1")
  }
}
