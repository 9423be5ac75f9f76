package org.apache.spark.graftshim

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-level input-byte accounting for the bench harness (r11 VERDICT #2 /
  * next-round #7): tier artifacts must carry per-query BYTES SCANNED so the
  * growth gate can adjudicate a query's time growth against the data shape
  * it actually read (machine-checkable), instead of narrating "the
  * synthesized tier carries disproportionate binary bytes".
  *
  * Counts `TaskMetrics.inputMetrics.bytesRead` over ALL tasks — including
  * the eager sub-jobs (k-means iterations, trainer rounds, bounded
  * collects) a query runs before its public plan, which plan-level file
  * sizes would miss. Lives under `org.apache.spark` because draining the
  * listener bus (`listenerBus.waitUntilEmpty()` — required for an exact
  * per-query delta: task-end events are delivered asynchronously) is
  * `private[spark]`; same extension seam as `sql.graftshim.Bridge`.
  */
class TaskInputBytes extends SparkListener {
  private val acc = new AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val tm = e.taskMetrics
    if (tm != null) acc.addAndGet(tm.inputMetrics.bytesRead)
  }

  /** Total bytes read so far, exact as of call time (drains the async
    * listener bus first so no in-flight task-end is missed).
    */
  def snapshot(sc: SparkContext): Long = {
    sc.listenerBus.waitUntilEmpty()
    acc.get()
  }
}

object TaskInputBytes {
  def install(sc: SparkContext): TaskInputBytes = {
    val l = new TaskInputBytes
    sc.addSparkListener(l)
    l
  }
}
