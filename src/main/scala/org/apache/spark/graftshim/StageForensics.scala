package org.apache.spark.graftshim

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-level time/byte forensics for targeted drill-downs (`BenchOne`):
  * where [[TaskInputBytes]] answers "how much did this query read", this
  * answers "what was the wall time SPENT ON" — executor run vs CPU time
  * (their gap is IO wait / scheduling / lock, the thing a fixed-work CPU
  * probe cannot see), shuffle write time (the direct disk-write-wait
  * meter), fetch wait, spill bytes, GC. Built for the recurring
  * "CPU probes clean, shuffle-heavy gate slow" adjudications (r15-r17
  * MinHash at the 1000× tier): a gate whose wall time moves while cpu_ms
  * holds and shuffle_write_ms balloons is disk weather, measured instead
  * of inferred from cross-gate ratio comparisons.
  *
  * Accumulates on task end (same delivery the History Server aggregates
  * from); lives under `org.apache.spark` because exact deltas need the
  * `private[spark]` listener-bus drain — same seam as [[TaskInputBytes]].
  */
class StageForensics extends SparkListener {
  private val sums = new ConcurrentHashMap[String, LongAdder]()
  private def add(k: String, v: Long): Unit =
    sums.computeIfAbsent(k, _ => new LongAdder).add(v)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      add("run_ms", m.executorRunTime)
      add("cpu_ms", m.executorCpuTime / 1000000L)
      add("gc_ms", m.jvmGCTime)
      add("shuffle_write_ms", m.shuffleWriteMetrics.writeTime / 1000000L)
      add("shuffle_bytes_written", m.shuffleWriteMetrics.bytesWritten)
      add("shuffle_bytes_read",
        m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead)
      add("fetch_wait_ms", m.shuffleReadMetrics.fetchWaitTime)
      add("mem_spill_bytes", m.memoryBytesSpilled)
      add("disk_spill_bytes", m.diskBytesSpilled)
      add("input_bytes", m.inputMetrics.bytesRead)
    }
  }

  /** Counter totals, exact as of call time (drains the async bus). */
  def snapshot(sc: SparkContext): Map[String, Long] = {
    sc.listenerBus.waitUntilEmpty()
    val it = sums.entrySet().iterator()
    var out = Map.empty[String, Long]
    while (it.hasNext) { val e = it.next(); out += e.getKey -> e.getValue.sum() }
    out
  }
}

object StageForensics {
  /** The metric keys [[snapshot]] may carry, in report order. */
  val Keys: Seq[String] = Seq("run_ms", "cpu_ms", "gc_ms", "shuffle_write_ms",
    "shuffle_bytes_written", "shuffle_bytes_read", "fetch_wait_ms",
    "mem_spill_bytes", "disk_spill_bytes", "input_bytes")

  def install(sc: SparkContext): StageForensics = {
    val l = new StageForensics
    sc.addSparkListener(l)
    l
  }
}
