package graft

import org.apache.spark.sql.SparkSession

/** One session factory for the harness mains (Bench, Profile) so their
  * timings are measured under identical configuration — a config added for
  * benchmarking that didn't reach Profile would make profile numbers
  * non-comparable.
  */
object LocalSession {
  def build(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE initial-partition override, env-tunable for controlled A/Bs.
      // Default = cores (a no-op vs shuffle.partitions): the canonical
      // "start high, let AQE coalesce" advice was A/B-measured on the
      // 1000×-tier MinHash (the repo's biggest single exchange, 5.24 GB)
      // and LOST on deterministic metrics — 8×cores initial partitions
      // INCREASED shuffle bytes 4.5% and total spill 72% (the dominant
      // spills are ObjectHashAggregate sort-fallbacks whose volume more
      // partitions don't shrink, while extra partition boundaries add
      // write-path overhead). Map-side task sizing is Dedup.spread's job;
      // re-evaluate this default only with a fresh A/B artifact.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The status-store listeners run even with the UI disabled and retain
      // per-execution plan graphs/metrics; the defaults (1000 executions,
      // 1000 jobs/stages) let a multi-attempt bench pass — thousands of
      // small executions per attempt — grow the store until the heap is
      // mostly listener state. That both OOMs the run (r15: the 100x tier
      // died at attempt 3 with Xmx8g) and thrashes GC enough to dirty the
      // in-JVM calibration probes, which then FORCES the extra attempts:
      // a self-inflicted contention loop. Tight bounds keep the store a
      // rounding error at any attempt count.
      .config("spark.sql.ui.retainedExecutions", "50")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      // ContextCleaner reclaims unreferenced broadcasts/checkpoint RDDs only
      // at a driver GC; the default periodic-GC interval (30 min) is longer
      // than a whole bench pass, so off-heap/store blocks from dropped
      // frames pile up across attempts. 2 min bounds the pile without
      // measurable cost for the seconds-long timed reps — but a 1000×-tier
      // query RUNS ~2 min, so the periodic stop-the-world GC lands inside
      // it; env-tunable so the sf100 adjudication (VERDICT r15 #1: the
      // dedup_minhash_lsh 73.6→120 s same-bytes regression, suspect = this
      // setting) can A/B the interval without a code change.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "2min"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
