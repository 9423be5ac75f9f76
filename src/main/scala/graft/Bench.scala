package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** The benched action: a noop-format write. `count()` plans
    * Aggregate(count(1)) and ColumnPruning then deletes every projected
    * expression the count doesn't need — for map-only queries (text_*,
    * mm_*, scrub, quantize) that optimized away the very work being
    * measured, leaving scan+count. The noop sink consumes every output
    * row in full (all columns evaluated, nothing written), so the timed
    * region covers the actual query work.
    */
  def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Free the localCheckpoint storage pinned inside a CONSUMED frame's plan
    * (the eager dedup operators and the recall gate's shared brute table
    * checkpoint at build time). catalog.clearCache() cannot touch
    * checkpoint storage and the ContextCleaner only reclaims it at the
    * next driver GC (periodic default: 30 min) — long after later timed
    * reps have run — so the bench frees it deterministically. Safe only
    * because the frame is never read again (checkpoint lineage is
    * truncated; the data is not recomputable).
    */
  def releaseCheckpoints(df: DataFrame): Unit =
    df.queryExecution.logical.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // "noop" (default) is the honest action; "count" reproduces the
    // round-1..5 methodology (ColumnPruning deletes map-only projections)
    // SOLELY for cross-round comparison — never commit a count-action run
    // as a round artifact.
    val actionName = sys.env.getOrElse("SPARK_GRAFT_BENCH_ACTION", "noop")
    val action: DataFrame => Unit =
      if (actionName == "count") df => { df.count(); () } else materialize
    // Timed reps per query (min reported). 2 is the round-3+ default; 3
    // tightens the min for the many sub-second queries whose 20-40% run
    // variance otherwise dominates cross-tier comparisons. The value is
    // recorded in the JSON's "reps" methodology marker either way.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption)
      .filter(_ >= 1).getOrElse(2)
    val spark = LocalSession.build()
    // Untimed warmup: run every query once at the target dir. First
    // execution pays Janino whole-stage-codegen compilation + classloading
    // (profiled at ~8s absorbed by whichever query ran first) and cold page
    // cache — costs a long-lived cluster amortizes to zero; the timed pass
    // below measures steady-state execution, which is what scales.
    SparkEntry.queries.foreach { case (_, fn) =>
      try {
        val df = fn(spark, sfDir)
        action(df)
        releaseCheckpoints(df)
      } catch { case _: Throwable => () }
    }
    // Drop DataFrames persisted inside query builders (each call persists a
    // fresh copy; the warmup's copies would sit in storage memory under the
    // timed pass and show up as GC noise).
    spark.catalog.clearCache()
    // Stable alphabetical order so per-query timings are comparable across
    // rounds (a HashMap's iteration order shifts when queries are added).
    // Each query is timed twice and the MIN reported: profiling (r2→r3
    // text_* investigation) showed single timed runs carry 2-3× spikes from
    // residual JIT/GC/page-cache noise, while back-to-back runs agree within
    // ~10% — the min is the steady-state cost, which is what a long-lived
    // cluster pays.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min over SUCCESSFUL reps only — a fast-failing rep must not shadow
      // a real slow success with a near-zero time; all-failed → -1 marker.
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val built =
          try { val df = fn(spark, sfDir); action(df); Some(df) }
          catch { case _: Throwable => None }
        val t = (System.nanoTime() - t0) / 1e9
        // Outside the timed region: dead caches/checkpoints from this rep
        // would otherwise sit in storage memory under later timings.
        built.foreach(releaseCheckpoints)
        spark.catalog.clearCache()
        if (built.isDefined) Some(t) else None
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    // 3-decimal (ms) precision: sub-ms digits are pure noise at these
    // scales, and the shorter line keeps the whole JSON inside the driver's
    // bounded stdout-tail capture (full-precision lines were truncated in
    // rounds 1-3 → "parsed": null).
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // total over SUCCESSFUL queries only: summing the -1 failure sentinels
    // would report a phantom speedup of ~1s per failed query
    val total = results.map(_._2).filter(_ >= 0).sum
    // reps/agg: methodology marker — rounds 1-2 reported a single timed run,
    // round 3+ the min of 2; cross-round comparisons can detect the change.
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,"agg":"min","action":"$actionName","queries":$qs,"sf":"$sfDir"}"""
    // Truncation-proofing: the driver captures stdout's tail, which has
    // clipped the head of this (long) line in past rounds. Persist the full
    // JSON to a file first, then print it — the artifact on disk is always
    // complete regardless of how the console capture slices the stream.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_last.json"), json + "\n")
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
