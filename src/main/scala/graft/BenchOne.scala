package graft

import org.apache.spark.graftshim.StageForensics

/** Time ONE registered gate query against a data directory — the targeted
  * drill-down companion to [[Bench]]/[[BenchScale]]: when the growth gate
  * flags a query at a tier, this measures a candidate fix against the same
  * tier data without paying for the whole registry.
  *
  * Each rep also prints STAGE FORENSICS (see
  * [[org.apache.spark.graftshim.StageForensics]]) — executor run vs CPU
  * time, shuffle write time, fetch wait, spill, GC — summed over the rep's
  * tasks, with an [[Bench.ioProbe]] fsync bracket around the reps. This is
  * the instrument for "CPU probes clean, shuffle-heavy gate slow"
  * adjudications: a gate whose wall time moves across rounds while cpu_ms
  * holds and shuffle_write_ms balloons is disk weather, measured rather
  * than inferred from cross-gate ratio comparisons.
  *
  * Usage: `sbt "runMain graft.BenchOne <query> <dir> [reps]"`.
  * Prints one JSON line per rep plus a summary (min of reps, same
  * aggregation as the tier artifacts). Not a round artifact.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchOne <query> <dir> [reps]")
    val (name, dir) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 2
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name' — keys: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = LocalSession.build()
    val sc = spark.sparkContext
    val metrics = StageForensics.install(sc)
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"io_probe_before":${fmt(Bench.settledIoProbe())},"cpu_probe":${fmt(Bench.settledProbe())}}""")
    val times = (1 to reps).map { i =>
      val before = metrics.snapshot(sc)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      Bench.materialize(df)
      val t = (System.nanoTime() - t0) / 1e9
      Bench.releaseCheckpoints(df)
      spark.catalog.clearCache()
      val after = metrics.snapshot(sc)
      val stage = StageForensics.Keys
        .map(k => s""""$k":${after.getOrElse(k, 0L) - before.getOrElse(k, 0L)}""")
        .mkString("{", ",", "}")
      // fmt (Locale.ROOT), not the f-interpolator: a comma-decimal JVM
      // locale would print invalid JSON (ADVICE r17)
      println(s"""{"query":"$name","rep":$i,"sec":${fmt(t)},"stage_metrics":$stage}""")
      t
    }
    println(s"""{"query":"$name","dir":"$dir","min_sec":${fmt(times.min)},"reps":$reps,"io_probe_after":${fmt(Bench.settledIoProbe())}}""")
    spark.stop()
  }
}
