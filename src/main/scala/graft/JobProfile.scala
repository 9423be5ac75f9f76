package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: run ONE gate and print a per-Spark-job timeline — job id,
  * wall duration, and call site — so a multi-job operator's wall time can
  * be attributed to its phases (train vs encode vs write vs search) without
  * guessing from aggregate task metrics. The drill-down companion to
  * [[BenchOne]] one level finer: BenchOne says run-vs-cpu for a whole rep;
  * this says WHICH jobs the wall went to and the dead time between them
  * (driver-side planning, fs metadata work, manifest fsyncs).
  *
  * Usage: `sbt "runMain graft.JobProfile <query> <dir> [reps]"`.
  * Prints one line per job: `[job] id=.. sec=.. gap=.. site=..` where `gap`
  * is driver-side dead time since the previous job's end (scheduling,
  * planning, non-Spark IO). Not a round artifact.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <query> <dir> [reps]")
    val (name, dir) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 2
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val spark = LocalSession.build()
    val sc = spark.sparkContext
    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    @volatile var lastEnd = 0L
    sc.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map(s =>
          s.name.take(60) + " #stages=" + e.stageInfos.size).getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site)); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, site) =>
          val now = System.nanoTime()
          val gap = if (lastEnd == 0L) 0.0 else (t0 - lastEnd) / 1e9
          lastEnd = now
          println(f"[job] id=${e.jobId}%-4d sec=${(now - t0) / 1e9}%7.3f gap=${math.max(gap, 0)}%7.3f $site")
        }
      }
    })
    (1 to reps).foreach { i =>
      lastEnd = 0L
      println(s"===== rep $i =====")
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      Bench.materialize(df)
      println(f"[rep] total=${(System.nanoTime() - t0) / 1e9}%.3f")
      Bench.releaseCheckpoints(df)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
