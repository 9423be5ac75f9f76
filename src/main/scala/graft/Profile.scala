package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries N times inside one session to separate
  * first-run (codegen/classload) cost from steady-state cost.
  *
  * Usage: runMain graft.Profile <sfDir> <reps> <queryName ...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = LocalSession.build()
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Bench.materialize(SparkEntry.queries(n)(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $n%-28s ${times.map(t => f"$t%.2f").mkString("  ")}")
    }
    spark.stop()
  }
}
