package graft

/** Time ONE registered gate query against a data directory — the targeted
  * drill-down companion to [[Bench]]/[[BenchScale]]: when the growth gate
  * flags a query at a tier, this measures a candidate fix against the same
  * tier data without paying for the whole registry.
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
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      Bench.materialize(df)
      val t = (System.nanoTime() - t0) / 1e9
      Bench.releaseCheckpoints(df)
      spark.catalog.clearCache()
      println(f"""{"query":"$name","rep":$i,"sec":$t%.3f}""")
      t
    }
    println(f"""{"query":"$name","dir":"$dir","min_sec":${times.min}%.3f,"reps":$reps}""")
    spark.stop()
  }
}
